"""``hcat.loss`` — the training losses
(``/root/reference/hcat/loss.py``), reference signatures and torch
channels-first layout (``[B, C, *spatial]``) over the TPU-native jax
losses (:mod:`hcunet_tpu.train.losses`).  All four accept numpy / jax /
cpu-torch inputs and return a python float; targets larger than the
valid-conv prediction are cropped to it, as in the reference
(``loss.py:50-56``).
"""

import numpy as np


def _cl(x) -> np.ndarray:
    """torch [B, C, *spatial] → channels-last numpy."""
    arr = (
        x.detach().cpu().numpy()
        if type(x).__module__.startswith("torch") else np.asarray(x)
    )
    return np.moveaxis(arr, 1, -1).astype(np.float32)


def cross_entropy(pred, mask, pwl=None, method: str = "pixel",
                  num_random_pixels=None) -> float:
    """``loss.py:5-101``: PWL-weighted BCE over logits, methods
    pixel / worst_z / random / sigmoid (incl. the reference's
    double-sigmoid quirk)."""
    from hcunet_tpu.train.losses import cross_entropy as _ce

    kw = {}
    if num_random_pixels is not None:
        kw["num_random_pixels"] = int(num_random_pixels)
    if method == "random":
        import jax

        kw.setdefault("key", jax.random.PRNGKey(0))
    return float(
        _ce(_cl(pred), _cl(mask),
            None if pwl is None else _cl(pwl), method=method, **kw)
    )


def dice(pred, mask) -> float:
    """``loss.py:104-128``."""
    from hcunet_tpu.train.losses import dice as _dice

    return float(_dice(_cl(pred), _cl(mask)))


def L1Loss(pred, mask) -> float:
    """``loss.py:130-153``."""
    from hcunet_tpu.train.losses import l1_loss

    return float(l1_loss(_cl(pred), _cl(mask)))


def MSELoss(pred, mask) -> float:
    """``loss.py:155-177``."""
    from hcunet_tpu.train.losses import mse_loss

    return float(mse_loss(_cl(pred), _cl(mask)))


__all__ = ["cross_entropy", "dice", "L1Loss", "MSELoss"]
