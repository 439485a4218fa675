"""``hcat.r_unet`` — the recurrent model family
(``/root/reference/hcat/r_unet.py``), as imported by the reference's test
drivers: ``from hcat.r_unet import RecursiveUnet as RUnet, RDCNet``
(``tests/r_unet_test.py:1``), ``from hcat.r_unet import StackedDilation``
(``tests/stacked_dialation_test.py:1``).

:class:`RecursiveUnet` and :class:`RDCNet` are inference facades over the
TPU-native ``lax.scan`` recurrences (:mod:`hcunet_tpu.models.runet` /
``rdcnet``): reference constructor signatures, torch channels-first
``[B, C, X, Y, Z]`` in/out, 10 timesteps.  For *training* use the
first-class APIs (``hcunet_tpu.train`` + flax models) — the reference
itself trains these only inside ``tests/r_unet_test.py:19-57``.

``StackedDilation`` re-exports the flax block (parallel 5³ convs at
dilations 1–5, ``r_unet.py:339-364``); it is an internal building block in
both codebases.
"""

from typing import Optional

import numpy as np

from hcunet_tpu.models.rdcnet import StackedDilation  # noqa: F401


class _RecurrentFacade:
    """Shared torch-surface plumbing for the recurrent facades."""

    def _finish_init(self, model, seed: int):
        import jax

        self.model = model
        self._rng = jax.random.PRNGKey(seed)
        self.variables: Optional[dict] = None
        self._apply = jax.jit(
            lambda v, t: self.model.apply(v, t, train=False)
        )

    def forward(self, x) -> np.ndarray:
        """``x``: [B, C, X, Y, Z] → [B, out_channels, X, Y, Z] numpy
        (prob, center, z/y/x vector channels, ``r_unet.py:104,127``)."""
        arr = (
            x.detach().cpu().numpy()
            if type(x).__module__.startswith("torch") else np.asarray(x)
        )
        t = np.moveaxis(arr, 1, -1).astype(np.float32)
        if self.variables is None:
            self.variables = self.model.init(self._rng, t, train=False)
        out = self._apply(self.variables, t)
        return np.moveaxis(np.asarray(out), -1, 1)

    __call__ = forward

    def eval(self):
        return self

    def train(self, mode: bool = True):
        if mode:
            raise ValueError(
                "the r_unet facade serves inference; train the flax model "
                "directly (see tests/test_recurrent_models.py for the "
                "reference-parity training recipe)"
            )
        return self

    def to(self, _device=None):
        return self

    cuda = cpu = to


class RecursiveUnet(_RecurrentFacade):
    """``hcat.r_unet.RecursiveUnet`` (``r_unet.py:38-160``): GRU-style
    recurrence over a 2-level same-padding U-Net, 10 fixed timesteps.
    The reference's constructor kwargs are accepted; like the reference,
    the channel topology [16, 32, 64] is fixed (``r_unet.py:102``)."""

    def __init__(self, image_dimensions: int = 2, in_channels: int = 4,
                 out_channels: int = 5,
                 kernel=None, upsample_kernel=(6, 6, 5),
                 max_pool_kernel=(2, 2, 1), upsample_stride=(2, 2, 1),
                 dilation: int = 1, groups: int = 1, *, seed: int = 0):
        import jax.numpy as jnp

        from hcunet_tpu.config import RUNetConfig
        from hcunet_tpu.models.runet import RecursiveUNet as _RUNet

        if isinstance(kernel, dict):
            kernel = kernel["conv1"]
        cfg = RUNetConfig(
            in_channels=in_channels,
            out_channels=out_channels,
            kernel=tuple(kernel) if kernel is not None else (3, 3, 3),
            upsample_kernel=tuple(upsample_kernel),
            max_pool_kernel=tuple(max_pool_kernel),
            upsample_stride=tuple(upsample_stride),
        )
        self.config = cfg
        self._finish_init(_RUNet(cfg, dtype=jnp.float32), seed)


class RDCNet(_RecurrentFacade):
    """``hcat.r_unet.RDCNet`` (``r_unet.py:207-227``): stride-2 in-conv,
    10 iterations of ``y += RDCBlock(cat(x, y))`` over stacked dilations,
    transpose-conv back to full resolution."""

    def __init__(self, in_channels: int = 4, out_channels: int = 5, *,
                 seed: int = 0):
        import jax.numpy as jnp

        from hcunet_tpu.config import RDCNetConfig
        from hcunet_tpu.models.rdcnet import RDCNet as _RDCNet

        cfg = RDCNetConfig(in_channels=in_channels, out_channels=out_channels)
        self.config = cfg
        self._finish_init(_RDCNet(cfg, dtype=jnp.float32), seed)


__all__ = ["RecursiveUnet", "RDCNet", "StackedDilation"]
