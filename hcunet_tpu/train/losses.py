"""Segmentation losses with crop-to-valid semantics.

Re-design of ``hcat/loss.py``.  Every loss first top-left-crops the target
(and weight map) to the prediction's valid-conv output shape
(``loss.py:50-56``), then reduces.  All functions are pure and jit-able;
the channels-last layout is ``[B, *spatial, C]``.

Parity notes (vs ``hcat/loss.py``):

* ``pwl`` weighting multiplies the per-pixel BCE by ``pwl + 1``
  (``loss.py:70-72``).  The reference's ``pwl[mask > .5] += 2`` boost is
  dead code — ``is_pwl_none`` is unconditionally set True at ``loss.py:48``
  — so parity means *not* applying it; we expose the working boost behind
  ``foreground_boost`` for users who want what the author intended.
* ``worst_z`` sorts per-z-plane losses and scales by ``linspace(1,2)**2``
  (``loss.py:74-80``).
* ``random`` draws ``num_random_pixels`` positive and negative samples with
  replacement (``loss.py:82-95``); here it takes an explicit PRNG key.
* ``sigmoid`` applies a sigmoid to the prediction *before* the
  BCE-with-logits (``loss.py:38-40,97-99``) — an odd double-squash, kept
  for parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _crop_like(target: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Top-left crop target's spatial axes to pred's (channels-last)."""
    slices = (slice(None),) + tuple(
        slice(0, s) for s in pred.shape[1:-1]
    ) + (slice(None),)
    return target[slices]


def _bce_with_logits(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy on logits (stable form).

    Matches torch ``BCEWithLogitsLoss(reduction='none')``:
    ``max(x,0) - x*t + log(1 + exp(-|x|))``.
    """
    return (
        jnp.maximum(pred, 0.0)
        - pred * target
        + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def cross_entropy(
    pred: jnp.ndarray,
    mask: jnp.ndarray,
    pwl: Optional[jnp.ndarray] = None,
    method: str = "pixel",
    num_random_pixels: Optional[int] = None,
    key: Optional[jax.Array] = None,
    foreground_boost: float = 0.0,
) -> jnp.ndarray:
    """Pixel-weighted binary cross entropy (U-Net paper style).

    ``pred``: logits ``[B, *spatial, C]``; ``mask``/``pwl`` may be spatially
    larger and are cropped to ``pred``.
    """
    methods = ("pixel", "worst_z", "random", "sigmoid")
    if method not in methods:
        raise ValueError(
            f"viable methods for cross entropy loss are {methods}, not {method}"
        )
    if method == "random":
        if num_random_pixels is None or num_random_pixels <= 1:
            raise ValueError("num_random_pixels must be an int > 1")
        if key is None:
            raise ValueError("method='random' requires a PRNG key")

    x = jnp.asarray(pred, jnp.float32)
    if method == "sigmoid":
        x = jax.nn.sigmoid(x)

    mask = jnp.asarray(_crop_like(mask, pred), jnp.float32)
    if pwl is None:
        pwl = jnp.ones_like(mask)
    else:
        pwl = jnp.asarray(_crop_like(pwl, pred), jnp.float32)
    if foreground_boost:
        pwl = pwl + foreground_boost * (mask > 0.5)

    if method in ("pixel", "sigmoid"):
        loss = _bce_with_logits(x, mask) * (pwl + 1.0)
        return jnp.mean(loss)

    if method == "worst_z":
        loss = _bce_with_logits(x, mask) * (pwl + 1.0)
        # per-z totals, sorted ascending, weighted quadratically toward the
        # worst plane (loss.py:74-80); z is the last spatial axis.
        reduce_axes = tuple(i for i in range(loss.ndim) if i != loss.ndim - 2)
        per_z = jnp.sum(loss, axis=reduce_axes)
        per_z = jnp.sort(per_z)
        scale = jnp.linspace(1.0, 2.0, per_z.shape[0]) ** 2
        per_z = per_z * scale / (pred.shape[1] * pred.shape[2])
        return jnp.mean(per_z)

    # method == "random": sample positives and negatives with replacement.
    flat_pred = x.reshape(-1)
    flat_mask = mask.reshape(-1)
    n = num_random_pixels
    kp, kn = jax.random.split(key)
    pos_p = jnp.where(flat_mask == 1, 1.0, 0.0)
    neg_p = jnp.where(flat_mask == 0, 1.0, 0.0)
    any_pos = jnp.sum(pos_p) > 0

    def sample(probs, k):
        idx = jax.random.categorical(
            k, jnp.log(probs + 1e-30), shape=(n,)
        )
        return flat_pred[idx], flat_mask[idx]

    def with_sampling(_):
        pp, mp = sample(pos_p, kp)
        pn, mn = sample(neg_p, kn)
        p = jnp.concatenate([pp, pn])
        m = jnp.concatenate([mp, mn])
        return jnp.mean(_bce_with_logits(p, m))

    def all_pixels(_):
        return jnp.mean(_bce_with_logits(flat_pred, flat_mask))

    return jax.lax.cond(any_pos, with_sampling, all_pixels, None)


def dice(pred: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Soft dice loss on logits (``hcat/loss.py:104-128``)."""
    mask = _crop_like(mask, pred).astype(jnp.float32)
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    num = 2.0 * jnp.sum(p * mask) + eps
    den = jnp.sum(p + mask) + eps
    return 1.0 - num / den


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Crop-to-valid mean absolute error (``hcat/loss.py:130-153``)."""
    target = _crop_like(target, pred).astype(jnp.float32)
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target))


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Crop-to-valid mean squared error (``hcat/loss.py:155-177``)."""
    target = _crop_like(target, pred).astype(jnp.float32)
    return jnp.mean((pred.astype(jnp.float32) - target) ** 2)
