"""Separable filters and grayscale morphology in JAX.

Device-side replacements for the host calls the reference makes between its
GPU stages (forcing device→host→device round trips):

* ``skimage.filters.gaussian(..., sigma=3)`` on the probability map
  (``hcat/main.py:130``) — here a separable gaussian with skimage's
  ``mode='nearest'`` (edge) boundary and ``truncate=4``;
* ``scipy.ndimage.maximum_filter(size=2, mode='constant')`` and the blur
  used by vector-field clustering (``hcat/segment.py:601-605``);
* binary dilation/erosion with the 3×3(×3) full structuring element
  (``skimage.morphology.binary_dilation`` default, ``segment.py:456``).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("sigma", "axes", "mode", "truncate"))
def gaussian_blur(
    x: jnp.ndarray,
    sigma: float,
    axes: Sequence[int] | None = None,
    mode: str = "edge",
    truncate: float = 4.0,
) -> jnp.ndarray:
    """Separable gaussian blur over the given axes (default: all).

    ``mode='edge'`` matches skimage's default ``nearest`` boundary.
    """
    if sigma <= 0:
        return x
    k = gaussian_kernel1d(sigma, truncate)
    r = (k.shape[0] - 1) // 2
    axes = tuple(range(x.ndim)) if axes is None else tuple(axes)
    out = x.astype(jnp.float32)
    for ax in axes:
        if x.shape[ax] == 1:
            continue
        widths = [(0, 0)] * x.ndim
        widths[ax] = (r, r)
        padded = jnp.pad(out, widths, mode=mode)
        # 1D conv along ax: move axis last, matmul-free depthwise conv
        moved = jnp.moveaxis(padded, ax, -1)
        flat = moved.reshape(-1, 1, moved.shape[-1])  # [B, C=1, W]
        kern = k.reshape(1, 1, -1)  # [O=1, I=1, W]
        conv = lax.conv_general_dilated(
            flat, kern, (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        out = jnp.moveaxis(conv.reshape(moved.shape[:-1] + (-1,)), -1, ax)
    return out


def _window_reduce(x, size, init, op, mode_pad_value, axes):
    nd = x.ndim
    window = [1] * nd
    for ax in axes:
        window[ax] = size
    pads = [(0, 0)] * nd
    for ax in axes:
        lo = (size - 1) // 2
        hi = size - 1 - lo
        pads[ax] = (lo, hi)
    padded = jnp.pad(x, pads, mode="constant", constant_values=mode_pad_value)
    return lax.reduce_window(
        padded, init, op, tuple(window), (1,) * nd, "VALID"
    )


@functools.partial(jax.jit, static_argnames=("size", "axes"))
def maximum_filter(x: jnp.ndarray, size: int, axes=None) -> jnp.ndarray:
    """scipy.ndimage.maximum_filter(mode='constant', cval=0) semantics.

    Note scipy centers even windows with offset toward the left — scipy's
    origin convention pads (size//2) low / (size-1-size//2) high; matched
    here."""
    axes = tuple(range(x.ndim)) if axes is None else tuple(axes)
    nd = x.ndim
    window = [1] * nd
    for ax in axes:
        window[ax] = size
    pads = [(0, 0)] * nd
    for ax in axes:
        lo = size // 2
        hi = size - 1 - lo
        pads[ax] = (lo, hi)
    padded = jnp.pad(x, pads, mode="constant", constant_values=0.0)
    return lax.reduce_window(
        padded, -jnp.inf, lax.max, tuple(window), (1,) * nd, "VALID"
    )


@functools.partial(jax.jit, static_argnames=("axes",))
def binary_dilation(x: jnp.ndarray, axes=None) -> jnp.ndarray:
    """One step of binary dilation with the full 3^nd structuring element
    (skimage default)."""
    axes = tuple(range(x.ndim)) if axes is None else tuple(axes)
    out = _window_reduce(
        x.astype(jnp.float32), 3, -jnp.inf, lax.max, 0.0, axes
    )
    return out > 0


@functools.partial(jax.jit, static_argnames=("axes",))
def binary_erosion(x: jnp.ndarray, axes=None) -> jnp.ndarray:
    axes = tuple(range(x.ndim)) if axes is None else tuple(axes)
    out = _window_reduce(
        x.astype(jnp.float32), 3, jnp.inf, lax.min, 0.0, axes
    )
    return out > 0


@functools.partial(jax.jit, static_argnames=("iterations", "axes"))
def binary_dilation_n(x: jnp.ndarray, iterations: int, axes=None) -> jnp.ndarray:
    """``iterations`` steps of 3x3 dilation == one (2k+1) window max —
    the reference dilates in a Python loop 15 times (``segment.py:456-457``);
    a single wide reduce_window is equivalent and one pass."""
    axes = tuple(range(x.ndim)) if axes is None else tuple(axes)
    size = 2 * iterations + 1
    out = _window_reduce(x.astype(jnp.float32), size, -jnp.inf, lax.max, 0.0, axes)
    return out > 0
