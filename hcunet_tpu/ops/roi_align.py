"""RoIAlign — bilinear region-of-interest pooling (torchvision semantics).

The reference relies on torchvision's C++/CUDA RoIAlign inside its Faster
R-CNN.  This is the XLA version: for each RoI, a ``output_size × sampling``
grid of bilinear samples is gathered and averaged.  Everything is static
shape: N boxes in, ``[N, out, out, C]`` out; invalid (padding) boxes simply
produce garbage features that downstream masks ignore.

Bilinear sampling uses gather via advanced indexing — XLA lowers it to
dynamic-gather, which is efficient for the modest RoI counts here
(≤ ~1000 per image).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample feat [H, W, C] at float coords ys/xs [...]; returns [..., C]."""
    H, W = feat.shape[0], feat.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = y0 + 1
    x1 = x0 + 1
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def g(yi, xi):
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return feat[yi, xi]

    out = (
        g(y0, x0) * (wy0 * wx0)[..., None]
        + g(y0, x1) * (wy0 * wx1)[..., None]
        + g(y1, x0) * (wy1 * wx0)[..., None]
        + g(y1, x1) * (wy1 * wx1)[..., None]
    )
    # torchvision zeroes samples fully outside the feature map
    inside = (ys >= -1) & (ys <= H) & (xs >= -1) & (xs <= W)
    return jnp.where(inside[..., None], out, 0.0)


@functools.partial(
    jax.jit, static_argnames=("output_size", "sampling_ratio")
)
def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """``features``: [H, W, C] one image's feature map; ``boxes``: [N, 4]
    (x1, y1, x2, y2) in *input-image* coordinates (torchvision convention:
    x = width axis = feature dim 1).  Returns [N, out, out, C].
    """
    boxes = boxes.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    s = sampling_ratio

    # sample grid: for output bin (i,j), s*s points
    ii = jnp.arange(output_size, dtype=jnp.float32)
    kk = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s

    # ys: [N, out, s] ; xs: [N, out, s]
    ys = y1[:, None, None] + (ii[None, :, None] + kk[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (ii[None, :, None] + kk[None, None, :]) * bin_w[:, None, None]
    # torchvision's detection models use aligned=False (no half-pixel
    # shift) — ported fasterrcnn heads were trained against that sampling.

    def per_roi(y_r, x_r):
        # full grid [out, s, out, s]
        yy = jnp.broadcast_to(
            y_r[:, :, None, None], (output_size, s, output_size, s)
        )
        xx = jnp.broadcast_to(
            x_r[None, None, :, :], (output_size, s, output_size, s)
        )
        samples = _bilinear(features, yy, xx)  # [out, s, out, s, C]
        return samples.mean(axis=(1, 3))  # [out, out, C]

    return jax.vmap(per_roi)(ys, xs)
