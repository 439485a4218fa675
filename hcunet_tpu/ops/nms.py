"""Non-maximum suppression — static-shape JAX implementation.

Replaces ``torchvision.ops.nms`` (used at ``hcat/utils.py:355`` to merge
tiled detections and inside the Faster R-CNN head).  torchvision returns a
dynamic keep-list; XLA needs static shapes, so this NMS returns a boolean
keep *mask* over the (padded) box array plus the torchvision-compatible
ordering helper.

Algorithm: sort by score, then a ``fori_loop`` over boxes marking survivors
— O(N²) IoU matrix is computed once up front (N ≤ a few thousand per merge,
so the quadratic matrix is small and VPU-friendly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between two [N,4] / [M,4] box arrays (x1,y1,x2,y2)."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy NMS keep-mask (same keep set as torchvision for unique scores).

    ``valid`` masks out padding rows (score treated as -inf).
    """
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    iou = box_iou(b, b)

    def body(i, keep):
        # keep i unless a kept higher-score box overlaps it
        suppressed = jnp.any((iou[:, i] > iou_threshold) & keep & (jnp.arange(n) < i))
        keep_i = jnp.logical_and(jnp.isfinite(s[i]), jnp.logical_not(suppressed))
        return keep.at[i].set(keep_i)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros(n, bool))
    # unsort back to input order
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def nms_indices(boxes, scores, iou_threshold=0.5, valid=None):
    """torchvision-style: indices of kept boxes in descending-score order
    (host-side convenience; dynamic shape, do not jit)."""
    keep = nms_mask(
        jnp.asarray(boxes, jnp.float32),
        jnp.asarray(scores, jnp.float32),
        float(iou_threshold),
        None if valid is None else jnp.asarray(valid),
    )
    import numpy as np

    keep = np.asarray(keep)
    scores = np.asarray(scores)
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-scores[idx], kind="stable")]
