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


def nms_indices_np(boxes, scores, iou_threshold=0.5):
    """Greedy NMS on host numpy — same keep set as :func:`nms_mask`.

    Candidate merging runs on host with a different N on nearly every call;
    jitting there would force a fresh XLA compile per length, so the host
    loop uses plain numpy (vectorized IoU row per survivor).
    """
    import numpy as np

    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    scores = np.asarray(scores, np.float32)
    n = len(scores)
    if n == 0:
        return np.zeros(0, np.int64)
    x1, y1, x2, y2 = boxes.T
    areas = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        union = areas[i] + areas - inter
        iou = np.where(union > 0, inter / union, 0.0)
        suppressed |= iou > iou_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int64)


def nms_indices(boxes, scores, iou_threshold=0.5, valid=None):
    """torchvision-style: indices of kept boxes in descending-score order
    (host-side; plain numpy, no recompiles)."""
    import numpy as np

    boxes = np.asarray(boxes)
    scores = np.asarray(scores, np.float32)
    if valid is not None:
        scores = np.where(np.asarray(valid), scores, -np.inf)
    keep = nms_indices_np(boxes, scores, iou_threshold)
    return keep[np.isfinite(scores[keep])]
