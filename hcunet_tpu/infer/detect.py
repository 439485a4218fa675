"""Tiled 2D detection over a z-stack — hot loop #2
(``hcat/segment.py:139-218``, ``predict_cell_candidates``).

The reference runs the detector once per (z-plane, tile): with a 15-plane
stack and a 2×2 tile grid that's 60 sequential model calls.  Here all z
planes of one tile position form a batch — one ``detect`` call per tile
position — and per-tile results merge into the global candidate list with
NMS, exactly like ``utils.merge_cell_candidates``.

Box convention: the detector emits torchvision-style ``(x1, y1, x2, y2)``
where x is the width axis — array dim 1 of an [H, W] tile — and y is the
height axis (array dim 0).  The candidate list stores boxes in the
*volume's* array axes (dim0, dim1), as the instance segmenter expects, so
this driver swaps at the boundary: detector ``(x, y)`` → array
``(det_y + tile_x0, det_x + tile_y0)``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from hcunet_tpu.core.shapes import calculate_indexes
from hcunet_tpu.infer.candidates import empty_candidates, merge_cell_candidates

DET_PAD = (24, 24)
# v5e sweep (scripts/probe_detect_tiles.py, 2026-08-17): detect() is
# overhead-bound, so throughput scales with tile area — 4.0 MPx/s at 352²,
# 8.1 at 512² (the reference's CPU-table geometry), 28.9 at 1024², 41.6 at
# 1280² (but 240 s compile).  1000+2·24 = 1048² is the sweet spot.
DET_EVAL = (1000, 1000)


def dispatch_cell_candidates(
    image,
    detector,
    variables: Dict,
    eval_size=DET_EVAL,
    pad=DET_PAD,
):
    """Dispatch the per-tile detection programs without blocking.

    ``image`` may be host numpy or an already-device-resident jnp array
    ([X, Y, Z, C>=3], normalized) — the pipeline uploads each chunk once and
    slices the detector's channels on device, so detection costs no second
    host→device transfer.  Returns an opaque list of in-flight tiles for
    :func:`collect_cell_candidates`; device execution proceeds while the
    caller dispatches more work (e.g. the segmentation program).
    """
    X, Y, Z = image.shape[:3]
    eval_size = [min(e, s) for e, s in zip(eval_size, (X, Y))]

    # whole-axis window whenever a tiled grid can't fit (axis < eval+2*pad):
    # calculate_indexes' right-aligned fallback would otherwise produce a
    # negative start that numpy slice-wraps, misplacing detections.
    if X < eval_size[0] + 2 * pad[0]:
        x_ind = [[0, X]]
    else:
        x_ind = calculate_indexes(pad[0], eval_size[0], X, X)
    if Y < eval_size[1] + 2 * pad[1]:
        y_ind = [[0, Y]]
    else:
        y_ind = calculate_indexes(pad[1], eval_size[1], Y, Y)

    on_device = not isinstance(image, np.ndarray)
    pending = []
    for x0, x1 in x_ind:
        for y0, y1 in y_ind:
            tile = image[x0:x1, y0:y1, :, :3]  # [H, W, Z, 3]
            # batch all z planes: [Z, H, W, 3]
            if on_device:
                batch = jnp.moveaxis(tile, 2, 0).astype(jnp.float32)
            else:
                batch = jnp.asarray(
                    np.moveaxis(np.asarray(tile), 2, 0).astype(np.float32)
                )
            out = detector.detect(variables, batch)
            pending.append((x0, x1, y0, y1, Z, out))
    return pending


def collect_cell_candidates(
    pending,
    initial_coords=(0, 0),
    score_floor: float = 0.0,
    progress=None,
) -> Dict[str, np.ndarray]:
    """Fetch dispatched detections and NMS-merge them into the global
    candidate list (``utils.merge_cell_candidates`` semantics)."""
    candidates = None
    for x0, x1, y0, y1, Z, out in pending:
        boxes = np.asarray(out["boxes"])  # [Z, K, 4] detector axes
        scores = np.asarray(out["scores"])
        labels = np.asarray(out["labels"])
        valid = np.asarray(out["valid"]) & (scores > score_floor)

        for z in range(Z):
            v = valid[z]
            if not v.any():
                continue
            det = boxes[z][v]
            # detector (x=W=dim1, y=H=dim0) -> array axes (dim0, dim1)
            arr_boxes = np.stack(
                [det[:, 1], det[:, 0], det[:, 3], det[:, 2]], axis=1
            )
            new = {
                "boxes": arr_boxes.astype(np.float32),
                "scores": scores[z][v].astype(np.float32),
                "labels": labels[z][v].astype(np.int32),
                "z_level": np.full(v.sum(), float(z), np.float32),
            }
            candidates = merge_cell_candidates(
                candidates, new,
                initial_coords=(x0 + initial_coords[0], y0 + initial_coords[1]),
            )
        if progress:
            progress(f"detect tile [{x0}:{x1}, {y0}:{y1}]")
    return candidates if candidates is not None else empty_candidates()


class ShardedDetect:
    """Data-parallel detection over a ``jax.sharding.Mesh``.

    The reference loops z-planes sequentially through the detector
    (``hcat/segment.py:181-192``); this engine batches them (module
    docstring), and on a mesh the batch dim shards over EVERY device —
    detection is embarrassingly parallel over z-planes (each plane's
    RPN/RoI/NMS is self-contained), so the per-plane computation is
    untouched and the collected candidates are identical to single-device
    (tested: ``test_analyze_sharded_detection_matches_single_device``).

    Duck-types the ``detector.detect(variables, batch)`` call that
    :func:`dispatch_cell_candidates` makes; the batch is zero-padded up to
    a multiple of the device count (padded rows land beyond the real ``Z``
    that collect iterates, so they are dropped for free).  Variables are
    placed replicated at construction and re-placed only when a caller
    passes a *different* tree (checkpoint reload) — identity-checked, so
    the steady-state path pays no per-call placement.
    """

    def __init__(self, detector, variables, mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        from hcunet_tpu.parallel.mesh import tiles_sharding

        self.n = int(np.prod(list(mesh.shape.values())))
        batch_sh = tiles_sharding(mesh)
        self._rep = NamedSharding(mesh, PartitionSpec())
        self._src = variables  # identity of the last-placed host tree
        self._placed = jax.device_put(variables, self._rep)

        def fn(vars_r, images):
            images = jax.lax.with_sharding_constraint(images, batch_sh)
            return detector.detect(vars_r, images)

        self._fn = jax.jit(fn)

    def detect(self, variables, images):
        if variables is not None and variables is not self._src:
            # honor the duck-typed detect(variables, batch) contract: a
            # caller swapping weights (checkpoint reload) must not silently
            # run the construction-time tree (review r4)
            import jax

            self._src = variables
            self._placed = jax.device_put(variables, self._rep)
        Z = images.shape[0]
        Zp = -(-Z // self.n) * self.n
        if Zp != Z:
            images = jnp.concatenate(
                [images, jnp.zeros((Zp - Z, *images.shape[1:]), images.dtype)],
                axis=0,
            )
        return self._fn(self._placed, images)


def predict_cell_candidates(
    image: np.ndarray,
    detector,
    variables: Dict,
    eval_size=DET_EVAL,
    pad=DET_PAD,
    initial_coords=(0, 0),
    score_floor: float = 0.0,
    progress=None,
) -> Dict[str, np.ndarray]:
    """``image``: [X, Y, Z, C>=3] volume (channels-last, already
    normalized; the pipeline passes channels (0, 2, 3) like
    ``hcat/main.py:99``).  Returns the merged candidate dict with boxes in
    array axes (x=dim0, y=dim1), plus per-box ``z_level``.
    """
    return collect_cell_candidates(
        dispatch_cell_candidates(image, detector, variables, eval_size, pad),
        initial_coords=initial_coords,
        score_floor=score_floor,
        progress=progress,
    )
