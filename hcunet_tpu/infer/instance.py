"""Instance segmentation: detection-seeded watershed over the semantic map.

Rebuild of the reference's hot loop #3
(``hcat/segment.py:221-505``, ``generate_unique_segmentation_mask_from_probability``):

1. filter cell candidates by score and by semantic-mask occupancy at the box
   center; pick ``best_z`` = the z-plane with the highest mean candidate
   score; keep boxes within ``z_tolerance`` of it;
2. paint per-box seeds: inside each (shrunk-by-5px) box, mark the voxels
   where the semantic probability attains the box maximum, replicated over 6
   z-slices starting at ``best_z``;
3. per spatial tile: build a height map (normalized probability map, or
   per-z exact EDT of the binary mask), fake z-isotropy by replicating each
   z-slice ``expand_z`` times, dilate the mask, add a background seed where
   the height < 0.15, run compact seeded watershed with watershed lines,
   decimate z back, zero labels touching tile edges (seam-free merging), and
   paste into the global label volume.

Axis note: the reference mixes detector-x with array-x inconsistently
(compare ``segment.py:291`` center indexing with the ``(y1, x1, y2, x2)``
unpack at ``segment.py:345``); this implementation uses one coherent
convention — boxes are ``(x1, y1, x2, y2)`` in *array* axes (dim0, dim1) of
the ``[X, Y, Z]`` volume, which is what
:mod:`hcunet_tpu.infer.detect` produces.
"""

from __future__ import annotations

import os

from typing import Dict, Optional, Tuple

import numpy as np

from hcunet_tpu.config import WatershedConfig
from hcunet_tpu.core.shapes import calculate_indexes
from hcunet_tpu.ops.distance import edt_per_slice_host
from hcunet_tpu.ops.watershed import instance_tile, watershed


def _resolve_host_ram(host_ram_bytes: Optional[int] = None) -> int:
    if host_ram_bytes is not None:
        return host_ram_bytes
    try:
        import psutil

        return psutil.virtual_memory().total
    except Exception:
        return 16 * 2**30


def _cap_tile_workers(
    workers: int, pad, ev, Z: int, cfg: WatershedConfig, host_ram_bytes: int,
    concurrent_stages: int = 1,
) -> int:
    """Cap concurrent flood workers so `workers x per-tile-peak` fits RAM.

    The reference's tile table (``segment.py:237-242``) sizes ONE tile to
    total host RAM; running cpu_count-1 tiles at once multiplies the peak by
    the worker count (advisor r3 finding #1).  Per-tile peak: the float64
    tile copy + binary + seed + labels (~25 B/voxel for the fused/device
    backends, which expand z virtually), times ``expand_z`` extra
    materialized copies (~21 B/expanded-voxel) for the materialized oracle.
    Budget: half of host RAM for the flood stage."""
    tile_vox = (ev[0] + 2 * pad[0]) * (ev[1] + 2 * pad[1]) * max(Z, 1)
    if cfg.backend == "materialized":
        per_tile = tile_vox * max(1, int(cfg.expand_z)) * 21
    else:
        per_tile = tile_vox * 25
    # ``concurrent_stages``: how many instance stages run at once — the
    # pipeline's ``analyze(overlap=N)`` tail workers each start their own
    # flood pool, so the budget divides across them or the aggregate peak
    # is N x what the cap allows (review r4 #1)
    budget = host_ram_bytes // 2 // max(1, int(concurrent_stages))
    return max(1, min(int(workers), int(budget // max(per_tile, 1))))


def _instance_tile_geometry(spatial, host_ram_bytes: Optional[int] = None):
    """The reference's CPU-RAM-keyed watershed tiling
    (``segment.py:237-242``) with its small-image fallback."""
    host_ram_bytes = _resolve_host_ram(host_ram_bytes)
    if round(host_ram_bytes / 1e9) >= 16:
        pad, ev = [56, 56], [1212, 1212]
    else:
        pad, ev = [64, 64], [412, 412]
    for d in range(2):
        if spatial[d] < ev[d] + 2 * pad[d]:
            ev[d] = spatial[d]
            pad[d] = 1
    return pad, ev


def _make_device_instance_fn(
    expand_z: int, expand_mask: int, distance_floor: float,
    seed_background_below: float, device_iters: int, compactness: float,
    edt_on_device: bool = False,
):
    """Build (and jit) the device instance-tile program for one config.

    Memoized so the TPU backend compiles once per ``(cfg, tile shape)``
    instead of once per *call* — the per-tile recompile was ~131 s
    (BASELINE.md).  Keyed on the scalar config values; jit itself caches per
    input shape.

    ``edt_on_device``: the binary (non-probability-map) path computes the
    per-z-slice distance transform INSIDE the program
    (:func:`hcunet_tpu.ops.distance.edt`, Pallas-backed on TPU) instead of
    shipping a host-precomputed map — ``dist`` is then ignored and derived
    from ``binm``, removing the host EDT + one f32 tile H2D."""
    import jax
    import jax.numpy as jnp

    from hcunet_tpu.ops.watershed_jax import _shift, watershed_jax

    E = int(expand_z)

    def _run(dist, binm, seeds):
        dist_e = jnp.repeat(dist, E, axis=2)
        dist_e = jnp.where(dist_e < distance_floor, 0.0, dist_e)
        mask_e = jnp.repeat(binm, E, axis=2)

        def dilate(_, m):
            out = m
            for ax in range(3):
                for d in (1, -1):
                    out = out | _shift(m, ax, d, False)
            return out

        mask_e = jax.lax.fori_loop(0, int(expand_mask), dilate, mask_e)
        seed_e = jnp.repeat(seeds, E, axis=2)
        seed_e = jnp.where(dist_e < seed_background_below, 1, seed_e)
        labels = watershed_jax(
            -dist_e,
            seed_e,
            mask=mask_e,
            iters=int(device_iters),
            compactness=compactness,
            watershed_line=True,
        )
        return labels[:, :, ::E]

    if edt_on_device:
        from hcunet_tpu.ops.distance import edt

        @jax.jit
        def run(binm, seeds):
            # per-z-slice 2D EDT of the foreground, like the reference's
            # cv2.distanceTransform loop (``hcat/segment.py:433-435``)
            return _run(edt(binm, axes=(0, 1)), binm, seeds)

        return run

    return jax.jit(_run)


_DEVICE_INSTANCE_FNS: Dict[tuple, object] = {}


def _device_instance_tile(
    distance: Optional[np.ndarray], binary: np.ndarray, seed_tile: np.ndarray,
    cfg: WatershedConfig,
) -> np.ndarray:
    """One instance tile on the TPU (``backend='device'``): z-replication,
    iterated cross dilation, background seed, and the bounded-iteration
    minimax-path watershed (:func:`hcunet_tpu.ops.watershed_jax.watershed_jax`)
    — all inside one jit.  Approximate where plateau tie-breaks matter.

    ``distance=None`` (the binary path) computes the per-slice EDT on
    device too — no host EDT, no distance-tile transfer."""
    import jax.numpy as jnp

    edt_on_device = distance is None
    key = (
        int(cfg.expand_z), int(cfg.expand_mask), float(cfg.distance_floor),
        float(cfg.seed_background_below), int(cfg.device_iters),
        float(cfg.compactness), edt_on_device,
    )
    run = _DEVICE_INSTANCE_FNS.get(key)
    if run is None:
        run = _DEVICE_INSTANCE_FNS[key] = _make_device_instance_fn(*key)
    if edt_on_device:
        return np.asarray(
            run(jnp.asarray(binary != 0), jnp.asarray(seed_tile))
        ).copy()
    return np.asarray(
        run(jnp.asarray(distance), jnp.asarray(binary != 0), jnp.asarray(seed_tile))
    ).copy()


def generate_unique_segmentation_mask(
    semantic: np.ndarray,
    candidates: Dict[str, np.ndarray],
    cfg: Optional[WatershedConfig] = None,
    host_ram_bytes: Optional[int] = None,
    progress=None,
    concurrent_stages: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns ``(unique_mask, seed)`` int32 volumes shaped like ``semantic``.

    ``semantic``: ``[X, Y, Z]`` float32 probability map (possibly blurred /
    rescaled by the pipeline) or uint8 binary mask.
    ``candidates``: dict of ``boxes [N,4] (x1,y1,x2,y2)``, ``scores [N]``,
    ``labels [N]``, ``z_level [N]`` (host numpy).
    """
    cfg = cfg or WatershedConfig()
    X, Y, Z = semantic.shape
    unique_mask = np.zeros((X, Y, Z), np.int32)
    seed = np.zeros((X, Y, Z), np.int32)

    boxes = np.asarray(candidates.get("boxes", np.zeros((0, 4))), np.float64)
    if boxes.size == 0 or len(candidates.get("scores", [])) == 0:
        return unique_mask, seed
    scores = np.asarray(candidates["scores"], np.float64)
    z_level = np.asarray(candidates["z_level"], np.float64)

    use_prob_map = semantic.dtype == np.float32
    if semantic.dtype not in (np.float32, np.uint8):
        raise ValueError(f"unknown semantic mask dtype {semantic.dtype}")

    # --- candidate filtering (segment.py:286-313) ---
    keep = scores > cfg.cell_prob_threshold
    b, s, z = boxes[keep], scores[keep], z_level[keep]
    cx = np.round(b[:, 0] + (b[:, 2] - b[:, 0]) / 2).astype(int)
    cy = np.round(b[:, 1] + (b[:, 3] - b[:, 1]) / 2).astype(int)
    cz = z.astype(int)
    inside = (cx >= 0) & (cx < X) & (cy >= 0) & (cy < Y) & (cz >= 0) & (cz < Z)
    occupied = np.zeros(len(b), bool)
    occupied[inside] = semantic[cx[inside], cy[inside], cz[inside]] > 0.5
    zs, ss = z[occupied], s[occupied]

    best_z = 0.0
    best_avg = 0.0
    for uz in np.unique(zs):
        avg = ss[zs == uz].mean()
        if avg > best_avg:
            best_z, best_avg = uz, avg
    best_z = int(best_z)

    # --- stabilize watershed by seeding in sorted-x order (segment.py:318-323)
    order = np.argsort(boxes[:, 0], kind="stable")
    boxes, scores, z_level = boxes[order], scores[order], z_level[order]

    # --- seed placement (segment.py:345-400) ---
    unique_cell_id = 2  # 1 is reserved for background (segment.py:274)
    seed_z_extent = 6
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        if x1 > X or y1 > Y:
            continue
        if scores[i] < cfg.cell_prob_threshold:
            continue
        if not (best_z - cfg.z_tolerance <= z_level[i] <= best_z + cfg.z_tolerance):
            continue
        x2, y2 = min(x2, X - 1), min(y2, Y - 1)
        dx0, dx1 = (5 if x1 + 5 >= 0 else -x1), (-5 if x2 - 5 <= X else X - x2)
        dy0, dy1 = (5 if y1 + 5 >= 0 else -y1), (-5 if y2 - 5 <= Y else Y - y2)
        xa, xb = int(round(x1 + dx0)), int(round(x2 + dx1))
        ya, yb = int(round(y1 + dy0)), int(round(y2 + dy1))
        if xb <= xa or yb <= ya or best_z >= Z:
            unique_cell_id += 1
            continue
        box_prob = semantic[xa:xb, ya:yb, best_z]
        if box_prob.size == 0:
            unique_cell_id += 1
            continue
        peak = box_prob == box_prob.max()
        for dz in range(seed_z_extent):
            if best_z + dz >= Z:
                continue
            seed[xa:xb, ya:yb, best_z + dz][peak] = unique_cell_id
        unique_cell_id += 1

    # --- per-tile watershed (segment.py:403-499) ---
    host_ram_bytes = _resolve_host_ram(host_ram_bytes)
    pad, ev = _instance_tile_geometry((X, Y), host_ram_bytes)
    if ev[0] >= X:
        x_ind, pad_x = [[0, X]], 0
    else:
        x_ind, pad_x = calculate_indexes(pad[0], ev[0], X, X), pad[0]
    if ev[1] >= Y:
        y_ind, pad_y = [[0, Y]], 0
    else:
        y_ind, pad_y = calculate_indexes(pad[1], ev[1], Y, Y), pad[1]
    pad = [pad_x, pad_y]
    expand_z = cfg.expand_z

    def _flood_tile(x0, x1, y0, y1):
            tile = semantic[x0:x1, y0:y1, :].astype(np.float64)

            if use_prob_map and tile.max() > 1:
                tile = tile + 1e-8
                tile = tile - tile.min()
                m = tile.max()
                if m > 0:
                    tile = tile / m
                binary = tile > cfg.mask_prob_threshold
                distance = tile
            else:
                binary = tile > 0
                if cfg.backend == "device":
                    # the device program computes the per-slice EDT itself
                    # (Pallas-backed, ops/distance.py) — skip the host EDT
                    # and the distance-tile transfer entirely
                    distance = None
                else:
                    distance = edt_per_slice_host(
                        binary.astype(np.uint8)
                    ).astype(np.float64)

            # seeds only from the trusted interior of the tile
            # (segment.py:440-442)
            seed_tile = np.zeros_like(binary, dtype=np.int32)
            tw, th = x1 - x0, y1 - y0
            wx = min(pad[0] + ev[0], tw) - pad[0]
            wy = min(pad[1] + ev[1], th) - pad[1]
            if wx > 0 and wy > 0:
                seed_tile[pad[0] : pad[0] + wx, pad[1] : pad[1] + wy, :] = seed[
                    x0 + pad[0] : x0 + pad[0] + wx,
                    y0 + pad[1] : y0 + pad[1] + wy,
                    :,
                ]

            if cfg.backend == "device":
                # On-device approximation (ops/watershed_jax.py): minimax-path
                # relaxation instead of the sequential priority flood.  Label
                # geometry matches the exact path away from plateau ties; use
                # for TPU-resident pipelines where the host hop dominates.
                labels = _device_instance_tile(
                    None if distance is None else distance.astype(np.float32),
                    binary, seed_tile, cfg,
                )
                labels[labels == 1] = 0
            elif cfg.backend == "fused":
                # one native call: virtual z-expansion + chamfer dilation +
                # flood (bit-identical to the materialized path below)
                labels = instance_tile(
                    distance,
                    binary,
                    seed_tile,
                    expand_z=expand_z,
                    expand_mask=cfg.expand_mask,
                    distance_floor=cfg.distance_floor,
                    seed_background_below=cfg.seed_background_below,
                    connectivity=cfg.connectivity,
                    compactness=cfg.compactness,
                    watershed_line=True,
                )
                labels[labels == 1] = 0  # drop background label
            elif cfg.backend == "materialized":
                # fake isotropy: replicate z (segment.py:444-450)
                dist_e = np.repeat(distance, expand_z, axis=2)
                seed_e = np.repeat(seed_tile, expand_z, axis=2)
                mask_e = np.repeat(binary, expand_z, axis=2)

                dist_e[dist_e < cfg.distance_floor] = 0  # steep cutoffs
                if cfg.expand_mask:
                    from scipy import ndimage as ndi

                    mask_e = ndi.binary_dilation(
                        mask_e, iterations=cfg.expand_mask
                    )
                seed_e[dist_e < cfg.seed_background_below] = 1  # background

                labels_e = watershed(
                    -dist_e,
                    seed_e,
                    mask=mask_e,
                    connectivity=cfg.connectivity,
                    compactness=cfg.compactness,
                    watershed_line=True,
                )
                labels_e[labels_e == 1] = 0  # drop background label

                labels = labels_e[:, :, ::expand_z]
            else:
                raise ValueError(f"unknown watershed backend {cfg.backend!r}")

            # suppress edge-touching labels for seam-free merging
            # (segment.py:486-496)
            edge_ids = np.unique(
                np.concatenate(
                    [
                        labels[0].ravel(),
                        labels[-1].ravel(),
                        labels[:, 0].ravel(),
                        labels[:, -1].ravel(),
                    ]
                )
            )
            labels[np.isin(labels, edge_ids)] = 0
            return labels

    tiles = [(x0, x1, y0, y1) for x0, x1 in x_ind for y0, y1 in y_ind]
    workers = cfg.tile_workers or max(1, (os.cpu_count() or 1) - 1)
    # workers x per-tile peak must fit host RAM: the tile table assumes ONE
    # tile in flight (reference semantics), so concurrency is capped — an
    # explicit cfg.tile_workers is capped too (it multiplies the same peak)
    workers = _cap_tile_workers(
        workers, pad, ev, Z, cfg, host_ram_bytes, concurrent_stages
    )
    if workers > 1 and len(tiles) > 1 and cfg.backend != "device":
        # floods run concurrently (the native op releases the GIL); the
        # merge below applies results in tile order, so the output is
        # bit-identical to the serial loop at any worker count.  In-flight
        # futures are bounded to the worker count so completed-but-unmerged
        # label arrays can't pile up beyond the RAM budget.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            it = iter(tiles)
            window: deque = deque()
            for _ in range(workers):
                tl = next(it, None)
                if tl is None:
                    break
                window.append((tl, pool.submit(_flood_tile, *tl)))
            while window:
                (x0, x1, y0, y1), fut = window.popleft()
                labels = fut.result()
                tl = next(it, None)
                if tl is not None:
                    window.append((tl, pool.submit(_flood_tile, *tl)))
                region = unique_mask[x0:x1, y0:y1, :]
                region[labels > 0] = labels[labels > 0]
                if progress:
                    progress(f"watershed tile [{x0}:{x1}, {y0}:{y1}]")
    else:
        for x0, x1, y0, y1 in tiles:
            labels = _flood_tile(x0, x1, y0, y1)
            region = unique_mask[x0:x1, y0:y1, :]
            region[labels > 0] = labels[labels > 0]
            if progress:
                progress(f"watershed tile [{x0}:{x1}, {y0}:{y1}]")

    return unique_mask, seed
