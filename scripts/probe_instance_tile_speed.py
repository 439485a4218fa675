"""A/B the fused native instance tile at production geometry.

Builds the instance-stage inputs exactly as ``infer/instance.py`` does for
one production chunk (the 6144²x20/numchunks=6 run: a single ~1229²x20
tile, prob-map path) and times ``instance_tile3d`` from two shared
libraries: the current build and (optionally) one built from an older
revision, passed as ``--baseline-so PATH``.

Usage:
  python scripts/probe_instance_tile_speed.py [--hw 1229] [--z 20] \
      [--cells 100] [--reps 3] [--baseline-so /tmp/old.so]

Set HCUNET_NATIVE_TIMING=1 to see the chamfer/seed/flood split.
"""

import argparse
import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scene(hw: int, z: int, n_cells: int, rng):
    """A blurred multi-cell probability map like the pipeline's unet output
    (post blur/floor/x10 rescale, then tile-normalized back to [0,1])."""
    prob = np.zeros((hw, hw, z), np.float32)
    xs = rng.uniform(20, hw - 20, n_cells)
    ys = rng.uniform(20, hw - 20, n_cells)
    zs = rng.uniform(4, z - 4, n_cells)
    r = rng.uniform(8, 18, n_cells)
    # separable accumulation is too slow at 1229²x20 in pure numpy per cell;
    # paint local windows only
    for cx, cy, cz, cr in zip(xs, ys, zs, r):
        w = int(3 * cr)
        x0, x1 = max(0, int(cx) - w), min(hw, int(cx) + w)
        y0, y1 = max(0, int(cy) - w), min(hw, int(cy) + w)
        gx = np.arange(x0, x1, dtype=np.float32) - cx
        gy = np.arange(y0, y1, dtype=np.float32) - cy
        gz = np.arange(z, dtype=np.float32) - cz
        g = np.exp(
            -(gx[:, None, None] ** 2 + gy[None, :, None] ** 2) / (2 * cr**2)
            - gz[None, None, :] ** 2 / 8.0
        )
        np.maximum(prob[x0:x1, y0:y1], g, out=prob[x0:x1, y0:y1])
    _scene.centers = (xs, ys, zs)
    return prob


def _run_one(so_path, distance, binary, seed_tile, cfg, reps):
    lib = ctypes.CDLL(so_path)
    lib.instance_tile3d.restype = ctypes.c_int
    lib.instance_tile3d.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_double,
        ctypes.c_int,
    ]
    out = np.zeros(distance.shape, np.int32)
    dims = np.asarray(distance.shape, np.int64)
    best = None
    for _ in range(reps):
        out[:] = 0
        t0 = time.perf_counter()
        rc = lib.instance_tile3d(
            distance.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            binary.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            seed_tile.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            int(cfg.expand_z), int(cfg.expand_mask),
            float(cfg.distance_floor), float(cfg.seed_background_below),
            int(cfg.connectivity), float(cfg.compactness), 1,
        )
        assert rc == 0, rc
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=1229)
    ap.add_argument("--z", type=int, default=20)
    ap.add_argument("--cells", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--baseline-so", default=None)
    args = ap.parse_args()

    from hcunet_tpu.config import WatershedConfig

    cfg = WatershedConfig()
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    prob = _scene(args.hw, args.z, args.cells, rng)
    print(f"scene: {time.perf_counter() - t0:.1f}s", flush=True)

    # _flood_tile's prob-map path: normalize, threshold, seeds
    tile = prob.astype(np.float64)
    tile += 1e-8
    tile -= tile.min()
    tile /= max(tile.max(), 1e-9)
    binary = (tile > cfg.mask_prob_threshold).astype(np.uint8)
    distance = tile
    seed_tile = np.zeros(tile.shape, np.int32)
    # seed each cell at its own center like the detector-seeded path (the
    # detector boxes land on real cells, so nearly every cell gets a seed)
    lab = 2
    for cx, cy, cz in zip(*_scene.centers):
        cx, cy, cz = int(cx), int(cy), int(np.clip(cz, 0, args.z - 1))
        if distance[cx, cy, cz] > 0.3:
            seed_tile[cx - 1 : cx + 2, cy - 1 : cy + 2, cz] = lab
            lab += 1
    print(f"{lab - 2} seeds, mask fraction "
          f"{binary.mean():.3f}", flush=True)

    mvx = args.hw * args.hw * args.z / 1e6
    cur_so = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "build", "libhcunet_native.so",
    )
    t_new, out_new = _run_one(cur_so, distance, binary, seed_tile, cfg, args.reps)
    print(
        f"current: {t_new:.2f}s ({mvx / t_new:.2f} MVx/s unexpanded, "
        f"{int(out_new.max())} labels)", flush=True,
    )
    if args.baseline_so:
        t_old, out_old = _run_one(
            args.baseline_so, distance, binary, seed_tile, cfg, args.reps
        )
        same = np.array_equal(out_new, out_old)
        print(
            f"baseline: {t_old:.2f}s → speedup {t_old / t_new:.2f}x, "
            f"outputs identical: {same}", flush=True,
        )
        assert same, "A/B outputs diverged — the optimization is not exact"


if __name__ == "__main__":
    main()
