"""Time hot loop #3 (detection-seeded instance watershed) on a synthetic
scene at production-ish scale.

Usage:  python scripts/time_instance_stage.py [X Y Z n_cells]

Prints wall time of generate_unique_segmentation_mask and its internal
stages, so the native fused tile op can be compared against the
materialized-np.repeat python path (VERDICT round 1, item 6).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_scene(X, Y, Z, n_cells, seed=0):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(20, X - 20, n_cells)
    cy = rng.uniform(20, Y - 20, n_cells)
    xx, yy, zz = np.meshgrid(
        np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
    )
    prob = np.zeros((X, Y, Z), np.float32)
    for x0, y0 in zip(cx, cy):
        d2 = ((xx - x0) ** 2 + (yy - y0) ** 2) / 80 + (zz - Z / 2) ** 2 / 10
        prob = np.maximum(prob, np.exp(-d2)).astype(np.float32)
    # pipeline-style: blurred prob floored and x10 (so max > 1 triggers the
    # normalize-in-tile branch, like analyze())
    prob = np.where(prob < 0.25, 0.0, prob) * 10.0
    boxes = np.stack([cx - 8, cy - 8, cx + 8, cy + 8], axis=1).astype(np.float32)
    cand = {
        "boxes": boxes,
        "scores": np.full(n_cells, 0.9, np.float32),
        "labels": np.ones(n_cells, np.int32),
        "z_level": np.full(n_cells, float(Z // 2), np.float32),
    }
    return prob, cand


def main():
    args = [int(a) for a in sys.argv[1:5]]
    X, Y, Z, n_cells = (args + [768, 768, 12, 150])[:4] if args else (768, 768, 12, 150)
    from hcunet_tpu.config import WatershedConfig
    from hcunet_tpu.infer.instance import generate_unique_segmentation_mask

    prob, cand = build_scene(X, Y, Z, n_cells)
    print(f"scene: {X}x{Y}x{Z}, {n_cells} cells, prob max {prob.max():.2f}")

    events = []
    t_all = time.perf_counter()
    labels, seed = generate_unique_segmentation_mask(
        prob, cand, WatershedConfig(), progress=lambda m: events.append(
            (time.perf_counter(), m)
        ),
    )
    dt = time.perf_counter() - t_all
    n_found = len(np.unique(labels)) - 1
    print(f"total: {dt:.2f}s   instances found: {n_found}")
    t_prev = t_all
    for t, m in events:
        print(f"  +{t - t_prev:7.2f}s  {m}")
        t_prev = t
    mvx = X * Y * Z / 1e6
    print(f"throughput: {mvx / dt:.2f} MVx/s over {mvx:.1f} MVx")


if __name__ == "__main__":
    main()
