"""Runnable end-to-end demo on synthetic data — no checkpoints needed.

Generates a spiral of blob "hair cells", trains the small detector on its
slices for a minute, runs the full analyze() pipeline (tiled segmentation →
detection-seeded watershed → per-cell analytics → cochlear spline), and
writes artifacts into ./demo_out:

    cells.csv            per-cell stats + tonotopic position
    size_validation.tif  size-QA render
    overlay.png          detections over the max projection
    instances.png        colored instance labels

Usage:  python scripts/demo_synthetic.py [--out demo_out]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_volume(X=192, Y=192, Z=8, n_cells=14, seed=0):
    """Blob cells along a spiral arc."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.6 * np.pi, 2.2 * np.pi, n_cells)
    r = 28 + 22 * t / (2 * np.pi)
    cx = (X / 2 + r * np.cos(t)).astype(int)
    cy = (Y / 2 + r * np.sin(t)).astype(int)
    xx, yy, zz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z), indexing="ij")
    prob = np.zeros((X, Y, Z), np.float32)
    for x0, y0 in zip(cx, cy):
        prob = np.maximum(
            prob,
            np.exp(-(((xx - x0) ** 2 + (yy - y0) ** 2) / 90 + (zz - 4) ** 2 / 12)),
        ).astype(np.float32)
    volume = np.stack(
        [prob * s + rng.normal(0, 0.01, prob.shape) for s in (0.9, 1.0, 0.95, 0.9)],
        axis=-1,
    ).clip(0, 1).astype(np.float32)
    boxes = np.stack([cy - 7, cx - 7, cy + 7, cx + 7], axis=1).astype(np.float32)
    return volume, list(zip(cx, cy)), boxes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--train-steps", type=int, default=160)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    from hcunet_tpu.config import (
        DetectorConfig, PipelineConfig, TileConfig, UNetConfig, WatershedConfig,
    )
    from hcunet_tpu.core.shapes import unet_output_shape
    from hcunet_tpu.infer.pipeline import analyze
    from hcunet_tpu.models.detection import Detector
    from hcunet_tpu.train.detection_trainer import (
        DetectionTrainConfig, DetectionTrainer,
    )

    volume, centers, gt = build_volume()
    X, Y, Z, _ = volume.shape
    print(f"synthetic volume {volume.shape}, {len(centers)} cells")

    # intensity-proxy U-Net (geometry-honest; swap in a trained checkpoint
    # via Segmenter for real data)
    unet_cfg = UNetConfig(
        feature_sizes=(8, 16), kernel1=(3, 3, 2), kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), groups=1,
    )

    def unet_apply(tiles):
        out_sp = unet_output_shape(tiles.shape[1:-1], **unet_cfg.shape_kwargs())
        return tiles[:, : out_sp[0], : out_sp[1], : out_sp[2], :1] * 8.0

    det_cfg = DetectorConfig(
        num_classes=2, max_detections=32, rpn_pre_nms_top_n=128,
        rpn_post_nms_top_n=32, anchor_sizes=(16, 32, 64, 128, 256),
        box_score_thresh=0.1,
    )
    det = Detector(det_cfg, backbone="small")
    det_vars = det.init(jax.random.PRNGKey(0), (X, Y))
    # train on the channels the pipeline feeds the detector: (0, 2, 3)
    norm_slice = ((volume[..., 4, [0, 2, 3]] - 0.5) / 0.5).astype(np.float32)[None]
    trainer = DetectionTrainer(
        det, det_vars, DetectionTrainConfig(learning_rate=3e-4, gamma=1.0, max_gt=32)
    )
    print(f"training detector {args.train_steps} steps...")
    for i in range(args.train_steps):
        loss = trainer.train_step(norm_slice, gt, np.ones(len(gt), np.int32))
    print(f"detector loss: {loss:.3f}")

    result = analyze(
        volume=volume,
        unet_apply=jax.tree_util.Partial(lambda t: unet_apply(t)),
        detector=det,
        detector_variables=trainer.variables,
        cfg=PipelineConfig(
            numchunks=2, unet=unet_cfg,
            tiles=TileConfig(eval_size=(96, 96, 8), pad=(24, 24, 3), batch=4),
            watershed=WatershedConfig(expand_mask=2, z_tolerance=4),
        ),
        work_dir=args.out,
        save_plots=True,
        fit_cochlea=False,  # synthetic arc is too short for the spiral fit
    )
    good = [c for c in result.cells if not c.is_bad]
    print(f"pipeline found {len(good)} cells (truth: {len(centers)})")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from hcunet_tpu.analysis.viz import labels_to_rgb

    plt.figure(figsize=(6, 6))
    plt.imshow(volume[..., 1].max(axis=2), cmap="Greys_r")
    for c in good:
        x0, y0, z0, x1, y1, z1 = c.image_coords
        plt.plot([y0, y1, y1, y0, y0], [x0, x0, x1, x1, x0], "r", lw=0.8)
    plt.title(f"{len(good)} cells")
    plt.savefig(os.path.join(args.out, "overlay.png"), dpi=150)
    plt.close()

    plt.figure(figsize=(6, 6))
    plt.imshow(labels_to_rgb(result.unique_mask.max(axis=2)))
    plt.savefig(os.path.join(args.out, "instances.png"), dpi=150)
    plt.close()
    print(f"artifacts in {args.out}/: cells.csv, overlay.png, instances.png, "
          f"size_validation.tif")


if __name__ == "__main__":
    main()
