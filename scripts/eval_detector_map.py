"""Detection accuracy harness: train on synthetic cell scenes, report
VOC mAP@0.5 / recall (recorded in BASELINE.md).

The reference has no detection metric at all (quality was judged from box
overlays, ``hcat/utils.py:380-418``); this provides the number. Scenes are
blob "cells" in two classes (bigger/dimmer = IHC-like, smaller/brighter =
OHC-like) on noisy backgrounds, train/eval split by seed.

Usage: python scripts/eval_detector_map.py [--steps N] [--backbone small|resnet50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scene(rng, hw=(256, 256), n_cells=(6, 12)):
    """One 3-channel scene + boxes/labels (labels 1..2)."""
    H, W = hw
    img = rng.normal(0.15, 0.05, (H, W, 3)).astype(np.float32)
    n = int(rng.integers(*n_cells))
    boxes, labels = [], []
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for _ in range(n):
        cls = int(rng.integers(1, 3))
        r = rng.uniform(9, 13) if cls == 1 else rng.uniform(14, 19)
        amp = rng.uniform(0.55, 0.8) if cls == 1 else rng.uniform(0.35, 0.55)
        cy = rng.uniform(r, H - r)
        cx = rng.uniform(r, W - r)
        g = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (0.4 * r * r))
        chan = np.array([0.8, 1.0, 0.9]) * amp
        img += g[..., None] * chan[None, None, :].astype(np.float32)
        boxes.append([cx - r, cy - r, cx + r, cy + r])
        labels.append(cls)
    return (
        img.clip(0, 1),
        np.asarray(boxes, np.float32),
        np.asarray(labels, np.int32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--backbone", default="small")
    ap.add_argument("--eval-scenes", type=int, default=16)
    ap.add_argument("--hw", type=int, default=256)
    args = ap.parse_args()

    import jax

    from hcunet_tpu.analysis.detection_metrics import evaluate_detections
    from hcunet_tpu.config import DetectorConfig
    from hcunet_tpu.models.detection import Detector
    from hcunet_tpu.train.detection_trainer import (
        DetectionTrainConfig, DetectionTrainer,
    )

    hw = (args.hw, args.hw)
    cfg = DetectorConfig(
        num_classes=3, max_detections=64, rpn_pre_nms_top_n=256,
        rpn_post_nms_top_n=64, anchor_sizes=(16, 32, 64, 128, 256),
        box_score_thresh=0.3,
    )
    det = Detector(cfg, backbone=args.backbone)
    variables = det.init(jax.random.PRNGKey(0), hw)
    trainer = DetectionTrainer(
        det, variables,
        DetectionTrainConfig(learning_rate=3e-4, gamma=1.0, max_gt=32),
    )

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(args.steps):
        img, boxes, labels = scene(rng, hw)
        norm = ((img - 0.5) / 0.5)[None]
        loss = trainer.train_step(norm.astype(np.float32), boxes, labels)
        if (i + 1) % 100 == 0:
            print(
                f"step {i + 1}/{args.steps} loss {float(loss):.3f} "
                f"({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )

    # eval on held-out scenes
    eval_rng = np.random.default_rng(10_000)
    preds, gts = [], []
    for _ in range(args.eval_scenes):
        img, boxes, labels = scene(eval_rng, hw)
        norm = ((img - 0.5) / 0.5)[None].astype(np.float32)
        out = det.detect(trainer.variables, norm)
        valid = np.asarray(out["valid"][0])
        preds.append(
            {
                "boxes": np.asarray(out["boxes"][0])[valid],
                "scores": np.asarray(out["scores"][0])[valid],
                "labels": np.asarray(out["labels"][0])[valid],
            }
        )
        gts.append({"boxes": boxes, "labels": labels})
    m = evaluate_detections(preds, gts, iou_thresh=0.5)
    print(
        f"mAP@0.5 {m['map']:.3f}  recall {m['recall']:.3f}  "
        f"per-class { {k: round(v['ap'], 3) for k, v in m['per_class'].items()} }"
    )


if __name__ == "__main__":
    main()
