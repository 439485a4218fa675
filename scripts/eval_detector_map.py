"""Detection accuracy harness: train on synthetic cell scenes, report
VOC mAP@0.5 / recall (recorded in BASELINE.md).

The reference has no detection metric at all (quality was judged from box
overlays, ``hcat/utils.py:380-418``); this provides the number.

Two scene generators:

* ``blobs`` — the round-2 harness: well-separated Gaussian cells in two
  classes (smaller/brighter = OHC-like, bigger/dimmer = IHC-like).
* ``cochlea`` — the hardened round-3 harness: cells laid out like the
  reference's target tissue (three dense *touching* rows of OHCs plus an
  offset IHC row along a curved arc, mirroring the geometry of
  ``hcat/main.py``'s cochlea stacks) with junk clutter that carries no
  ground truth (large dim debris blobs, bright elongated streaks, specks)
  and a smooth illumination gradient.  Eval can run at the production
  detection tile geometry (``--eval-hw 1000``, DetectorConfig.DET_EVAL).

Usage: python scripts/eval_detector_map.py [--steps N]
       [--backbone small|resnet50] [--scene blobs|cochlea] [--eval-hw N]
       [--schedule exp|cosine] [--lr LR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _add_gauss(img, cy, cx, ry, rx, angle, amp, chan):
    """Insert one (possibly elongated, rotated) Gaussian patch in place."""
    H, W, _ = img.shape
    ext = int(2.2 * max(ry, rx)) + 1
    y0, y1 = max(0, int(cy) - ext), min(H, int(cy) + ext + 1)
    x0, x1 = max(0, int(cx) - ext), min(W, int(cx) + ext + 1)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float32)
    dy, dx = yy - cy, xx - cx
    ca, sa = np.cos(angle), np.sin(angle)
    u = ca * dx + sa * dy
    v = -sa * dx + ca * dy
    g = np.exp(-(u * u) / (0.4 * rx * rx) - (v * v) / (0.4 * ry * ry))
    img[y0:y1, x0:x1] += g[..., None] * np.asarray(chan, np.float32) * amp


def scene(rng, hw=(256, 256), n_cells=(6, 12)):
    """Round-2 blob scene: separated cells, clean background."""
    H, W = hw
    img = rng.normal(0.15, 0.05, (H, W, 3)).astype(np.float32)
    n = int(rng.integers(*n_cells))
    boxes, labels = [], []
    for _ in range(n):
        cls = int(rng.integers(1, 3))
        r = rng.uniform(9, 13) if cls == 1 else rng.uniform(14, 19)
        amp = rng.uniform(0.55, 0.8) if cls == 1 else rng.uniform(0.35, 0.55)
        cy = rng.uniform(r, H - r)
        cx = rng.uniform(r, W - r)
        _add_gauss(img, cy, cx, r, r, 0.0, amp, [0.8, 1.0, 0.9])
        boxes.append([cx - r, cy - r, cx + r, cy + r])
        labels.append(cls)
    return (
        img.clip(0, 1),
        np.asarray(boxes, np.float32),
        np.asarray(labels, np.int32),
    )


def cochlea_scene(rng, hw=(256, 256), clutter=True, shift=False,
                  occlude=False):
    """Hardened scene: touching OHC rows + IHC row on an arc, junk clutter.

    De-saturation knobs (VERDICT r4 #4 — eval distribution disjoint from
    training):

    * ``shift`` — every generator parameter drawn from ranges DISJOINT
      from the training ranges: denser rows (cells overlap more), smaller
      and dimmer cells, 3× the junk, steeper illumination gradient.
    * ``occlude`` — bright debris blobs pasted DIRECTLY OVER a third of
      the cells (ground truth unchanged): partial-occlusion stress.
    """
    H, W = hw
    img = rng.normal(0.15, 0.05, (H, W, 3)).astype(np.float32)
    # smooth illumination gradient (confocal vignetting-ish)
    gy = np.linspace(-1, 1, H, dtype=np.float32)[:, None]
    gx = np.linspace(-1, 1, W, dtype=np.float32)[None, :]
    grad = 0.06 if not shift else rng.uniform(0.10, 0.16)
    a, b = rng.uniform(-grad, grad, 2)
    img += (a * gy + b * gx)[..., None]

    boxes, labels = [], []
    # arc through the image
    amp_y = rng.uniform(0.05, 0.18) * H
    phase = rng.uniform(0, 2 * np.pi)
    freq = rng.uniform(0.5, 1.5)
    base = rng.uniform(0.35, 0.65) * H

    def arc(x):
        return base + amp_y * np.sin(2 * np.pi * freq * x / W + phase)

    r_ohc = rng.uniform(9, 12) if not shift else rng.uniform(7.0, 8.8)
    row_gap = rng.uniform(2.0, 2.4) * r_ohc
    ohc_amp = (0.5, 0.8) if not shift else (0.32, 0.48)
    ihc_amp = (0.35, 0.55) if not shift else (0.22, 0.34)
    ohc_step = (1.9, 2.2) if not shift else (1.6, 1.85)  # denser → overlap
    # three touching OHC rows (cls 1: smaller/brighter)
    x = rng.uniform(4, 2.5 * r_ohc)
    while x < W - 4:
        yb = arc(x)
        for row in (-1, 0, 1):
            if rng.uniform() < 0.06:  # occasional missing cell (real tissue)
                continue
            r = r_ohc * rng.uniform(0.9, 1.1)
            cy = yb + row * row_gap + rng.normal(0, 0.08 * r)
            cx = x + rng.normal(0, 0.08 * r)
            if not (r < cy < H - r and r < cx < W - r):
                continue
            amp = rng.uniform(*ohc_amp)
            _add_gauss(img, cy, cx, r, r, 0.0, amp, [0.8, 1.0, 0.9])
            boxes.append([cx - r, cy - r, cx + r, cy + r])
            labels.append(1)
        # touching: next cell ~2r away along the row
        x += r_ohc * rng.uniform(*ohc_step)
    # one IHC row (cls 2: bigger/dimmer), offset to the other side
    x = rng.uniform(4, 3 * r_ohc)
    while x < W - 4:
        r = rng.uniform(14, 19) if not shift else rng.uniform(11, 13.5)
        cy = arc(x) - 2.2 * row_gap + rng.normal(0, 0.1 * r)
        cx = x + rng.normal(0, 0.1 * r)
        x += r * rng.uniform(2.1, 2.5)
        if not (r < cy < H - r and r < cx < W - r):
            continue
        amp = rng.uniform(*ihc_amp)
        _add_gauss(img, cy, cx, r, r, 0.0, amp, [0.8, 1.0, 0.9])
        boxes.append([cx - r, cy - r, cx + r, cy + r])
        labels.append(2)

    if occlude and len(boxes):
        # debris pasted over ~1/3 of the cells; GT stays — the detector
        # must find partially hidden cells
        idx = rng.permutation(len(boxes))[: max(1, len(boxes) // 3)]
        for i in idx:
            x1, y1, x2, y2 = boxes[i]
            cy = 0.5 * (y1 + y2) + rng.normal(0, 3)
            cx = 0.5 * (x1 + x2) + rng.normal(0, 3)
            rr = 0.7 * max(x2 - x1, y2 - y1)
            _add_gauss(img, cy, cx, rr, rr * rng.uniform(0.5, 1.0),
                       rng.uniform(0, np.pi), rng.uniform(0.35, 0.6),
                       [1.0, 0.75, 0.65])

    clutter_mult = 3 if shift else 1
    if clutter:  # junk with NO ground truth
        for _ in range(int(rng.integers(3, 8)) * clutter_mult
                       * max(1, (H * W) // 256**2)):
            kind = rng.integers(0, 3)
            cy, cx = rng.uniform(0, H), rng.uniform(0, W)
            if kind == 0:  # large dim debris
                r = rng.uniform(25, 45)
                _add_gauss(img, cy, cx, r, r * rng.uniform(0.6, 1.0),
                           rng.uniform(0, np.pi), rng.uniform(0.08, 0.18),
                           [1.0, 0.8, 0.7])
            elif kind == 1:  # bright elongated streak
                r = rng.uniform(3, 5)
                _add_gauss(img, cy, cx, r, r * rng.uniform(6, 12),
                           rng.uniform(0, np.pi), rng.uniform(0.3, 0.6),
                           [0.9, 0.9, 1.0])
            else:  # specks, too small to be cells
                for _ in range(int(rng.integers(3, 9))):
                    _add_gauss(img, cy + rng.normal(0, 20),
                               cx + rng.normal(0, 20),
                               rng.uniform(1.5, 3.5), rng.uniform(1.5, 3.5),
                               0.0, rng.uniform(0.5, 0.9), [1.0, 1.0, 0.8])
    return (
        img.clip(0, 1),
        np.asarray(boxes, np.float32).reshape(-1, 4),
        np.asarray(labels, np.int32),
    )


def _collect(det, variables, gen, eval_rng, n_scenes, hw, **scene_kw):
    preds, gts = [], []
    for _ in range(n_scenes):
        img, boxes, labels = gen(eval_rng, hw, **scene_kw)
        norm = ((img - 0.5) / 0.5)[None].astype(np.float32)
        out = det.detect(variables, norm)
        valid = np.asarray(out["valid"][0])
        preds.append(
            {
                "boxes": np.asarray(out["boxes"][0])[valid],
                "scores": np.asarray(out["scores"][0])[valid],
                "labels": np.asarray(out["labels"][0])[valid],
            }
        )
        gts.append({"boxes": boxes, "labels": labels})
    return preds, gts


def _evaluate(det, variables, gen, eval_rng, n_scenes, hw,
              evaluate_detections, **scene_kw):
    preds, gts = _collect(det, variables, gen, eval_rng, n_scenes, hw,
                          **scene_kw)
    return evaluate_detections(preds, gts, iou_thresh=0.5)


def _stress_grid(det, variables, gen, n_scenes, hw, evaluate_detections,
                 tag=""):
    """De-saturation grid (VERDICT r4 #4): clean / parameter-shift /
    occlusion scenes, each scored at IoU 0.5 AND 0.75.  One detector pass
    per condition; both thresholds re-score the same predictions."""
    rows = []
    for name, kw, seed in (
        ("clean", {}, 10_000),
        ("shift", {"shift": True}, 30_000),
        ("occlusion", {"occlude": True}, 40_000),
    ):
        preds, gts = _collect(
            det, variables, gen, np.random.default_rng(seed), n_scenes, hw,
            **kw,
        )
        m50 = evaluate_detections(preds, gts, iou_thresh=0.5)
        m75 = evaluate_detections(preds, gts, iou_thresh=0.75)
        rows.append((name, m50, m75))
        print(
            f"[stress{tag} {name} @{hw[0]}] "
            f"mAP@0.5 {m50['map']:.3f} recall@0.5 {m50['recall']:.3f} | "
            f"mAP@0.75 {m75['map']:.3f} recall@0.75 {m75['recall']:.3f}",
            flush=True,
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--backbone", default="small")
    ap.add_argument("--scene", default="blobs", choices=("blobs", "cochlea"))
    ap.add_argument("--eval-scenes", type=int, default=16)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--eval-hw", type=int, default=0,
                    help="additional eval at this tile size (e.g. 1000 = "
                         "the production DET_EVAL geometry)")
    ap.add_argument("--schedule", default="exp", choices=("exp", "cosine"))
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--max-detections", type=int, default=0,
                    help="override (default 64, or 500 at eval-hw>=768)")
    ap.add_argument("--stress", action="store_true",
                    help="de-saturation grid: clean/shift/occlusion eval "
                         "scenes at IoU 0.5 and 0.75 (cochlea scene only)")
    ap.add_argument("--label-noise", action="store_true",
                    help="annotation-noise training stress: 10%% of GT "
                         "boxes dropped, ±5%%-of-size corner jitter, 5%% "
                         "class flips — training only; eval stays clean")
    args = ap.parse_args()

    import jax

    from hcunet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hcunet_tpu.analysis.detection_metrics import evaluate_detections
    from hcunet_tpu.config import DetectorConfig
    from hcunet_tpu.models.detection import Detector
    from hcunet_tpu.train.detection_trainer import (
        DetectionTrainConfig, DetectionTrainer,
    )

    hw = (args.hw, args.hw)
    gen = scene if args.scene == "blobs" else cochlea_scene
    cfg = DetectorConfig(
        num_classes=3, max_detections=args.max_detections or 64,
        rpn_pre_nms_top_n=256,
        rpn_post_nms_top_n=64, anchor_sizes=(16, 32, 64, 128, 256),
        box_score_thresh=0.3,
    )
    det = Detector(cfg, backbone=args.backbone)
    variables = det.init(jax.random.PRNGKey(0), hw)
    trainer = DetectionTrainer(
        det, variables,
        DetectionTrainConfig(
            learning_rate=args.lr, gamma=1.0, max_gt=128,
            schedule=args.schedule,
            warmup_steps=min(100, args.steps // 10),
            total_steps=args.steps,
        ),
    )

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(args.steps):
        img, boxes, labels = gen(rng, hw)
        if args.label_noise and len(boxes):
            # the kind of noise real manual VOC annotation carries
            keep = rng.random(len(boxes)) > 0.10
            boxes, labels = boxes[keep], labels[keep]
            if len(boxes):
                wh = np.stack(
                    [boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]], 1
                )
                boxes = boxes + rng.normal(0, 0.05, boxes.shape) * np.concatenate(
                    [wh, wh], 1
                )
                flip = rng.random(len(labels)) < 0.05
                labels = np.where(flip, 3 - labels, labels).astype(np.int32)
        if len(boxes) == 0:
            continue
        norm = ((img - 0.5) / 0.5)[None]
        loss = trainer.train_step(norm.astype(np.float32), boxes, labels)
        if (i + 1) % 100 == 0:
            print(
                f"step {i + 1}/{args.steps} loss {float(loss):.3f} "
                f"({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )

    m = _evaluate(det, trainer.variables, gen, np.random.default_rng(10_000),
                  args.eval_scenes, hw, evaluate_detections)
    print(
        f"[{args.scene} @{args.hw}] mAP@0.5 {m['map']:.3f}  "
        f"recall {m['recall']:.3f}  "
        f"per-class { {k: round(v['ap'], 3) for k, v in m['per_class'].items()} }",
        flush=True,
    )
    if args.stress and args.scene == "cochlea":
        _stress_grid(det, trainer.variables, gen, args.eval_scenes, hw,
                     evaluate_detections)
    if args.eval_hw:
        # production tile geometry: bigger scenes, more cells, more boxes
        big_cfg = DetectorConfig(
            num_classes=3,
            max_detections=args.max_detections or 500,
            rpn_pre_nms_top_n=2048, rpn_post_nms_top_n=512,
            anchor_sizes=(16, 32, 64, 128, 256), box_score_thresh=0.3,
        )
        big = Detector(big_cfg, backbone=args.backbone)
        m = _evaluate(big, trainer.variables, gen,
                      np.random.default_rng(20_000),
                      max(4, args.eval_scenes // 4),
                      (args.eval_hw, args.eval_hw), evaluate_detections)
        print(
            f"[{args.scene} @{args.eval_hw} production-geometry] "
            f"mAP@0.5 {m['map']:.3f}  recall {m['recall']:.3f}  "
            f"per-class { {k: round(v['ap'], 3) for k, v in m['per_class'].items()} }",
            flush=True,
        )
        if args.stress and args.scene == "cochlea":
            _stress_grid(
                big, trainer.variables, gen, max(4, args.eval_scenes // 4),
                (args.eval_hw, args.eval_hw), evaluate_detections,
                tag=" production",
            )


if __name__ == "__main__":
    main()
