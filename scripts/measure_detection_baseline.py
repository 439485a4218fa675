"""Measure a torch-CPU Faster R-CNN detection baseline (BASELINE.md).

The reference runs torchvision's ``fasterrcnn_resnet50_fpn`` per 2D z-slice
(``hcat/segment.py:181-192``); torchvision is absent here, so this drives the
test suite's name-identical torch re-implementation (full resnet50 width,
FPN + RPN head) plus the numpy transliteration of torchvision's proposal /
RoI pipeline — the same modules the jax detector is oracle-tested against
(tests/test_detector_oracle.py).  Slightly favors torch (no torchvision
transform/normalize overhead); the ratio is conservative.

Usage:  python scripts/measure_detection_baseline.py [H W] [slices]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch

from hcunet_tpu.config import DetectorConfig
from hcunet_tpu.models.detection import LEVELS, generate_anchors

import test_detector_oracle as oracle


def main():
    args = [int(a) for a in sys.argv[1:]]
    H, W = (args[0], args[1]) if len(args) >= 2 else (512, 512)
    n_slices = args[2] if len(args) > 2 else 3

    oracle.WIDTH = 64  # full resnet50 width
    cfg = DetectorConfig()  # production: 500 detections, 1000/1000 topk
    body, fpn, rpn, head, _sd = oracle.build_torch_detector(cfg, seed=0)

    torch.manual_seed(1)
    imgs = torch.rand(n_slices, 1, 3, H, W)
    hw = (H, W)

    # warm-up (thread pools, lazy allocs)
    oracle.torch_trunk_forward(body, fpn, rpn, imgs[0])

    t0 = time.perf_counter()
    for i in range(n_slices):
        pyr_np, rpn_np = oracle.torch_trunk_forward(body, fpn, rpn, imgs[i])
        feat_shapes = {l: pyr_np[l].shape[1:3] for l in LEVELS}
        anchors = generate_anchors(feat_shapes, cfg.anchor_sizes, cfg.anchor_ratios)
        anchors_np = {l: np.asarray(a, np.float64) for l, a in anchors.items()}
        props, _ = oracle.tv_filter_proposals(rpn_np, anchors_np, hw, cfg)
        oracle.tv_roi_pipeline(pyr_np, props, head, hw, cfg)
    dt = (time.perf_counter() - t0) / n_slices
    print(
        f"torch-cpu faster-rcnn ({H}x{W}): {dt:.2f} s/slice "
        f"-> {1.0 / dt:.3f} slices/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
