"""Full-detector oracle tests (VERDICT round 1, item 2a).

The reference inherits torchvision's exact Faster R-CNN semantics
(``hcat/rcnn.py:14``).  Round 1 oracle-tested only the ResNet body and the
RoIAlign kernel; these tests close the gap:

1. **Trunk parity** — torch re-implementation of backbone + FPN + RPN head
   using torchvision's exact module names; ported weights must produce the
   same pyramid and RPN outputs.
2. **Proposal-selection parity** — a numpy transliteration of torchvision's
   ``RegionProposalNetwork.filter_proposals`` (per-level top-k, decode,
   clip, remove-small, per-level NMS, global post-NMS top-k) fed the SAME
   rpn outputs must produce the same proposal list as
   ``Detector._proposals_single``.
3. **End-to-end detect() parity** — torch trunk + numpy RoI pipeline
   (level assignment, torchvision RoIAlign oracle, box head MLP,
   ``postprocess_detections`` transliteration) vs the jax ``detect()`` with
   ported weights on the same image.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from hcunet_tpu.config import DetectorConfig
from hcunet_tpu.models.detection import (
    LEVELS,
    STRIDES,
    Detector,
    generate_anchors,
)
from hcunet_tpu.ops.nms import nms_indices_np
from hcunet_tpu.utils.port_torchvision import detector_variables_from_torchvision

from test_detection import _roi_align_oracle
from test_port_torchvision import TorchResNet50Body

WIDTH = 16  # resnet50 structure at 1/4 width — fast but name-identical


# ---------------------------------------------------------------------------
# torch modules with torchvision names
# ---------------------------------------------------------------------------


class TorchFPN(nn.Module):
    """torchvision FeaturePyramidNetwork + LastLevelMaxPool naming."""

    def __init__(self, in_channels, out_channels=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(c, out_channels, 1)) for c in in_channels]
        )
        self.layer_blocks = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(out_channels, out_channels, 3, padding=1))
             for _ in in_channels]
        )

    def forward(self, feats):  # feats: dict c2..c5 (NCHW)
        names = ["c2", "c3", "c4", "c5"]
        last_inner = self.inner_blocks[3](feats["c5"])
        results = {"p5": self.layer_blocks[3](last_inner)}
        for i in (2, 1, 0):
            lateral = self.inner_blocks[i](feats[names[i]])
            top_down = F.interpolate(
                last_inner, size=lateral.shape[-2:], mode="nearest"
            )
            last_inner = lateral + top_down
            results[f"p{i + 2}"] = self.layer_blocks[i](last_inner)
        results["p6"] = F.max_pool2d(results["p5"], 1, 2, 0)
        return results


class TorchRPNHead(nn.Module):
    def __init__(self, channels, num_anchors):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)
        self.cls_logits = nn.Conv2d(channels, num_anchors, 1)
        self.bbox_pred = nn.Conv2d(channels, num_anchors * 4, 1)

    def forward(self, feat):
        t = F.relu(self.conv(feat))
        return self.cls_logits(t), self.bbox_pred(t)


class TorchBoxHead(nn.Module):
    def __init__(self, in_features, num_classes, rep=1024):
        super().__init__()
        self.fc6 = nn.Linear(in_features, rep)
        self.fc7 = nn.Linear(rep, rep)
        self.cls_score = nn.Linear(rep, num_classes)
        self.bbox_pred = nn.Linear(rep, num_classes * 4)


def build_torch_detector(cfg, seed=0):
    torch.manual_seed(seed)
    body = TorchResNet50Body(width=WIDTH).eval()
    chans = [WIDTH * 4 * (2**s) for s in range(4)]
    fpn = TorchFPN(chans).eval()
    rpn = TorchRPNHead(256, len(cfg.anchor_ratios)).eval()
    head = TorchBoxHead(256 * cfg.roi_align_output**2, cfg.num_classes).eval()
    sd = {}
    for k, v in body.state_dict().items():
        sd[f"backbone.body.{k}"] = v
    for k, v in fpn.state_dict().items():
        sd[f"backbone.fpn.{k}"] = v
    for k, v in rpn.state_dict().items():
        sd[f"rpn.head.{k}"] = v
    for name in ("fc6", "fc7"):
        for k, v in getattr(head, name).state_dict().items():
            sd[f"roi_heads.box_head.{name}.{k}"] = v
    for name in ("cls_score", "bbox_pred"):
        for k, v in getattr(head, name).state_dict().items():
            sd[f"roi_heads.box_predictor.{name}.{k}"] = v
    return body, fpn, rpn, head, sd


def torch_trunk_forward(body, fpn, rpn, img_nchw):
    with torch.no_grad():
        feats = body(img_nchw)
        pyramid = fpn(feats)
        rpn_out = {l: rpn(pyramid[l]) for l in LEVELS}
    pyr_np = {l: pyramid[l].numpy().transpose(0, 2, 3, 1) for l in LEVELS}
    rpn_np = {}
    for l in LEVELS:
        logits, deltas = rpn_out[l]
        rpn_np[l] = (
            logits.numpy().transpose(0, 2, 3, 1),
            deltas.numpy().transpose(0, 2, 3, 1),
        )
    return pyr_np, rpn_np


# ---------------------------------------------------------------------------
# numpy transliterations of torchvision's pipeline
# ---------------------------------------------------------------------------


def np_decode(ref, deltas, weights):
    wx, wy, ww, wh = weights
    rw = ref[:, 2] - ref[:, 0]
    rh = ref[:, 3] - ref[:, 1]
    rx = ref[:, 0] + 0.5 * rw
    ry = ref[:, 1] + 0.5 * rh
    rw = np.maximum(rw, 1e-4)
    rh = np.maximum(rh, 1e-4)
    dx, dy, dw, dh = (deltas[:, i] / w for i, w in enumerate(weights))
    dw = np.clip(dw, -10.0, 4.135)
    dh = np.clip(dh, -10.0, 4.135)
    cx = dx * rw + rx
    cy = dy * rh + ry
    w = np.exp(dw) * rw
    h = np.exp(dh) * rh
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)


def np_clip(boxes, hw):
    h, w = hw
    out = boxes.copy()
    out[:, 0] = np.clip(out[:, 0], 0, w)
    out[:, 1] = np.clip(out[:, 1], 0, h)
    out[:, 2] = np.clip(out[:, 2], 0, w)
    out[:, 3] = np.clip(out[:, 3], 0, h)
    return out


def tv_filter_proposals(rpn_np, anchors_np, hw, cfg):
    """torchvision RegionProposalNetwork.filter_proposals semantics."""
    boxes_l, scores_l, lvl_l = [], [], []
    for li, lvl in enumerate(LEVELS):
        logits, deltas = rpn_np[lvl]
        s = logits[0].reshape(-1).astype(np.float64)
        d = deltas[0].reshape(-1, 4).astype(np.float64)
        a = anchors_np[lvl]
        k = min(cfg.rpn_pre_nms_top_n, len(s))
        idx = np.argsort(-s, kind="stable")[:k]
        boxes_l.append(np_decode(a[idx], d[idx], Detector.RPN_WEIGHTS))
        scores_l.append(s[idx])
        lvl_l.append(np.full(k, li))
    boxes = np_clip(np.concatenate(boxes_l), hw)
    scores = np.concatenate(scores_l)
    lvls = np.concatenate(lvl_l)
    ok = ((boxes[:, 2] - boxes[:, 0]) > 1e-3) & ((boxes[:, 3] - boxes[:, 1]) > 1e-3)
    boxes, scores, lvls = boxes[ok], scores[ok], lvls[ok]
    off = lvls * (max(hw) + 2.0)
    keep = nms_indices_np(boxes + off[:, None], scores, cfg.rpn_nms_thresh)
    keep = keep[: cfg.rpn_post_nms_top_n]
    return boxes[keep], scores[keep]


def tv_roi_pipeline(pyr_np, props, head, hw, cfg):
    """torchvision RoIHeads inference: MultiScaleRoIAlign level mapping,
    RoIAlign oracle, box head MLP, postprocess_detections."""
    w = props[:, 2] - props[:, 0]
    h = props[:, 3] - props[:, 1]
    area = np.maximum(w * h, 1e-6)
    k = np.clip(np.floor(4 + np.log2(np.sqrt(area) / 224.0)), 2, 5).astype(int)
    feats = np.zeros(
        (len(props), cfg.roi_align_output, cfg.roi_align_output, 256), np.float64
    )
    for lvl_i, lvl in ((2, "p2"), (3, "p3"), (4, "p4"), (5, "p5")):
        sel = k == lvl_i
        if not sel.any():
            continue
        feats[sel] = _roi_align_oracle(
            pyr_np[lvl][0].astype(np.float64), props[sel],
            1.0 / STRIDES[lvl], cfg.roi_align_output, 2,
        )
    sd = head.state_dict()

    def lin(x, name):
        W = sd[f"{name}.weight"].numpy().astype(np.float64)
        b = sd[f"{name}.bias"].numpy().astype(np.float64)
        return x @ W.T + b

    # fc6 consumes torch's flattened (C, H, W) order
    x = feats.transpose(0, 3, 1, 2).reshape(len(props), -1)
    x = np.maximum(lin(x, "fc6"), 0)
    x = np.maximum(lin(x, "fc7"), 0)
    cls = lin(x, "cls_score")
    reg = lin(x, "bbox_pred").reshape(len(props), cfg.num_classes, 4)
    probs = np.exp(cls - cls.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)

    all_boxes, all_scores, all_labels = [], [], []
    for c in range(1, cfg.num_classes):
        bc = np_clip(np_decode(props, reg[:, c], Detector.BOX_WEIGHTS), hw)
        sc = probs[:, c]
        ok = (
            (sc > cfg.box_score_thresh)
            & ((bc[:, 2] - bc[:, 0]) > 1e-2)
            & ((bc[:, 3] - bc[:, 1]) > 1e-2)
        )
        all_boxes.append(bc[ok])
        all_scores.append(sc[ok])
        all_labels.append(np.full(ok.sum(), c))
    boxes = np.concatenate(all_boxes)
    scores = np.concatenate(all_scores)
    labels = np.concatenate(all_labels)
    off = labels * (max(hw) + 2.0)
    keep = nms_indices_np(boxes + off[:, None], scores, cfg.box_nms_thresh)
    keep = keep[: cfg.max_detections]
    return boxes[keep], scores[keep], labels[keep]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cfg():
    return DetectorConfig(
        num_classes=3,
        max_detections=25,
        rpn_pre_nms_top_n=200,
        rpn_post_nms_top_n=64,
        anchor_sizes=(16, 32, 64, 128, 256),
    )


@pytest.fixture(scope="module")
def ported(cfg):
    body, fpn, rpn, head, sd = build_torch_detector(cfg, seed=0)
    variables = detector_variables_from_torchvision(sd)
    det = Detector(cfg, backbone="resnet50", backbone_width=WIDTH)
    torch.manual_seed(1)
    img = torch.rand(1, 3, 128, 128)
    return det, variables, (body, fpn, rpn, head), img


def test_trunk_forward_parity(ported):
    det, variables, (body, fpn, rpn, head), img = ported
    pyr_np, rpn_np = torch_trunk_forward(body, fpn, rpn, img)
    got_pyr, got_rpn = det.trunk.apply(
        variables["trunk"], jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        train=False,
    )
    for l in LEVELS:
        np.testing.assert_allclose(
            np.asarray(got_pyr[l]), pyr_np[l], atol=2e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got_rpn[l][0]), rpn_np[l][0], atol=2e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got_rpn[l][1]), rpn_np[l][1], atol=2e-4, rtol=1e-4,
        )


def test_proposal_selection_parity(cfg):
    """Identical RPN outputs through both proposal selectors."""
    det = Detector(cfg, backbone="small")
    rng = np.random.default_rng(0)
    hw = (128, 128)
    feat_shapes = {l: (hw[0] // STRIDES[l], hw[1] // STRIDES[l]) for l in LEVELS}
    anchors = generate_anchors(feat_shapes, cfg.anchor_sizes, cfg.anchor_ratios)
    anchors_np = {l: np.asarray(anchors[l], np.float64) for l in LEVELS}
    a_count = len(cfg.anchor_ratios)
    rpn_np = {}
    rpn_jnp = {}
    for l in LEVELS:
        h, w = feat_shapes[l]
        logits = rng.normal(size=(1, h, w, a_count)).astype(np.float32)
        deltas = (rng.normal(size=(1, h, w, a_count * 4)) * 0.4).astype(np.float32)
        rpn_np[l] = (logits, deltas)
        rpn_jnp[l] = (jnp.asarray(logits), jnp.asarray(deltas))

    props, valid = det._proposals_single(rpn_jnp, anchors, hw, False)
    got = np.asarray(props)[np.asarray(valid)]

    want_boxes, _ = tv_filter_proposals(rpn_np, anchors_np, hw, cfg)
    assert len(got) == len(want_boxes)
    np.testing.assert_allclose(got, want_boxes, atol=1e-3)


def test_detect_end_to_end_parity(ported, cfg):
    """Ported weights, same image: jax detect() == torch trunk + numpy
    torchvision-pipeline oracle."""
    det, variables, (body, fpn, rpn, head), img = ported
    hw = (128, 128)

    # oracle: torch trunk -> numpy proposals -> numpy roi pipeline
    pyr_np, rpn_np = torch_trunk_forward(body, fpn, rpn, img)
    feat_shapes = {l: pyr_np[l].shape[1:3] for l in LEVELS}
    anchors = generate_anchors(feat_shapes, cfg.anchor_sizes, cfg.anchor_ratios)
    anchors_np = {l: np.asarray(anchors[l], np.float64) for l in LEVELS}
    props, _ = tv_filter_proposals(rpn_np, anchors_np, hw, cfg)
    want_boxes, want_scores, want_labels = tv_roi_pipeline(
        pyr_np, props, head, hw, cfg
    )

    out = det.detect(
        variables, jnp.asarray(img.numpy().transpose(0, 2, 3, 1))
    )
    valid = np.asarray(out["valid"][0])
    got_boxes = np.asarray(out["boxes"][0])[valid]
    got_scores = np.asarray(out["scores"][0])[valid]
    got_labels = np.asarray(out["labels"][0])[valid]

    assert len(got_boxes) == len(want_boxes)
    np.testing.assert_array_equal(got_labels, want_labels)
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-3)
    np.testing.assert_allclose(got_boxes, want_boxes, atol=0.1)
