"""Faster R-CNN style detector — XLA-native, static shapes throughout.

Replaces torchvision's ``fasterrcnn_resnet50_fpn`` (``hcat/rcnn.py:7-21``)
with the same external contract:

* ``detect(variables, images)`` → per-image ``{'boxes' [K,4], 'labels' [K],
  'scores' [K], 'valid' [K]}`` — consumed by the tiled detection driver the
  way ``hcat/segment.py:192-199`` consumes torchvision outputs (K is the
  static ``max_detections``; ``valid`` masks real rows);
* ``losses(variables, images, targets)`` → dict with torchvision's keys
  ``loss_objectness / loss_rpn_box_reg / loss_classifier / loss_box_reg``,
  summed by the trainer with the classifier scale exactly like
  ``train_fastercnn_func.py:33-43``.

Static-shape adaptations (SURVEY.md §7 hard part (d)):
* proposals / detections are fixed-size arrays with validity masks —
  bucketed padding instead of dynamic tensors;
* anchor/proposal *sampling* is replaced by masked loss normalization over
  all matched anchors (deterministic, no dynamic subset shapes);
* inputs are fixed-size tiles (the tiling engine guarantees this), so the
  dynamic min/max-size resize of torchvision's RCNNTransform is unnecessary.

Boxes follow torchvision's convention ``(x1, y1, x2, y2)`` with x = width
axis (array dim 1 of ``[H, W, C]`` images).  The tiled driver converts to
the volume's array axes at the boundary.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hcunet_tpu.config import DetectorConfig
from hcunet_tpu.models.fpn import FPN
from hcunet_tpu.models.resnet import ResNet, SmallBackbone
from hcunet_tpu.ops.nms import box_iou, nms_mask
from hcunet_tpu.ops.roi_align import roi_align

LEVELS = ("p2", "p3", "p4", "p5", "p6")
STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}


# ---------------------------------------------------------------------------
# anchors + box coding
# ---------------------------------------------------------------------------


def generate_anchors(
    feat_shapes: Dict[str, Tuple[int, int]],
    sizes: Sequence[int],
    ratios: Sequence[float],
) -> Dict[str, jnp.ndarray]:
    """Per-level anchor boxes [H*W*A, 4] in input coords."""
    out = {}
    for lvl, size in zip(LEVELS, sizes):
        h, w = feat_shapes[lvl]
        stride = STRIDES[lvl]
        base = []
        for r in ratios:
            area = float(size) ** 2
            aw = (area / r) ** 0.5
            ah = aw * r
            base.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
        base = jnp.asarray(base)  # [A, 4]
        ys = (jnp.arange(h) + 0.0) * stride
        xs = (jnp.arange(w) + 0.0) * stride
        cx, cy = jnp.meshgrid(xs, ys, indexing="xy")
        centers = jnp.stack(
            [cx.ravel(), cy.ravel(), cx.ravel(), cy.ravel()], axis=1
        )  # [H*W, 4]
        anchors = centers[:, None, :] + base[None, :, :]
        out[lvl] = anchors.reshape(-1, 4)
    return out


def encode_boxes(ref: jnp.ndarray, gt: jnp.ndarray, weights) -> jnp.ndarray:
    """torchvision BoxCoder.encode: deltas taking ``ref`` to ``gt``."""
    wx, wy, ww, wh = weights
    rw = ref[:, 2] - ref[:, 0]
    rh = ref[:, 3] - ref[:, 1]
    rx = ref[:, 0] + 0.5 * rw
    ry = ref[:, 1] + 0.5 * rh
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
    gx = gt[:, 0] + 0.5 * gw
    gy = gt[:, 1] + 0.5 * gh
    rw = jnp.maximum(rw, 1e-4)
    rh = jnp.maximum(rh, 1e-4)
    return jnp.stack(
        [
            wx * (gx - rx) / rw,
            wy * (gy - ry) / rh,
            ww * jnp.log(jnp.maximum(gw, 1e-4) / rw),
            wh * jnp.log(jnp.maximum(gh, 1e-4) / rh),
        ],
        axis=1,
    )


def decode_boxes(ref: jnp.ndarray, deltas: jnp.ndarray, weights) -> jnp.ndarray:
    wx, wy, ww, wh = weights
    rw = ref[:, 2] - ref[:, 0]
    rh = ref[:, 3] - ref[:, 1]
    rx = ref[:, 0] + 0.5 * rw
    ry = ref[:, 1] + 0.5 * rh
    dx, dy, dw, dh = deltas[:, 0] / wx, deltas[:, 1] / wy, deltas[:, 2] / ww, deltas[:, 3] / wh
    dw = jnp.clip(dw, -10.0, 4.135)  # torchvision clamps to log(1000/16)
    dh = jnp.clip(dh, -10.0, 4.135)
    cx = dx * rw + rx
    cy = dy * rh + ry
    w = jnp.exp(dw) * rw
    h = jnp.exp(dh) * rh
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=1
    )


def clip_boxes(boxes: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = hw
    return jnp.stack(
        [
            jnp.clip(boxes[:, 0], 0, w),
            jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w),
            jnp.clip(boxes[:, 3], 0, h),
        ],
        axis=1,
    )


def smooth_l1(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax**2 / beta, ax - 0.5 * beta)


# ---------------------------------------------------------------------------
# network modules
# ---------------------------------------------------------------------------


class RPNHead(nn.Module):
    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        t = nn.relu(
            nn.Conv(feat.shape[-1], (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv")(feat)
        )
        logits = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                         name="cls_logits")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                         name="bbox_pred")(t)
        return logits, deltas


class BoxHead(nn.Module):
    num_classes: int
    representation: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois):  # [N, 7, 7, C]
        x = rois.reshape(rois.shape[0], -1)
        x = nn.relu(nn.Dense(self.representation, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation, dtype=self.dtype, name="fc7")(x))
        cls = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return cls, reg


class FasterRCNN(nn.Module):
    """Backbone + FPN + RPN + RoI heads, returning raw per-level outputs.

    The functional pipeline around it (proposals, losses, postprocess)
    lives in :class:`Detector` — keeping the module pure makes the
    proposal machinery jit-composable without flax state plumbing.
    """

    config: DetectorConfig
    backbone: str = "resnet50"
    dtype: Any = jnp.float32
    backbone_width: int = 64  # 64 = real resnet50; smaller for tests

    @nn.compact
    def __call__(self, images, train: bool = False):
        if self.backbone == "resnet50":
            feats = ResNet(width=self.backbone_width, dtype=self.dtype,
                           name="body")(images, train)
        elif self.backbone == "small":
            feats = SmallBackbone(dtype=self.dtype, name="body")(images, train)
        else:
            raise ValueError(f"unknown backbone {self.backbone}")
        pyramid = FPN(dtype=self.dtype, name="fpn")(feats)
        num_anchors = len(self.config.anchor_ratios)
        rpn = RPNHead(num_anchors, dtype=self.dtype, name="rpn_head")
        rpn_out = {lvl: rpn(pyramid[lvl]) for lvl in LEVELS}
        return pyramid, rpn_out


class RoIClassifier(nn.Module):
    config: DetectorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        return BoxHead(self.config.num_classes, dtype=self.dtype,
                       name="box_head")(roi_feats)


# ---------------------------------------------------------------------------
# the detector driver (functional)
# ---------------------------------------------------------------------------


class Detector:
    """Bundles the flax modules with the proposal/postprocessing pipeline."""

    RPN_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    BOX_WEIGHTS = (10.0, 10.0, 5.0, 5.0)

    def __init__(self, config: DetectorConfig = DetectorConfig(),
                 backbone: str = "resnet50", dtype=jnp.float32,
                 backbone_width: int = 64):
        self.config = config
        self.trunk = FasterRCNN(config, backbone, dtype, backbone_width)
        self.head = RoIClassifier(config, dtype)
        self.dtype = dtype

    # -- init ---------------------------------------------------------------

    def init(self, key, image_hw: Tuple[int, int]) -> Dict:
        k1, k2 = jax.random.split(key)
        img = jnp.zeros((1, *image_hw, 3), self.dtype)
        trunk_vars = self.trunk.init(k1, img, train=False)
        roi = jnp.zeros((2, self.config.roi_align_output,
                         self.config.roi_align_output, 256), self.dtype)
        head_vars = self.head.init(k2, roi)
        return {"trunk": trunk_vars, "head": head_vars}

    # -- proposals ----------------------------------------------------------

    def _proposals_single(self, rpn_out, anchors, hw, train):
        cfg = self.config
        all_boxes, all_scores = [], []
        for lvl in LEVELS:
            logits, deltas = rpn_out[lvl]
            scores = logits[0].reshape(-1)
            deltas = deltas[0].reshape(-1, 4)
            a = anchors[lvl]
            k = min(cfg.rpn_pre_nms_top_n, scores.shape[0])
            top_scores, idx = jax.lax.top_k(scores, k)
            boxes = decode_boxes(a[idx], deltas[idx], self.RPN_WEIGHTS)
            boxes = clip_boxes(boxes, hw)
            # NMS within the level (torchvision runs batched_nms with the
            # level as the batch id — cross-level suppression would eat
            # small-object proposals under large ones)
            wh_ok = (
                (boxes[:, 2] > boxes[:, 0] + 1e-3)
                & (boxes[:, 3] > boxes[:, 1] + 1e-3)
            )
            lvl_scores = jnp.where(wh_ok, top_scores, -jnp.inf)
            keep = nms_mask(boxes, lvl_scores, cfg.rpn_nms_thresh)
            all_boxes.append(boxes)
            all_scores.append(jnp.where(keep, lvl_scores, -jnp.inf))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        n_prop = cfg.rpn_post_nms_top_n
        top, idx = jax.lax.top_k(scores, min(n_prop, scores.shape[0]))
        props = boxes[idx]
        valid = jnp.isfinite(top)
        return props, valid

    # -- RoI features (FPN level assignment) --------------------------------

    def _roi_features(self, pyramid, boxes):
        cfg = self.config
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        area = jnp.maximum(w * h, 1e-6)
        k = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224.0))
        k = jnp.clip(k, 2, 5).astype(jnp.int32)  # p2..p5
        feats = 0.0
        for lvl in ("p2", "p3", "p4", "p5"):
            lvl_i = int(lvl[1])
            aligned = roi_align(
                pyramid[lvl][0], boxes, 1.0 / STRIDES[lvl],
                cfg.roi_align_output, 2,
            )
            feats = feats + jnp.where(
                (k == lvl_i)[:, None, None, None], aligned, 0.0
            )
        return feats

    # -- inference ----------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def detect(self, variables: Dict, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """``images``: [B, H, W, 3].  Returns dict of [B, K, ...] arrays."""
        cfg = self.config
        hw = images.shape[1:3]

        def one(img):
            pyramid, rpn_out = self.trunk.apply(
                variables["trunk"], img[None], train=False
            )
            feat_shapes = {l: pyramid[l].shape[1:3] for l in LEVELS}
            anchors = generate_anchors(
                feat_shapes, cfg.anchor_sizes, cfg.anchor_ratios
            )
            props, pvalid = self._proposals_single(rpn_out, anchors, hw, False)
            roi_feats = self._roi_features(pyramid, props)
            cls_logits, reg = self.head.apply(variables["head"], roi_feats)
            probs = jax.nn.softmax(cls_logits, axis=-1)

            # per-class decode + NMS via class-offset trick
            n_prop = props.shape[0]
            n_cls = cfg.num_classes
            reg = reg.reshape(n_prop, n_cls, 4)
            boxes_c = jax.vmap(
                lambda c: clip_boxes(
                    decode_boxes(props, reg[:, c], self.BOX_WEIGHTS), hw
                )
            )(jnp.arange(n_cls))  # [C, N, 4]
            scores_c = probs.T  # [C, N]
            # drop background class 0
            boxes_f = boxes_c[1:].reshape(-1, 4)
            scores_f = scores_c[1:].reshape(-1)
            labels_f = jnp.repeat(jnp.arange(1, n_cls), n_prop)
            valid_f = (
                jnp.tile(pvalid, n_cls - 1)
                & (scores_f > cfg.box_score_thresh)
                & (boxes_f[:, 2] > boxes_f[:, 0] + 1e-2)
                & (boxes_f[:, 3] > boxes_f[:, 1] + 1e-2)
            )
            # class-offset so one NMS call separates classes
            offset = labels_f.astype(jnp.float32)[:, None] * (max(hw) + 2.0)
            keep = nms_mask(
                boxes_f + offset, jnp.where(valid_f, scores_f, -jnp.inf),
                cfg.box_nms_thresh,
            )
            final_scores = jnp.where(keep & valid_f, scores_f, -jnp.inf)
            k = min(cfg.max_detections, final_scores.shape[0])
            top, idx = jax.lax.top_k(final_scores, k)
            return {
                "boxes": boxes_f[idx],
                "scores": jnp.where(jnp.isfinite(top), top, 0.0),
                "labels": jnp.where(jnp.isfinite(top), labels_f[idx], 0),
                "valid": jnp.isfinite(top),
            }

        return jax.vmap(one)(images)

    # -- training -----------------------------------------------------------

    def losses(
        self,
        variables: Dict,
        images: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_labels: jnp.ndarray,
        gt_valid: jnp.ndarray,
        train: bool = True,
    ):
        """Single-image (B=1) loss dict.  ``gt_*`` padded to a static max.

        Returns (losses dict, new_batch_stats_pair).
        """
        cfg = self.config
        hw = images.shape[1:3]

        mutable = ["batch_stats"] if train else []
        out = self.trunk.apply(
            variables["trunk"], images, train=train,
            mutable=mutable if mutable else False,
        )
        if mutable:
            (pyramid, rpn_out), trunk_updates = out
        else:
            pyramid, rpn_out = out
            trunk_updates = {}

        feat_shapes = {l: pyramid[l].shape[1:3] for l in LEVELS}
        anchors_d = generate_anchors(feat_shapes, cfg.anchor_sizes, cfg.anchor_ratios)
        anchors = jnp.concatenate([anchors_d[l] for l in LEVELS])
        obj_logits = jnp.concatenate(
            [rpn_out[l][0][0].reshape(-1) for l in LEVELS]
        )
        rpn_deltas = jnp.concatenate(
            [rpn_out[l][1][0].reshape(-1, 4) for l in LEVELS]
        )

        # --- RPN targets ---
        iou = box_iou(anchors, gt_boxes)  # [A, G]
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        pos = best_iou >= 0.7
        # every valid GT's best anchor is positive too; use a max-scatter so
        # a padded GT slot (argmaxing to anchor 0) can't clobber a True
        # written for a real GT sharing that index.
        best_anchor_per_gt = jnp.argmax(iou, axis=0)  # [G]
        force_pos = jnp.zeros(anchors.shape[0], bool)
        force_pos = force_pos.at[best_anchor_per_gt].max(gt_valid)
        pos = pos | force_pos
        neg = (best_iou < 0.3) & ~pos
        matched_gt = gt_boxes[best_gt]

        obj_target = pos.astype(jnp.float32)
        obj_weight = (pos | neg).astype(jnp.float32)
        bce = (
            jnp.maximum(obj_logits, 0)
            - obj_logits * obj_target
            + jnp.log1p(jnp.exp(-jnp.abs(obj_logits)))
        )
        n_sampled = jnp.maximum(obj_weight.sum(), 1.0)
        loss_objectness = (bce * obj_weight).sum() / n_sampled

        rpn_reg_target = encode_boxes(anchors, matched_gt, self.RPN_WEIGHTS)
        loss_rpn_box = (
            smooth_l1(rpn_deltas - rpn_reg_target, 1.0 / 9.0).sum(axis=1)
            * pos.astype(jnp.float32)
        ).sum() / n_sampled

        # --- proposals for the head (plus GT boxes, standard trick) ---
        props, pvalid = self._proposals_single(rpn_out, anchors_d, hw, True)
        props = jnp.concatenate([props, gt_boxes])
        pvalid = jnp.concatenate([pvalid, gt_valid])
        props = jax.lax.stop_gradient(props)

        piou = box_iou(props, gt_boxes)
        piou = jnp.where(gt_valid[None, :] & pvalid[:, None], piou, -1.0)
        p_best_gt = jnp.argmax(piou, axis=1)
        p_best_iou = jnp.max(piou, axis=1)
        p_pos = p_best_iou >= 0.5
        p_neg = (p_best_iou < 0.5) & (p_best_iou >= 0.0) & pvalid
        cls_target = jnp.where(p_pos, gt_labels[p_best_gt], 0)

        roi_feats = self._roi_features(pyramid, props)
        cls_logits, reg = self.head.apply(variables["head"], roi_feats)
        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, cls_target[:, None], axis=1)[:, 0]
        cls_weight = (p_pos | p_neg).astype(jnp.float32)
        n_roi = jnp.maximum(cls_weight.sum(), 1.0)
        loss_classifier = (ce * cls_weight).sum() / n_roi

        reg = reg.reshape(props.shape[0], cfg.num_classes, 4)
        reg_sel = jnp.take_along_axis(
            reg, cls_target[:, None, None].repeat(4, axis=2), axis=1
        )[:, 0]
        head_reg_target = encode_boxes(props, gt_boxes[p_best_gt], self.BOX_WEIGHTS)
        loss_box_reg = (
            smooth_l1(reg_sel - head_reg_target, 1.0).sum(axis=1)
            * p_pos.astype(jnp.float32)
        ).sum() / n_roi

        losses = {
            "loss_objectness": loss_objectness,
            "loss_rpn_box_reg": loss_rpn_box,
            "loss_classifier": loss_classifier,
            "loss_box_reg": loss_box_reg,
        }
        return losses, trunk_updates
