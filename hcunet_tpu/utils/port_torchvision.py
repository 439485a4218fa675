"""Port torchvision ``fasterrcnn_resnet50_fpn`` checkpoints into the JAX
detector.

The reference's detection weights are plain torchvision state_dicts
(``hcat/rcnn.py:14-20``, ``train_rcnn.py:18,70``).  This maps them onto
:class:`hcunet_tpu.models.detection.Detector` variables:

    backbone.body.*        -> trunk.body (ResNet)
    backbone.fpn.*         -> trunk.fpn
    rpn.head.*             -> trunk.rpn_head
    roi_heads.box_head.*   -> head.box_head (fc6/fc7)
    roi_heads.box_predictor.* -> head.box_head (cls_score/bbox_pred)

Layout notes: conv weights transpose like ``port_torch``; Linear weights
transpose [out,in] -> [in,out]; fc6 additionally permutes its input from
torch's flattened (C, 7, 7) order to our channels-last (7, 7, C).

torchvision is not installed in this build environment, so the ResNet-body
mapping is validated against an in-test torch re-implementation using
torchvision's exact module names (``tests/test_port_torchvision.py``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from hcunet_tpu.utils.port_torch import _np, conv_weight_to_jax

RESNET50_STAGES = (3, 4, 6, 3)


def _bn(sd: Mapping, prefix: str):
    return (
        {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])},
        {
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"]),
        },
    )


def resnet50_variables_from_torchvision(
    sd: Mapping, prefix: str = ""
) -> Dict:
    """Map torchvision resnet50 names (optionally under ``prefix`` such as
    ``backbone.body.``) to :class:`hcunet_tpu.models.resnet.ResNet`."""
    p = prefix
    params: Dict = {}
    stats: Dict = {}
    params["stem_conv"] = {"kernel": conv_weight_to_jax(sd[f"{p}conv1.weight"])}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, f"{p}bn1")
    for stage, n_blocks in enumerate(RESNET50_STAGES):
        for b in range(n_blocks):
            t = f"{p}layer{stage + 1}.{b}"
            name = f"stage{stage + 2}_block{b}"
            bp: Dict = {}
            bs: Dict = {}
            for ci in range(3):
                bp[f"Conv_{ci}"] = {
                    "kernel": conv_weight_to_jax(sd[f"{t}.conv{ci + 1}.weight"])
                }
                bnp, bns = _bn(sd, f"{t}.bn{ci + 1}")
                bp[f"BatchNorm_{ci}"] = bnp
                bs[f"BatchNorm_{ci}"] = bns
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": conv_weight_to_jax(sd[f"{t}.downsample.0.weight"])
                }
                dnp, dns = _bn(sd, f"{t}.downsample.1")
                bp["downsample_bn"] = dnp
                bs["downsample_bn"] = dns
            params[name] = bp
            stats[name] = bs
    return {"params": params, "batch_stats": stats}


def _linear(sd: Mapping, prefix: str) -> Dict:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _linear_from_chw(sd: Mapping, prefix: str, c: int, h: int, w: int) -> Dict:
    """Linear over a flattened feature map: reorder torch's (C,H,W) input
    layout to channels-last (H,W,C)."""
    wmat = _np(sd[f"{prefix}.weight"])  # [out, C*H*W]
    out = wmat.shape[0]
    wmat = wmat.reshape(out, c, h, w).transpose(0, 2, 3, 1).reshape(out, h * w * c)
    return {"kernel": wmat.T, "bias": _np(sd[f"{prefix}.bias"])}


def detector_variables_from_torchvision(
    sd: Mapping, roi_align_output: int = 7, fpn_channels: int = 256
) -> Dict:
    """Full fasterrcnn_resnet50_fpn state_dict -> Detector variables."""
    body = resnet50_variables_from_torchvision(sd, "backbone.body.")

    fpn_p: Dict = {}
    for i, lvl in enumerate(("c2", "c3", "c4", "c5")):
        fpn_p[f"lateral_{lvl}"] = {
            "kernel": conv_weight_to_jax(sd[f"backbone.fpn.inner_blocks.{i}.0.weight"]),
            "bias": _np(sd[f"backbone.fpn.inner_blocks.{i}.0.bias"]),
        }
    for i, lvl in enumerate(("p2", "p3", "p4", "p5")):
        fpn_p[f"output_{lvl}"] = {
            "kernel": conv_weight_to_jax(sd[f"backbone.fpn.layer_blocks.{i}.0.weight"]),
            "bias": _np(sd[f"backbone.fpn.layer_blocks.{i}.0.bias"]),
        }

    rpn_p = {
        "conv": {
            "kernel": conv_weight_to_jax(sd["rpn.head.conv.0.0.weight"])
            if "rpn.head.conv.0.0.weight" in sd
            else conv_weight_to_jax(sd["rpn.head.conv.weight"]),
            "bias": _np(
                sd.get("rpn.head.conv.0.0.bias", sd.get("rpn.head.conv.bias"))
            ),
        },
        "cls_logits": {
            "kernel": conv_weight_to_jax(sd["rpn.head.cls_logits.weight"]),
            "bias": _np(sd["rpn.head.cls_logits.bias"]),
        },
        "bbox_pred": {
            "kernel": conv_weight_to_jax(sd["rpn.head.bbox_pred.weight"]),
            "bias": _np(sd["rpn.head.bbox_pred.bias"]),
        },
    }

    k = roi_align_output
    head_p = {
        "fc6": _linear_from_chw(sd, "roi_heads.box_head.fc6", fpn_channels, k, k),
        "fc7": _linear(sd, "roi_heads.box_head.fc7"),
        "cls_score": _linear(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": _linear(sd, "roi_heads.box_predictor.bbox_pred"),
    }

    return {
        "trunk": {
            "params": {
                "body": body["params"],
                "fpn": fpn_p,
                "rpn_head": rpn_p,
            },
            "batch_stats": {"body": body["batch_stats"]},
        },
        "head": {"params": {"box_head": head_p}},
    }
