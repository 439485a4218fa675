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


def _roi_align_oracle(feat, boxes, spatial_scale, output_size, sampling_ratio):
    """Numpy transliteration of torchvision's roi_align CPU kernel
    (aligned=False, average pooling) — the oracle the XLA op must match."""
    H, W, C = feat.shape
    N = len(boxes)
    out = np.zeros((N, output_size, output_size, C), np.float64)

    def bilin(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_lo, x_lo = int(y), int(x)
        if y_lo >= H - 1:
            y_hi = y_lo = H - 1
            y = float(y_lo)
        else:
            y_hi = y_lo + 1
        if x_lo >= W - 1:
            x_hi = x_lo = W - 1
            x = float(x_lo)
        else:
            x_hi = x_lo + 1
        ly, lx = y - y_lo, x - x_lo
        hy, hx = 1.0 - ly, 1.0 - lx
        return (
            feat[y_lo, x_lo] * hy * hx
            + feat[y_lo, x_hi] * hy * lx
            + feat[y_hi, x_lo] * ly * hx
            + feat[y_hi, x_hi] * ly * lx
        )

    for n, (bx1, by1, bx2, by2) in enumerate(boxes * spatial_scale):
        roi_w = max(bx2 - bx1, 1.0)
        roi_h = max(by2 - by1, 1.0)
        bin_w = roi_w / output_size
        bin_h = roi_h / output_size
        s = sampling_ratio
        for ph in range(output_size):
            for pw in range(output_size):
                acc = np.zeros(C)
                for iy in range(s):
                    y = by1 + ph * bin_h + (iy + 0.5) * bin_h / s
                    for ix in range(s):
                        x = bx1 + pw * bin_w + (ix + 0.5) * bin_w / s
                        acc += bilin(y, x)
                out[n, ph, pw] = acc / (s * s)
    return out


def test_roi_align_matches_torchvision_semantics(rng):
    """Exact parity with torchvision's RoIAlign CPU kernel semantics
    (transliterated above), incl. edge-crossing and degenerate boxes."""
    from hcunet_tpu.ops.roi_align import roi_align

    feat = rng.standard_normal((24, 20, 5)).astype(np.float32)
    boxes = np.asarray(
        [
            [2.5, 3.25, 15.0, 20.0],   # ordinary
            [-4.0, -2.0, 6.0, 7.5],    # crosses top-left edge
            [12.0, 18.0, 30.0, 30.0],  # crosses bottom-right edge
            [5.0, 5.0, 5.0, 5.0],      # degenerate (w=h=0 → clamped to 1)
            [0.0, 0.0, 19.0, 23.0],    # full image
        ],
        np.float32,
    )
    for scale, osize, sratio in [(1.0, 7, 2), (0.5, 5, 2), (0.25, 3, 4)]:
        got = np.asarray(
            roi_align(
                jnp.asarray(feat),
                jnp.asarray(boxes),
                scale,
                output_size=osize,
                sampling_ratio=sratio,
            )
        )
        want = _roi_align_oracle(feat, boxes, scale, osize, sratio)
        np.testing.assert_allclose(got, want, atol=2e-4)


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
