"""Op-level tests: NMS vs torchvision semantics, EDT vs scipy, filters vs
scipy, native watershed behavior, peak finding."""

import numpy as np
import pytest
from scipy import ndimage as ndi


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------


def _torch_nms(boxes, scores, thr):
    """Greedy NMS oracle in plain numpy (same algorithm torchvision uses)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            # IoU
            x1 = max(boxes[i, 0], boxes[j, 0])
            y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2])
            y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter) > thr and scores[j] <= scores[i]:
                suppressed[j] = True
    return np.array(keep)


def test_nms_matches_greedy_oracle(rng):
    from hcunet_tpu.ops.nms import nms_indices

    n = 60
    centers = rng.random((n, 2)) * 100
    wh = rng.random((n, 2)) * 20 + 5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1).astype(
        np.float32
    )
    scores = rng.random(n).astype(np.float32)
    got = nms_indices(boxes, scores, 0.3)
    want = _torch_nms(boxes, scores, 0.3)
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_nms_mask_with_padding(rng):
    import jax.numpy as jnp

    from hcunet_tpu.ops.nms import nms_mask

    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 0, 0]],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.0], np.float32)
    valid = np.array([True, True, True, False])
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid)))
    assert keep.tolist() == [True, False, True, False]


# ---------------------------------------------------------------------------
# EDT
# ---------------------------------------------------------------------------


def test_edt_matches_scipy(rng):
    from hcunet_tpu.ops.distance import edt

    binary = (rng.random((40, 37)) > 0.7).astype(np.float32)
    binary[0, 0] = 0  # ensure a background pixel exists
    got = np.asarray(edt(binary, block=16))
    want = ndi.distance_transform_edt(binary != 0)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_edt_3d_axes_subset(rng):
    from hcunet_tpu.ops.distance import edt, edt_per_slice_host

    vol = (rng.random((20, 22, 4)) > 0.6).astype(np.float32)
    vol[0, 0, :] = 0
    got = np.asarray(edt(vol, axes=(0, 1), block=8))
    want = edt_per_slice_host(vol)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_chamfer_close_to_exact(rng):
    from hcunet_tpu.ops.distance import chamfer_edt_host

    binary = np.ones((30, 30), np.uint8)
    binary[15, 15] = 0
    d = chamfer_edt_host(binary)
    exact = ndi.distance_transform_edt(binary)
    assert np.abs(d - exact).max() / exact.max() < 0.05


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------


def test_gaussian_blur_matches_scipy(rng):
    from hcunet_tpu.ops.filters import gaussian_blur

    x = rng.random((30, 28)).astype(np.float32)
    got = np.asarray(gaussian_blur(x, sigma=3.0, mode="edge"))
    want = ndi.gaussian_filter(x, sigma=3.0, mode="nearest", truncate=4.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_maximum_filter_matches_scipy(rng):
    from hcunet_tpu.ops.filters import maximum_filter

    x = rng.random((17, 19)).astype(np.float32)
    got = np.asarray(maximum_filter(x, size=2))
    want = ndi.maximum_filter(x, size=2, mode="constant")
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_binary_dilation_n_equals_iterated(rng):
    from hcunet_tpu.ops.filters import binary_dilation, binary_dilation_n

    x = np.zeros((20, 20), np.float32)
    x[10, 10] = 1
    it = x > 0
    for _ in range(4):
        it = np.asarray(binary_dilation(it.astype(np.float32)))
    once = np.asarray(binary_dilation_n(x, 4))
    np.testing.assert_array_equal(it, once)


# ---------------------------------------------------------------------------
# watershed (native)
# ---------------------------------------------------------------------------


def test_watershed_two_seeds_split():
    from hcunet_tpu.ops.watershed import watershed

    # two basins separated by a ridge
    x = np.zeros((20, 20), np.float64)
    x[:, 10] = 10.0  # ridge
    markers = np.zeros((20, 20), np.int32)
    markers[10, 3] = 2
    markers[10, 16] = 3
    labels = watershed(x, markers, connectivity=1)
    assert set(np.unique(labels)) == {2, 3}
    assert (labels[:, :10] == 2).all()
    assert (labels[:, 11:] == 3).all()


def test_watershed_line_and_mask():
    from hcunet_tpu.ops.watershed import watershed

    x = np.zeros((21, 21), np.float64)
    markers = np.zeros((21, 21), np.int32)
    markers[10, 4] = 1
    markers[10, 16] = 2
    mask = np.ones((21, 21), bool)
    mask[0, :] = False
    labels = watershed(x, markers, mask=mask, watershed_line=True)
    assert (labels[0, :] == 0).all()  # outside mask untouched
    # a dividing line of zeros exists between the two regions
    assert (labels == 0).sum() > 21
    assert {1, 2} <= set(np.unique(labels))
    # regions don't touch: every 1-pixel has no 2-neighbor
    ones = labels == 1
    twos = labels == 2
    grown = ndi.binary_dilation(ones)
    assert not (grown & twos).any()


def test_watershed_compactness_rounder_regions():
    from hcunet_tpu.ops.watershed import watershed

    # flat image: compact watershed should split by distance to seeds
    x = np.zeros((30, 30), np.float64)
    markers = np.zeros((30, 30), np.int32)
    markers[15, 5] = 1
    markers[15, 25] = 2
    labels = watershed(x, markers, compactness=0.1)
    # boundary approximately equidistant
    frac = (labels == 1).mean()
    assert 0.4 < frac < 0.6


def test_label_connected_components():
    from hcunet_tpu.ops.watershed import label

    x = np.zeros((10, 10), np.uint8)
    x[1:3, 1:3] = 1
    x[6:9, 6:9] = 1
    lab, n = label(x)
    assert n == 2
    assert len(np.unique(lab)) == 3


# ---------------------------------------------------------------------------
# peaks
# ---------------------------------------------------------------------------


def test_peak_local_max_basic():
    from hcunet_tpu.ops.peaks import peak_local_max

    x = np.zeros((20, 20))
    x[5, 5] = 2.0
    x[14, 14] = 3.0
    coords = peak_local_max(x, min_distance=1, num_peaks=100)
    assert coords.shape == (2, 2)
    assert coords[0].tolist() == [14, 14]  # intensity-sorted
    one = peak_local_max(x, min_distance=1, num_peaks=1)
    assert one.shape == (1, 2)


def test_edt_3d_per_slice_matches_host(rng):
    """The device EDT over axes (0, 1) == the host per-slice exact EDT —
    the contract the device instance backend relies on when it computes
    the binary-path distance transform on device (infer/instance.py).
    A hand-written Pallas variant of this pass was measured at 0.47–0.64×
    XLA and retired (scripts/probe_edt_device.py keeps it reproducible)."""
    from hcunet_tpu.ops.distance import edt, edt_per_slice_host

    vol = (rng.random((20, 22, 3)) > 0.6).astype(np.float32)
    vol[0, 0, :] = 0
    got = np.asarray(edt(vol, axes=(0, 1)))
    np.testing.assert_allclose(got, edt_per_slice_host(vol), atol=1e-3)


def test_watershed_jax_agrees_with_native_on_basins():
    """The bounded-iteration on-device watershed agrees with the exact
    native flood on a clear two-basin landscape."""
    from hcunet_tpu.ops.watershed import watershed
    from hcunet_tpu.ops.watershed_jax import watershed_jax

    x = np.zeros((24, 24, 1), np.float64)
    x[:, 11:13, :] = 5.0  # ridge
    markers = np.zeros((24, 24, 1), np.int32)
    markers[12, 3, 0] = 2
    markers[12, 20, 0] = 3
    exact = watershed(x, markers, connectivity=1)
    approx = np.asarray(watershed_jax(x, markers, iters=48))
    # off the ridge the assignments must agree
    off_ridge = x[..., 0] < 5
    agree = (exact[..., 0] == approx[..., 0]) | ~off_ridge
    assert agree.mean() > 0.99


def test_watershed_jax_mask_and_lines():
    from hcunet_tpu.ops.watershed_jax import watershed_jax

    x = np.zeros((20, 20, 1))
    markers = np.zeros((20, 20, 1), np.int32)
    markers[10, 3, 0] = 1
    markers[10, 16, 0] = 2
    mask = np.ones((20, 20, 1), bool)
    mask[0] = False
    lab = np.asarray(
        watershed_jax(x, markers, mask=mask, iters=40,
                      compactness=0.01, watershed_line=True)
    )
    assert (lab[0] == 0).all()
    assert {1, 2} <= set(np.unique(lab))
    # no 1-voxel touches a 2-voxel (line between them)
    ones = lab[..., 0] == 1
    twos = lab[..., 0] == 2
    from scipy import ndimage as ndi

    assert not (ndi.binary_dilation(ones) & twos).any()
