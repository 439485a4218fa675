"""Native watershed vs the pure-Python oracle (VERDICT r1 item 3).

``native/watershed.cpp`` and ``tests/watershed_oracle.py`` implement the
same documented algorithm independently (C++ priority queue vs python
heapq); these tests require bit-identical label volumes — including on
quantized images full of plateaus — across randomized scenes, both 2D and
3D, with and without mask/compactness/lines, covering the reference's
production configuration (connectivity=1, compactness=0.01,
watershed_line=True; ``hcat/segment.py:468-471``).
"""

import numpy as np
import pytest

from hcunet_tpu.ops.watershed import watershed

from watershed_oracle import watershed_oracle


def _blob_scene(rng, shape, n_blobs, quantize=False):
    """Smooth multi-basin height map + point markers inside basins."""
    img = np.zeros(shape, np.float64)
    coords = np.indices(shape).astype(np.float64)
    markers = np.zeros(shape, np.int32)
    for i in range(n_blobs):
        c = [rng.uniform(2, s - 2) for s in shape]
        d2 = sum((coords[k] - c[k]) ** 2 for k in range(len(shape)))
        img -= np.exp(-d2 / rng.uniform(8, 40))
        markers[tuple(int(np.clip(round(x), 0, s - 1)) for x, s in zip(c, shape))] = i + 1
    img += 0.01 * rng.standard_normal(shape)
    if quantize:
        img = np.round(img * 4) / 4  # coarse levels -> large plateaus
    return img, markers


@pytest.mark.parametrize("seed", range(10))
def test_watershed_matches_oracle_3d(seed):
    rng = np.random.default_rng(seed)
    shape = (18, 16, 6)
    img, markers = _blob_scene(rng, shape, n_blobs=3)
    mask = img < -0.05
    for conn, comp, wsl in [
        (1, 0.01, True),   # the reference's production config
        (1, 0.0, False),
        (2, 0.01, True),
        (3, 0.0, True),
    ]:
        got = watershed(
            img, markers, mask=mask, connectivity=conn,
            compactness=comp, watershed_line=wsl,
        )
        want = watershed_oracle(
            img, markers, mask=mask, connectivity=conn,
            compactness=comp, watershed_line=wsl,
        )
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(6))
def test_watershed_matches_oracle_2d(seed):
    rng = np.random.default_rng(100 + seed)
    shape = (28, 24)
    img, markers = _blob_scene(rng, shape, n_blobs=4)
    got = watershed(
        img, markers, connectivity=1, compactness=0.01, watershed_line=True
    )
    want = watershed_oracle(
        img, markers, connectivity=1, compactness=0.01, watershed_line=True
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(6))
def test_watershed_matches_oracle_on_plateaus(seed):
    """Quantized images are all plateaus — the hardest tie-break case; the
    documented deterministic semantics must still agree exactly."""
    rng = np.random.default_rng(200 + seed)
    shape = (16, 14, 5)
    img, markers = _blob_scene(rng, shape, n_blobs=3, quantize=True)
    mask = img < 0
    got = watershed(
        img, markers, mask=mask, connectivity=1,
        compactness=0.01, watershed_line=True,
    )
    want = watershed_oracle(
        img, markers, mask=mask, connectivity=1,
        compactness=0.01, watershed_line=True,
    )
    np.testing.assert_array_equal(got, want)


def test_watershed_adjacent_marker_slabs_line_parity():
    """A fully-marked flat volume: two touching slabs of different labels.
    The init-time no-op-marker filter (``native/watershed.cpp`` —
    ``marker_active``) skips interior markers but MUST keep every marker
    with a differently-labeled neighbor: those become watershed lines at
    pop time, exactly as the oracle decides them."""
    img = np.zeros((8, 8, 3), np.float64)  # one giant plateau
    markers = np.zeros((8, 8, 3), np.int32)
    markers[:4] = 1
    markers[4:] = 2
    got = watershed(
        img, markers, connectivity=1, compactness=0.0, watershed_line=True
    )
    want = watershed_oracle(
        img, markers, connectivity=1, compactness=0.0, watershed_line=True
    )
    np.testing.assert_array_equal(got, want)
    assert (got == 1).sum() > 0 and (got == 2).sum() > 0


def test_watershed_matches_oracle_pipeline_style():
    """The instance segmenter's exact call pattern: negated probability
    height map, background seed label 1, z-replicated volume
    (hcat/segment.py:444-471 semantics via infer/instance.py)."""
    rng = np.random.default_rng(7)
    prob = np.zeros((30, 30, 4), np.float64)
    coords = np.indices(prob.shape).astype(np.float64)
    for i, c in enumerate([(9, 9, 2), (20, 18, 2)]):
        d2 = sum((coords[k] - c[k]) ** 2 for k in range(3))
        prob = np.maximum(prob, np.exp(-d2 / 30))
    prob_e = np.repeat(prob, 5, axis=2)
    seeds = np.zeros(prob_e.shape, np.int32)
    seeds[prob_e < 0.15] = 1
    seeds[9, 9, 10] = 2
    seeds[20, 18, 10] = 3
    mask = prob_e > 0.05
    got = watershed(
        -prob_e, seeds, mask=mask, connectivity=1,
        compactness=0.01, watershed_line=True,
    )
    want = watershed_oracle(
        -prob_e, seeds, mask=mask, connectivity=1,
        compactness=0.01, watershed_line=True,
    )
    np.testing.assert_array_equal(got, want)
    # sanity: both cells exist and are separated
    assert (got == 2).sum() > 20 and (got == 3).sum() > 20


def test_watershed_unmasked_matches_oracle():
    rng = np.random.default_rng(42)
    img, markers = _blob_scene(rng, (20, 20, 4), n_blobs=2)
    got = watershed(img, markers, connectivity=1, compactness=0.0,
                    watershed_line=True)
    want = watershed_oracle(img, markers, connectivity=1, compactness=0.0,
                            watershed_line=True)
    np.testing.assert_array_equal(got, want)
    # with no mask every voxel is claimed by a region or a line
    assert ((got == 0) | (got == 1) | (got == 2)).all()


# ---------------------------------------------------------------------------
# Fused instance tile (native/watershed.cpp:instance_tile3d): virtual
# z-expansion + chamfer dilation + flood must be bit-identical to literally
# materializing the expanded volumes (the reference's hcat/segment.py:444-480
# procedure, here the "materialized" python path).
# ---------------------------------------------------------------------------


def _instance_scene(rng, shape, n_cells):
    X, Y, Z = shape
    xx, yy, zz = np.meshgrid(
        np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
    )
    prob = np.zeros(shape, np.float32)
    for _ in range(n_cells):
        x0, y0 = rng.uniform(8, X - 8), rng.uniform(8, Y - 8)
        d2 = ((xx - x0) ** 2 + (yy - y0) ** 2) / 60 + (zz - Z / 2) ** 2 / 8
        prob = np.maximum(prob, np.exp(-d2)).astype(np.float32)
    prob = np.where(prob < 0.25, 0.0, prob) * 10.0  # pipeline-style scaling
    return prob


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fused_instance_tile_matches_materialized(seed):
    from hcunet_tpu.ops.watershed import instance_tile
    from scipy import ndimage as ndi

    rng = np.random.default_rng(seed)
    prob = _instance_scene(rng, (72, 64, 6), 6)
    # normalized height map exactly as infer/instance.py builds it
    tile = prob.astype(np.float64) + 1e-8
    tile -= tile.min()
    tile /= tile.max()
    binary = tile > 0.5
    seeds = np.zeros(tile.shape, np.int32)
    for i in range(4):
        x, y = int(rng.uniform(10, 60)), int(rng.uniform(10, 50))
        seeds[x : x + 2, y : y + 2, 2:4] = i + 2

    kw = dict(connectivity=1, compactness=0.01, watershed_line=True)
    ez, em, floor, bg = 5, 3, 0.2, 0.15

    got = instance_tile(
        tile, binary, seeds, expand_z=ez, expand_mask=em,
        distance_floor=floor, seed_background_below=bg, **kw,
    )

    dist_e = np.repeat(tile, ez, axis=2)
    seed_e = np.repeat(seeds, ez, axis=2)
    mask_e = np.repeat(binary, ez, axis=2)
    dist_e[dist_e < floor] = 0
    mask_e = ndi.binary_dilation(mask_e, iterations=em)
    seed_e[dist_e < bg] = 1
    want = watershed(-dist_e, seed_e, mask=mask_e, **kw)[:, :, ::ez]
    np.testing.assert_array_equal(got, want)


def test_fused_backend_equals_materialized_end_to_end():
    """Whole instance segmenter: backend='fused' vs 'materialized'."""
    from hcunet_tpu.config import WatershedConfig
    from hcunet_tpu.infer.instance import generate_unique_segmentation_mask

    rng = np.random.default_rng(7)
    prob = _instance_scene(rng, (96, 96, 8), 8)
    n = 8
    boxes, zs = [], []
    for _ in range(n):
        x, y = rng.uniform(12, 84), rng.uniform(12, 84)
        boxes.append([x - 8, y - 8, x + 8, y + 8])
    cand = {
        "boxes": np.asarray(boxes, np.float32),
        "scores": np.full(n, 0.9, np.float32),
        "labels": np.ones(n, np.int32),
        "z_level": np.full(n, 4.0, np.float32),
    }
    lf, sf = generate_unique_segmentation_mask(
        prob, cand, WatershedConfig(backend="fused")
    )
    lm, sm = generate_unique_segmentation_mask(
        prob, cand, WatershedConfig(backend="materialized")
    )
    np.testing.assert_array_equal(sf, sm)
    np.testing.assert_array_equal(lf, lm)


def test_fused_instance_tile_binary_edt_path():
    """uint8 masks (EDT height map) through both backends."""
    from hcunet_tpu.config import WatershedConfig
    from hcunet_tpu.infer.instance import generate_unique_segmentation_mask

    mask = np.zeros((48, 40, 5), np.uint8)
    mask[6:20, 6:20, 1:4] = 1
    mask[26:40, 18:34, 1:4] = 1
    cand = {
        "boxes": np.asarray(
            [[6, 6, 20, 20], [26, 18, 40, 34]], np.float32
        ),
        "scores": np.asarray([0.9, 0.9], np.float32),
        "labels": np.asarray([1, 1], np.int32),
        "z_level": np.asarray([2.0, 2.0], np.float32),
    }
    lf, _ = generate_unique_segmentation_mask(
        mask, cand, WatershedConfig(backend="fused", expand_mask=2)
    )
    lm, _ = generate_unique_segmentation_mask(
        mask, cand, WatershedConfig(backend="materialized", expand_mask=2)
    )
    np.testing.assert_array_equal(lf, lm)
    assert lf.max() >= 2


def test_device_backend_agrees_on_clean_scene():
    """backend='device' (on-device minimax relaxation) recovers the same
    instances as the exact flood on a well-separated scene; per-instance
    agreement is high away from plateau ties."""
    from hcunet_tpu.config import WatershedConfig
    from hcunet_tpu.infer.instance import generate_unique_segmentation_mask

    rng = np.random.default_rng(11)
    prob = _instance_scene(rng, (96, 96, 6), 5)
    boxes = []
    # place boxes on actual blobs: local maxima of the max-projection
    proj = prob.max(2)
    for _ in range(5):
        x, y = np.unravel_index(np.argmax(proj), proj.shape)
        boxes.append([x - 8, y - 8, x + 8, y + 8])
        proj[max(0, x - 10) : x + 10, max(0, y - 10) : y + 10] = 0
    cand = {
        "boxes": np.asarray(boxes, np.float32),
        "scores": np.full(5, 0.9, np.float32),
        "labels": np.ones(5, np.int32),
        "z_level": np.full(5, 3.0, np.float32),
    }
    exact, _ = generate_unique_segmentation_mask(
        prob, cand, WatershedConfig(backend="fused")
    )
    dev, _ = generate_unique_segmentation_mask(
        prob, cand, WatershedConfig(backend="device")
    )
    ids = np.unique(exact)
    ids = ids[ids > 0]
    assert len(ids) >= 4
    for i in ids:
        a, b = exact == i, dev == i
        inter = (a & b).sum()
        union = (a | b).sum()
        assert union > 0 and inter / union > 0.6, f"instance {i} IoU too low"


def test_device_backend_binary_path_computes_edt_on_device():
    """The binary (non-probability-map) device path derives the per-slice
    distance transform INSIDE the jitted program (ops/distance.edt —
    Pallas-backed on TPU, VERDICT r4 #5) instead of shipping a host EDT.
    Instances must agree with the exact fused flood fed the host EDT."""
    from hcunet_tpu.config import WatershedConfig
    from hcunet_tpu.infer.instance import generate_unique_segmentation_mask

    rng = np.random.default_rng(7)
    prob = _instance_scene(rng, (96, 96, 6), 5)
    semantic = (prob > 2.5).astype(np.uint8)  # binary path: integer dtype
    boxes = []
    proj = prob.max(2)
    for _ in range(5):
        x, y = np.unravel_index(np.argmax(proj), proj.shape)
        boxes.append([x - 8, y - 8, x + 8, y + 8])
        proj[max(0, x - 10): x + 10, max(0, y - 10): y + 10] = 0
    cand = {
        "boxes": np.asarray(boxes, np.float32),
        "scores": np.full(5, 0.9, np.float32),
        "labels": np.ones(5, np.int32),
        "z_level": np.full(5, 3.0, np.float32),
    }
    exact, _ = generate_unique_segmentation_mask(
        semantic, cand, WatershedConfig(backend="fused")
    )
    dev, _ = generate_unique_segmentation_mask(
        semantic, cand, WatershedConfig(backend="device")
    )
    ids = np.unique(exact)
    ids = ids[ids > 0]
    assert len(ids) >= 4
    for i in ids:
        a, b = exact == i, dev == i
        union = (a | b).sum()
        assert union > 0 and (a & b).sum() / union > 0.6, f"instance {i}"
