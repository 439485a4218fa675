"""Instance segmentation + domain analytics tests on synthetic volumes."""

import os

import numpy as np
import pytest

from hcunet_tpu.analysis.cochlea import get_cochlear_length, skeletonize
from hcunet_tpu.analysis.export import cells_to_csv, mask_to_lines, render_size
from hcunet_tpu.analysis.haircell import HairCell, generate_cell_objects
from hcunet_tpu.config import WatershedConfig
from hcunet_tpu.infer.candidates import empty_candidates, merge_cell_candidates
from hcunet_tpu.infer.chunks import Part, reconstruct_mask, reconstruct_segmented
from hcunet_tpu.infer.instance import generate_unique_segmentation_mask


def _blob_volume():
    """[60, 60, 8] prob map with two gaussian-ish cells."""
    X, Y, Z = 60, 60, 8
    xx, yy, zz = np.meshgrid(
        np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
    )
    c1 = np.exp(-(((xx - 18) ** 2 + (yy - 20) ** 2) / 60 + (zz - 4) ** 2 / 8))
    c2 = np.exp(-(((xx - 42) ** 2 + (yy - 40) ** 2) / 60 + (zz - 4) ** 2 / 8))
    prob = np.maximum(c1, c2).astype(np.float32)
    # the pipeline feeds (blur, floor 0.25, x10) maps — emulate the x10
    prob = prob * 10.0
    cands = {
        "boxes": np.array([[8, 10, 28, 30], [32, 30, 52, 50]], np.float32),
        "scores": np.array([0.97, 0.99], np.float32),
        "labels": np.array([1, 1], np.int32),
        "z_level": np.array([4.0, 4.0], np.float32),
    }
    return prob, cands


def test_instance_segmentation_two_cells():
    prob, cands = _blob_volume()
    cfg = WatershedConfig(expand_mask=3)
    unique, seed = generate_unique_segmentation_mask(
        prob, cands, cfg, host_ram_bytes=32 * 2**30
    )
    ids = set(np.unique(unique)) - {0}
    assert len(ids) == 2, f"expected 2 cells, got {ids}"
    # each blob center belongs to a distinct label
    l1, l2 = unique[18, 20, 4], unique[42, 40, 4]
    assert l1 != 0 and l2 != 0 and l1 != l2
    assert seed.max() >= 2


def test_instance_no_candidates_returns_empty():
    prob, _ = _blob_volume()
    unique, seed = generate_unique_segmentation_mask(
        prob, empty_candidates(), WatershedConfig()
    )
    assert unique.sum() == 0 and seed.sum() == 0


def test_merge_cell_candidates_offsets_and_dedupes():
    a = {
        "boxes": np.array([[0, 0, 10, 10]], np.float32),
        "scores": np.array([0.9], np.float32),
        "labels": np.array([1], np.int32),
        "z_level": np.array([0.0], np.float32),
    }
    b = {
        "boxes": np.array([[0, 0, 10, 10], [30, 30, 40, 40]], np.float32),
        "scores": np.array([0.8, 0.7], np.float32),
        "labels": np.array([1, 2], np.int32),
        "z_level": np.array([1.0, 1.0], np.float32),
    }
    # identical region (offset 0) should dedupe to the higher score
    merged = merge_cell_candidates(dict(a), dict(b), initial_coords=(0, 0))
    assert len(merged["scores"]) == 2
    assert merged["scores"].max() == np.float32(0.9)
    # with an offset there is no overlap: all three survive
    merged2 = merge_cell_candidates(dict(a), dict(b), initial_coords=(100, 0))
    assert len(merged2["scores"]) == 3
    assert merged2["boxes"][:, 0].max() >= 100


def test_part_roundtrip_and_reconstruct(tmp_path):
    m1 = np.zeros((8, 10, 3), np.float32)
    s1 = np.zeros((8, 10, 3), np.int32)
    s1[2:4, 2:4, :] = 1
    m1[2:4, 2:4, :] = 0.9
    m2 = np.zeros((8, 10, 3), np.float32)
    s2 = np.zeros((8, 10, 3), np.int32)
    s2[1:3, 1:3, :] = 1
    Part.create(m1, s1, (0, 0)).save(str(tmp_path / "a.maskpart.npz"))
    Part.create(m2, s2, (8, 0)).save(str(tmp_path / "b.maskpart.npz"))

    full = reconstruct_mask(str(tmp_path))
    assert full.shape == (16, 10, 3)
    assert full[2, 2, 0] == np.float32(0.9)

    seg = reconstruct_segmented(str(tmp_path))
    ids = set(np.unique(seg)) - {0}
    assert len(ids) == 2  # renumbered across chunks

    # the pipeline's combined single-pass walk returns the same canvases
    from hcunet_tpu.infer.chunks import reconstruct

    both_mask, both_seg = reconstruct(str(tmp_path))
    np.testing.assert_array_equal(both_mask, full)
    np.testing.assert_array_equal(both_seg, seg)


def test_part_save_compression_modes_identical(tmp_path):
    """compress=True/False is a pure disk-vs-CPU trade: both spill files
    load back to identical Parts (the pipeline defaults to uncompressed —
    deflate sat inside the host-CPU-bound chunk tail)."""
    rng = np.random.default_rng(3)
    m = rng.random((12, 9, 4)).astype(np.float32)
    s = (rng.random((12, 9, 4)) > 0.7).astype(np.int32) * 5
    pa, pb = str(tmp_path / "a.maskpart.npz"), str(tmp_path / "b.maskpart.npz")
    Part.create(m, s, (1, 2)).save(pa, compress=False)
    Part.create(m, s, (1, 2)).save(pb, compress=True)
    a, b = Part.load(pa), Part.load(pb)
    np.testing.assert_array_equal(a.dense_mask(), b.dense_mask())
    np.testing.assert_array_equal(a.dense_segmented(), b.dense_segmented())
    assert a.loc == b.loc and a.shape == b.shape
    assert os.path.getsize(pa) >= os.path.getsize(pb)  # deflate shrinks


def test_part_null_compression(tmp_path):
    empty = Part.create(np.zeros((4, 4, 2), np.uint8), np.zeros((4, 4, 2), np.int32), (0, 0))
    assert empty.mask is None and empty.segmented_mask is None
    p = str(tmp_path / "e.maskpart.npz")
    empty.save(p)
    back = Part.load(p)
    assert back.dense_mask().shape == (4, 4, 2)


@pytest.mark.parametrize("compress", [False, True])
def test_reconstruct_streaming_with_null_and_compressed_parts(tmp_path, compress):
    """The single-pass ``reconstruct()`` walk must handle the two spill
    variants the pipeline can produce: null-compressed (all-empty) parts —
    whose ``mask.npy``/``segmented.npy`` members are zero-length — and
    zlib-compressed spills (``spill_compress=True``); both must equal the
    two single-purpose oracle paths."""
    from hcunet_tpu.infer.chunks import reconstruct

    rng = np.random.default_rng(11)
    shape = (6, 7, 3)
    m1 = rng.random(shape).astype(np.float32)
    s1 = np.zeros(shape, np.int32)
    s1[1:3, 1:3, :] = 4
    # part 2 is entirely empty -> null-compressed members on disk
    m2 = np.zeros(shape, np.float32)
    s2 = np.zeros(shape, np.int32)
    m3 = rng.random(shape).astype(np.float32)
    s3 = np.zeros(shape, np.int32)
    s3[0:2, 4:6, :] = 2
    s3[4:5, 0:2, :] = 9
    Part.create(m1, s1, (0, 0)).save(str(tmp_path / "a.maskpart.npz"), compress)
    Part.create(m2, s2, (6, 0)).save(str(tmp_path / "b.maskpart.npz"), compress)
    Part.create(m3, s3, (12, 0)).save(str(tmp_path / "c.maskpart.npz"), compress)

    mask, seg = reconstruct(str(tmp_path))
    np.testing.assert_array_equal(mask, reconstruct_mask(str(tmp_path)))
    np.testing.assert_array_equal(seg, reconstruct_segmented(str(tmp_path)))
    assert mask[6:12].sum() == 0 and seg[6:12].sum() == 0  # null part stayed zero
    assert len(set(np.unique(seg)) - {0}) == 3  # ids renumbered across parts


def test_quantized_spill_reconstructs_bit_identical(tmp_path):
    """``prob_transfer_dtype="uint16"`` spills the raw fixed-point map
    (2 B/voxel — the same bytes that crossed the link) plus its scale;
    ``dense_mask``/``reconstruct`` dequantize with the identical f32 scalar
    multiply the pipeline's collect path applies, so the canvases are
    BIT-identical to spilling the dequantized float32 (pipeline.py
    ``_collect_chunk``/``_finish_chunk``)."""
    from hcunet_tpu.infer.chunks import reconstruct

    rng = np.random.default_rng(7)
    prob_scale = 10.0
    scale = prob_scale / 65535.0
    shape = (9, 8, 3)
    parts = []
    for i, loc in enumerate([(0, 0), (9, 0)]):
        raw = rng.integers(0, 65536, size=shape).astype(np.uint16)
        seg = np.zeros(shape, np.int32)
        seg[2 : 4 + i, 3:5, :] = i + 1
        # what the collect path computes and hands to the watershed/stats
        dq = raw.astype(np.float32)
        dq *= np.float32(scale)
        parts.append((raw, dq, seg))
        p = Part.create(raw, seg, loc, mask_scale=scale)
        assert p.mask_dtype == np.float32  # the LOGICAL dtype
        assert p.segmented_mask.dtype == np.uint16  # labels fit -> halved
        p.save(str(tmp_path / f"p{i}.maskpart.npz"))

    # loaded parts dequantize exactly
    back = Part.load(str(tmp_path / "p0.maskpart.npz"))
    assert back.mask_scale == scale and back.mask.dtype == np.uint16
    np.testing.assert_array_equal(back.dense_mask(), parts[0][1])

    mask, seg = reconstruct(str(tmp_path))
    assert mask.dtype == np.float32
    np.testing.assert_array_equal(mask[:9], parts[0][1])  # bit-identical
    np.testing.assert_array_equal(mask[9:], parts[1][1])
    np.testing.assert_array_equal(mask, reconstruct_mask(str(tmp_path)))
    np.testing.assert_array_equal(seg, reconstruct_segmented(str(tmp_path)))
    # renumbered across parts: part-1's label 2 offsets by part-0's max 1
    assert set(np.unique(seg)) == {0, 1, 3}


def test_reconstruct_upgrades_to_int64_when_ids_overflow_int32(tmp_path):
    """Cross-chunk renumbering that would wrap int32 upgrades the canvas
    to int64 mid-walk (inlining ``reconstruct_segmented``'s
    ``_segmented_dtype`` fallback) instead of failing after hours of chunk
    work (review r4)."""
    from hcunet_tpu.infer.chunks import reconstruct

    shape = (4, 4, 2)
    big = 2**30
    for i, loc in enumerate([(0, 0), (4, 0)]):
        m = np.full(shape, 0.5, np.float32)
        s = np.zeros(shape, np.int64)
        s[1:3, 1:3, :] = big  # per-part max 2**30; the second paste sums past int32
        Part.create(m, s, loc).save(str(tmp_path / f"p{i}.maskpart.npz"))

    mask, seg = reconstruct(str(tmp_path))
    assert seg.dtype == np.int64
    assert int(seg.max()) == 2 * big  # renumbered, unwrapped
    np.testing.assert_array_equal(seg, reconstruct_segmented(str(tmp_path)))
    np.testing.assert_array_equal(mask, reconstruct_mask(str(tmp_path)))


def test_haircell_stats_and_frequency(rng):
    img = rng.random((6, 6, 4, 4)).astype(np.float32)
    mask = np.zeros((6, 6, 4), bool)
    mask[2:5, 2:5, 1:3] = True
    cell = HairCell.from_crop([0, 0, 0, 6, 6, 4], [3, 3, 2], img, mask, id=7)
    assert not cell.is_bad
    assert cell.volume > 0
    assert set(cell.signal_stats) == {"dapi", "gfp", "myo7a", "actin"}
    np.testing.assert_allclose(
        cell.gfp_stats["mean"], img[..., 1][mask].mean(), rtol=1e-6
    )
    curve = np.stack([np.linspace(0, 100, 50), np.linspace(0, 100, 50)])
    cell.set_frequency(curve, np.linspace(0, 1, 50))
    assert 0 <= cell.distance_from_apex <= 1

    tiny = HairCell.from_crop([0, 0, 0, 1, 1, 1], [0, 0, 0],
                              img[:1, :1, :1], np.zeros((1, 1, 1)), id=1)
    assert tiny.is_bad and np.isnan(tiny.gfp_stats["mean"])


def test_generate_cell_objects(rng):
    labels = np.zeros((20, 20, 4), np.int32)
    labels[2:8, 2:8, 1:3] = 1
    labels[12:18, 12:18, 1:3] = 5
    img = rng.random((20, 20, 4, 4)).astype(np.float32)
    cells = generate_cell_objects(img, labels, x_ind_chunk=100, y_ind_chunk=0)
    assert len(cells) == 2
    assert cells[0].center[0] > 100  # chunk offset applied


def test_exports(tmp_path, rng):
    labels = np.zeros((30, 30, 3), np.int32)
    labels[5:10, 5:10, :] = 1  # 75 voxels -> "too small"
    img = rng.random((30, 30, 3, 4)).astype(np.float32)
    cells = generate_cell_objects(img, labels)
    for c in cells:
        c.distance_from_apex = 0.5
    csv_path = str(tmp_path / "cells.csv")
    cells_to_csv(cells, csv_path)
    assert "mean_gfp" in open(csv_path).read()

    classes = render_size(labels, out_path=str(tmp_path / "size.tif"))
    assert set(np.unique(classes)) <= {0, 1, 2, 3}

    lines = mask_to_lines(labels)
    assert lines.any() and lines.sum() < (labels > 0).sum()


def test_skeletonize_thin_line():
    img = np.zeros((30, 30), bool)
    img[10:13, 5:25] = True  # 3-wide bar
    sk = skeletonize(img)
    assert sk.sum() <= 25 and sk.sum() >= 15  # ~1px wide


def test_cochlear_length_on_synthetic_spiral():
    # draw a thick spiral r = 20 + 8θ on a 1000x1000 grid
    t = np.linspace(0, 3.5 * np.pi, 4000)
    r = 120 + 38 * t
    cx = 500 + r * np.cos(t)
    cy = 500 + r * np.sin(t)
    img = np.zeros((1000, 1000), np.float64)
    for dx in range(-55, 56, 3):
        for dy in range(-55, 56, 3):
            xs = np.clip(cx + dx, 0, 999).astype(int)
            ys = np.clip(cy + dy, 0, 999).astype(int)
            img[xs, ys] = 1.0
    curve, pct, apex = get_cochlear_length(img, equal_spaced_distance=2)
    assert curve.shape[0] == 2 and curve.shape[1] > 10
    assert pct.min() >= 0 and pct.max() <= 1
    assert len(pct) == curve.shape[1]
    # curve length should be in the ballpark of the drawn spiral length
    seg = np.sqrt(np.diff(curve[0]) ** 2 + np.diff(curve[1]) ** 2)
    drawn = np.sum(np.sqrt(np.diff(cx) ** 2 + np.diff(cy) ** 2))
    assert 0.3 * drawn < seg.sum() < 2.0 * drawn


def test_instance_tile_workers_identical(rng):
    """Parallel tile flooding (tile_workers > 1) must be bit-identical to
    the serial loop: floods run concurrently but write-backs stay in tile
    order."""
    import dataclasses

    from hcunet_tpu.config import WatershedConfig
    from hcunet_tpu.infer.instance import generate_unique_segmentation_mask

    X = Y = 600  # small host_ram_bytes keying -> 412^2 tiles -> 2x2 grid
    Z = 6
    prob = rng.random((X, Y, Z)).astype(np.float32) * 0.3
    boxes, zl = [], []
    for gx in range(5):
        for gy in range(5):
            cx, cy = 60 + gx * 110, 60 + gy * 110
            xx, yy = np.mgrid[0:X, 0:Y].astype(np.float32)
            g = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 500.0)
            prob += g[..., None] * 6.0
            boxes.append([cx - 20, cy - 20, cx + 20, cy + 20])
            zl.append(3)
    cand = {
        "boxes": np.asarray(boxes, np.float32),
        "scores": np.full(len(boxes), 0.9, np.float32),
        "labels": np.ones(len(boxes), np.int64),
        "z_level": np.asarray(zl, np.float32),
    }
    base = WatershedConfig(expand_mask=2)
    serial, _ = generate_unique_segmentation_mask(
        prob, dict(cand), dataclasses.replace(base, tile_workers=1),
        host_ram_bytes=8 * 2**30,
    )
    parallel, _ = generate_unique_segmentation_mask(
        prob, dict(cand), dataclasses.replace(base, tile_workers=4),
        host_ram_bytes=8 * 2**30,
    )
    assert serial.max() > 0  # non-trivial labeling
    np.testing.assert_array_equal(serial, parallel)


def test_cap_tile_workers_divides_budget_across_concurrent_stages():
    """The flood-worker RAM cap must shrink when several chunk tails run
    instance stages concurrently (analyze(overlap=N)): otherwise each pool
    independently budgets host_ram/2 and the aggregate peak is N x the cap
    (review r4 #1)."""
    from hcunet_tpu.config import WatershedConfig
    from hcunet_tpu.infer.instance import _cap_tile_workers

    cfg = WatershedConfig()
    pad, ev, Z = (56, 56), (1212, 1212), 20
    ram = 16 * 2**30
    solo = _cap_tile_workers(16, pad, ev, Z, cfg, ram)
    three = _cap_tile_workers(16, pad, ev, Z, cfg, ram, concurrent_stages=3)
    assert 1 <= three <= max(1, solo // 3 + 1)
    # aggregate in-flight peak stays within the budget
    tile_vox = (ev[0] + 2 * pad[0]) * (ev[1] + 2 * pad[1]) * Z
    per_tile = tile_vox * 25
    assert 3 * three * per_tile <= ram // 2 + 3 * per_tile  # floor slack
    # always at least one worker, even on tiny hosts
    assert _cap_tile_workers(16, pad, ev, Z, cfg, 2**28, 4) == 1
