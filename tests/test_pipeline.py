"""End-to-end pipeline tests: analyze() on a synthetic volume with tiny
models, chunk-journal resumability, batch driver manifest semantics."""

import os

import jax
import numpy as np
import pytest

from hcunet_tpu.config import (
    DetectorConfig,
    PipelineConfig,
    TileConfig,
    UNetConfig,
    WatershedConfig,
)
from hcunet_tpu.infer.pipeline import analyze
from hcunet_tpu.models.detection import Detector
from hcunet_tpu.models.unet import init_unet


@pytest.fixture(scope="module")
def tiny_models():
    cfg = UNetConfig(
        feature_sizes=(8, 16),
        kernel1=(3, 3, 2),
        kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2),
        max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1),
        groups=1,
    )
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (48, 48, 6))
    unet_apply = jax.tree_util.Partial(
        lambda v, t: model.apply(v, t, train=False), variables
    )
    det_cfg = DetectorConfig(
        num_classes=2, max_detections=10, rpn_pre_nms_top_n=64,
        rpn_post_nms_top_n=16, anchor_sizes=(16, 32, 64, 128, 256),
        box_score_thresh=0.0,
    )
    det = Detector(det_cfg, backbone="small")
    det_vars = det.init(jax.random.PRNGKey(1), (64, 64))
    return cfg, unet_apply, det, det_vars


def _pipeline_cfg(unet_cfg):
    return PipelineConfig(
        numchunks=2,
        unet=unet_cfg,
        tiles=TileConfig(eval_size=(48, 48, 6), pad=(24, 24, 3), batch=2),
        watershed=WatershedConfig(expand_mask=2),
    )


def test_analyze_end_to_end(tmp_path, tiny_models, rng):
    unet_cfg, unet_apply, det, det_vars = tiny_models
    volume = rng.random((64, 64, 6, 4)).astype(np.float32)
    result = analyze(
        volume=volume,
        unet_apply=unet_apply,
        detector=det,
        detector_variables=det_vars,
        cfg=_pipeline_cfg(unet_cfg),
        work_dir=str(tmp_path / "work"),
        fit_cochlea=False,
    )
    assert result.mask.shape == (64, 64, 6)
    assert result.unique_mask.shape == (64, 64, 6)
    assert os.path.exists(tmp_path / "work" / "cells.csv")


def test_analyze_uint16_matches_float(tmp_path, tiny_models, rng):
    """Integer volumes ride the tunnel raw and rescale on device; the
    result must match the same volume pre-converted to [0,1] float."""
    unet_cfg, unet_apply, det, det_vars = tiny_models
    vol16 = (rng.random((64, 64, 6, 4)) * 65535).astype(np.uint16)
    # the float path divides by 2**16 like to_float / the reference
    # (transforms.py:94-115) — NOT iinfo.max (advisor r3 finding #2)
    volf = vol16.astype(np.float32) / 65536.0
    results = []
    for name, vol in (("u16", vol16), ("f32", volf)):
        results.append(
            analyze(
                volume=vol, unet_apply=unet_apply, detector=det,
                detector_variables=det_vars, cfg=_pipeline_cfg(unet_cfg),
                work_dir=str(tmp_path / name), fit_cochlea=False,
            )
        )
    a, b = results
    # device normalize: (x/65536 - mean)/std vs (xf - mean)/std — identical
    # math up to f32 rounding of the division, so masks must agree
    np.testing.assert_allclose(a.mask, b.mask, atol=1e-3)
    assert (a.unique_mask == b.unique_mask).mean() > 0.999
    assert len(a.cells) == len(b.cells)
    for ca, cb in zip(a.cells, b.cells):
        # intensity stats come from the raw chunk, rescaled at crop
        # granularity for the integer path
        assert abs(ca.gfp_stats["mean"] - cb.gfp_stats["mean"]) < 1e-4


def test_analyze_uint16_prob_transfer_matches_float32(tmp_path, tiny_models, rng):
    """prob_transfer_dtype="uint16" (the transfer-diet default for remote
    tunnels) must stay within one fixed-point quantum of the exact float32
    path and produce the same instances/cells."""
    unet_cfg, unet_apply, det, det_vars = tiny_models
    volume = rng.random((64, 64, 6, 4)).astype(np.float32)
    results = []
    import dataclasses

    for name, dtype in (("f32", "float32"), ("u16", "uint16")):
        cfg = dataclasses.replace(
            _pipeline_cfg(unet_cfg), prob_transfer_dtype=dtype
        )
        results.append(
            analyze(
                volume=volume, unet_apply=unet_apply, detector=det,
                detector_variables=det_vars, cfg=cfg,
                work_dir=str(tmp_path / name), fit_cochlea=False,
            )
        )
    a, b = results
    # one quantum = prob_scale / 65535 (values land on the fixed-point grid,
    # round-to-nearest → half-quantum error; rtol for the f32 decode mul)
    quantum = 10.0 / 65535.0
    np.testing.assert_allclose(b.mask, a.mask, atol=0.75 * quantum, rtol=1e-6)
    assert (a.unique_mask == b.unique_mask).mean() > 0.999
    assert len(a.cells) == len(b.cells)
    # bytes halve: the uint16 map is 2 B/voxel vs 4 B float32
    assert b.stage_bytes["prob_d2h"] * 2 == a.stage_bytes["prob_d2h"]


def test_analyze_uint8_prob_transfer_within_quantum(tmp_path, tiny_models, rng):
    """prob_transfer_dtype="uint8" (1 B/voxel, VERDICT r4 #9): the map must
    stay within one uint8 fixed-point quantum of the float32 path and the
    transfer bytes must quarter.  Unlike uint16 (quantum 7.6e-5) the uint8
    quantum is ~0.02 in map units, so threshold-borderline voxels may flip
    — instances are compared by count/majority, not bit-exactness."""
    unet_cfg, unet_apply, det, det_vars = tiny_models
    volume = rng.random((64, 64, 6, 4)).astype(np.float32)
    results = []
    import dataclasses

    for name, dtype in (("f32", "float32"), ("u8", "uint8")):
        cfg = dataclasses.replace(
            _pipeline_cfg(unet_cfg), prob_transfer_dtype=dtype
        )
        results.append(
            analyze(
                volume=volume, unet_apply=unet_apply, detector=det,
                detector_variables=det_vars, cfg=cfg,
                work_dir=str(tmp_path / name), fit_cochlea=False,
            )
        )
    a, b = results
    quantum = 10.0 / 255.0
    np.testing.assert_allclose(b.mask, a.mask, atol=0.75 * quantum, rtol=1e-6)
    # this fixture volume is uniform noise — the watershed's worst case for
    # quantization (many threshold-borderline voxels), so boundary voxels
    # move more than on a smooth production map; instances must still agree
    # on the overwhelming majority of voxels and in count
    assert (a.unique_mask == b.unique_mask).mean() > 0.95
    assert len(b.cells) == len(a.cells)
    # bytes quarter: 1 B/voxel vs 4 B float32
    assert b.stage_bytes["prob_d2h"] * 4 == a.stage_bytes["prob_d2h"]


def test_analyze_multiworker_tails_match_sequential(tmp_path, tiny_models, rng):
    """overlap=3 (three concurrent chunk-tail workers) must be bit-identical
    to the fully sequential pipeline: chunk tails are independent and
    ``pending`` preserves chunk order."""
    unet_cfg, unet_apply, det, det_vars = tiny_models
    volume = rng.random((96, 96, 6, 4)).astype(np.float32)
    cfg = _pipeline_cfg(unet_cfg)
    results = []
    for name, ov in (("seq", False), ("w3", 3)):
        results.append(
            analyze(
                volume=volume, unet_apply=unet_apply, detector=det,
                detector_variables=det_vars, cfg=cfg,
                work_dir=str(tmp_path / name), fit_cochlea=False, overlap=ov,
            )
        )
    a, b = results
    np.testing.assert_array_equal(a.mask, b.mask)
    np.testing.assert_array_equal(a.unique_mask, b.unique_mask)
    assert [c.unique_id for c in a.cells] == [c.unique_id for c in b.cells]
    assert a.stage_bytes == b.stage_bytes


def test_analyze_resumes_from_journal(tmp_path, tiny_models, rng):
    unet_cfg, unet_apply, det, det_vars = tiny_models
    volume = rng.random((64, 64, 6, 4)).astype(np.float32)
    work = str(tmp_path / "work")
    analyze(
        volume=volume, unet_apply=unet_apply, detector=None,
        detector_variables=None, cfg=_pipeline_cfg(unet_cfg),
        work_dir=work, fit_cochlea=False,
    )
    # second run must reuse every chunk (no new part files, much faster)
    parts_before = sorted(os.listdir(work))

    def boom(*a, **k):
        raise AssertionError("unet must not be called on resume")

    analyze(
        volume=volume, unet_apply=boom, detector=None,
        detector_variables=None, cfg=_pipeline_cfg(unet_cfg),
        work_dir=work, fit_cochlea=False,
    )
    assert sorted(os.listdir(work)) == parts_before


def test_batch_driver_manifest(tmp_path):
    from hcunet_tpu.apps.batch import run_batch, read_status

    root = tmp_path / "data"
    root.mkdir()
    from hcunet_tpu.data.tiff import imwrite

    for name in ("a.tif", "b.tif"):
        imwrite(str(root / name), np.zeros((4, 8, 8), np.uint8))

    calls = []

    def fake_analyze(img, out):
        calls.append(img)
        if img.endswith("b.tif"):
            raise RuntimeError("synthetic failure")

    results = run_batch(str(root), fake_analyze)
    assert len(calls) == 2
    states = {os.path.basename(r["image"]): r["state"] for r in results}
    assert states == {"a.tif": "done", "b.tif": "error"}

    # second pass: both skipped (done + recorded error)
    calls.clear()
    results2 = run_batch(str(root), fake_analyze)
    assert calls == []
    assert all(r.get("cached") for r in results2)

    # error retry
    results3 = run_batch(str(root), fake_analyze, retry_errors=True)
    assert calls == [str(root / "b.tif")]

    status = read_status(str(root / "b_cellBycell"))
    assert status["state"] == "error" and "synthetic failure" in status["error"]


def test_cli_help_and_parsing(capsys):
    from hcunet_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("analyze", "batch", "train-unet", "train-rcnn", "preprocess", "bench"):
        assert cmd in out


def test_batch_host_sharding(tmp_path):
    from hcunet_tpu.apps.batch import run_batch

    root = tmp_path / "data"
    root.mkdir()
    from hcunet_tpu.data.tiff import imwrite

    for i in range(5):
        imwrite(str(root / f"im{i}.tif"), np.zeros((2, 4, 4), np.uint8))

    seen = []
    run_batch(str(root), lambda img, out: seen.append(img), shard=(0, 2))
    seen2 = []
    run_batch(str(root), lambda img, out: seen2.append(img), shard=(1, 2))
    assert len(seen) + len(seen2) == 5
    assert not set(seen) & set(seen2)


def test_analyze_with_trained_detector_localizes_cells(tmp_path):
    """Showcase integration: train a small detector on synthetic blob
    slices, run the full analyze() pipeline, and check the extracted
    HairCells sit on the true blobs."""
    import jax.numpy as jnp

    from hcunet_tpu.core.shapes import unet_output_shape
    from hcunet_tpu.train.detection_trainer import (
        DetectionTrainConfig,
        DetectionTrainer,
    )

    X, Y, Z = 96, 96, 6
    centers = [(24, 24), (24, 72), (72, 48)]
    xx, yy, zz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z), indexing="ij")
    prob = np.zeros((X, Y, Z), np.float32)
    for cx, cy in centers:
        prob = np.maximum(
            prob,
            np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 60 + (zz - 3) ** 2 / 6)),
        ).astype(np.float32)
    volume = np.repeat(prob[..., None], 4, axis=-1)

    # --- a synthetic "unet": crops to the valid output shape and maps
    # intensity -> logits (keeps the tiling geometry honest) ---
    unet_cfg = UNetConfig(
        feature_sizes=(8, 16), kernel1=(3, 3, 2), kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), groups=1,
    )

    def unet_apply(tiles):
        out_sp = unet_output_shape(tiles.shape[1:-1], **unet_cfg.shape_kwargs())
        core = tiles[:, : out_sp[0], : out_sp[1], : out_sp[2], :1]
        # normalized input is in [-1, 1]; map to confident logits
        return core * 8.0

    # --- train the detector on the volume's z-slices ---
    det_cfg = DetectorConfig(
        num_classes=2, max_detections=8, rpn_pre_nms_top_n=64,
        rpn_post_nms_top_n=16, anchor_sizes=(16, 32, 64, 128, 256),
        box_score_thresh=0.1,
    )
    det = Detector(det_cfg, backbone="small")
    det_vars = det.init(jax.random.PRNGKey(0), (X, Y))
    # normalized slice (like the pipeline feeds) + GT boxes in detector axes
    norm_slice = ((volume[..., 3, :3] - 0.5) / 0.5).astype(np.float32)[None]
    gt = np.array(
        [[cy - 9, cx - 9, cy + 9, cx + 9] for cx, cy in centers], np.float32
    )  # detector x = array dim1
    labels = np.ones(len(gt), np.int32)
    tr = DetectionTrainer(
        det, det_vars,
        DetectionTrainConfig(learning_rate=3e-4, gamma=1.0, max_gt=8),
    )
    for _ in range(80):
        tr.train_step(norm_slice, gt, labels)

    result = analyze(
        volume=volume,
        unet_apply=jax.tree_util.Partial(lambda t: unet_apply(t)),
        detector=det,
        detector_variables=tr.variables,
        cfg=PipelineConfig(
            numchunks=2,
            unet=unet_cfg,
            tiles=TileConfig(eval_size=(96, 96, 6), pad=(24, 24, 3), batch=1),
            watershed=WatershedConfig(expand_mask=2, z_tolerance=3),
        ),
        work_dir=str(tmp_path / "work"),
        fit_cochlea=False,
    )
    good = [c for c in result.cells if not c.is_bad]
    assert len(good) >= 2, f"expected >=2 cells, got {len(good)}"
    found = 0
    for cx, cy in centers:
        for c in good:
            if abs(c.center[0] - cx) < 8 and abs(c.center[1] - cy) < 8:
                found += 1
                break
    assert found >= 2, [c.center for c in good]


def test_work_dir_fingerprint_guard(tmp_path, tiny_models, rng):
    """Reusing a work_dir for a different volume must fail loudly instead of
    mixing cached chunks."""
    unet_cfg, unet_apply, _, _ = tiny_models
    work = str(tmp_path / "work")
    vol_a = rng.random((64, 64, 6, 4)).astype(np.float32)
    vol_b = rng.random((64, 64, 6, 4)).astype(np.float32)
    analyze(volume=vol_a, unet_apply=unet_apply, detector=None,
            detector_variables=None, cfg=_pipeline_cfg(unet_cfg),
            work_dir=work, fit_cochlea=False)
    with pytest.raises(ValueError, match="different"):
        analyze(volume=vol_b, unet_apply=unet_apply, detector=None,
                detector_variables=None, cfg=_pipeline_cfg(unet_cfg),
                work_dir=work, fit_cochlea=False)


def test_analyze_overlap_equals_sequential(tmp_path, tiny_models, rng):
    """The threaded instance-stage overlap must be a pure latency
    optimization: identical masks/cells to the sequential path."""
    unet_cfg, unet_apply, det, det_vars = tiny_models
    volume = rng.random((64, 64, 6, 4)).astype(np.float32)
    a = analyze(
        volume=volume, unet_apply=unet_apply, detector=det,
        detector_variables=det_vars, cfg=_pipeline_cfg(unet_cfg),
        work_dir=str(tmp_path / "seq"), fit_cochlea=False, overlap=False,
    )
    b = analyze(
        volume=volume, unet_apply=unet_apply, detector=det,
        detector_variables=det_vars, cfg=_pipeline_cfg(unet_cfg),
        work_dir=str(tmp_path / "ovl"), fit_cochlea=False, overlap=True,
    )
    np.testing.assert_array_equal(a.unique_mask, b.unique_mask)
    np.testing.assert_allclose(a.mask, b.mask, atol=1e-6)
    assert len(a.cells) == len(b.cells)
    assert [c.unique_id for c in a.cells] == [c.unique_id for c in b.cells]


def test_cli_analyze_end_to_end(tmp_path, capsys):
    """hcunet analyze from a checkpoint file to cells.csv — exercises the
    CLI model loading (packed serving), tiff IO, and the pipeline."""
    import json

    import jax

    from hcunet_tpu.cli import main
    from hcunet_tpu.config import UNetConfig
    from hcunet_tpu.data.tiff import imwrite
    from hcunet_tpu.models.unet import init_unet
    from hcunet_tpu.utils.checkpoint import save_checkpoint

    cfg = UNetConfig(
        feature_sizes=(8, 16), kernel1=(3, 3, 2), kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), groups=1,
    )
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (48, 48, 8))
    ckpt = str(tmp_path / "unet.hcunet")
    save_checkpoint(ckpt, dict(variables), cfg, snapshot_sources=False)

    vol = (np.random.default_rng(0).random((6, 64, 64, 4)) * 255).astype(
        np.uint8
    )  # [Z, Y, X, C] skimage-style on disk
    img = str(tmp_path / "stack.tif")
    imwrite(img, vol)

    out = str(tmp_path / "out")
    rc = main([
        "analyze", img, "--unet", ckpt, "--out", out,
        "--numchunks", "2", "--no-cochlea",
    ])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["out"] == out
    assert os.path.exists(os.path.join(out, "cells.csv"))


def test_cli_analyze_spatial_shards(tmp_path, capsys):
    """`hcunet analyze --spatial-shards` completes and matches the
    single-device run's cell table (thin chunks fall back gracefully)."""
    import json

    import jax

    from hcunet_tpu.cli import main
    from hcunet_tpu.config import UNetConfig
    from hcunet_tpu.data.tiff import imwrite
    from hcunet_tpu.models.unet import init_unet
    from hcunet_tpu.utils.checkpoint import save_checkpoint

    cfg = UNetConfig(
        feature_sizes=(8, 16), kernel1=(3, 3, 2), kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), groups=1,
    )
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (48, 48, 8))
    ckpt = str(tmp_path / "unet.hcunet")
    save_checkpoint(ckpt, dict(variables), cfg, snapshot_sources=False)

    vol = (np.random.default_rng(1).random((6, 48, 48, 4)) * 255).astype(
        np.uint8
    )
    img = str(tmp_path / "stack.tif")
    imwrite(img, vol)

    outs = {}
    for shards, name in ((1, "single"), (2, "sharded")):
        out = str(tmp_path / name)
        rc = main([
            "analyze", img, "--unet", ckpt, "--out", out,
            "--numchunks", "2", "--no-cochlea",
            "--spatial-shards", str(shards),
        ])
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        outs[name] = info["cells"]
        assert os.path.exists(os.path.join(out, "cells.csv"))
    assert outs["single"] == outs["sharded"]


def test_sharded_chunk_padded_width_invariant():
    """``_ShardedChunkSeg.padded_width``: any nonzero bucket extension must
    be >= eval_x + pad_x so the tile holding the last true voxel never
    reads the sharded engine's own far-edge halo (review r4: a single
    quantum bump was not enough when pad_x > (n_shards-1)*eval_x)."""
    import dataclasses

    from hcunet_tpu.infer.pipeline import _ShardedChunkSeg

    for n, ex, px in ((2, 16, 40), (2, 32, 16), (4, 16, 56), (3, 20, 20)):
        cfg = PipelineConfig(
            tiles=TileConfig(eval_size=(ex, ex, 4), pad=(px, px, 2))
        )
        seg = _ShardedChunkSeg(None, n, None, cfg)
        q = n * ex
        for Xc in range(1, 6 * q + 7):
            Xq = seg.padded_width(Xc)
            if px > Xc:
                assert Xq is None  # mirror pad cannot exceed source width
                continue
            ext = Xq - Xc
            assert Xq % q == 0
            assert ext == 0 or ext >= ex + px, (n, ex, px, Xc, Xq)
            # slabs hold at least one halo and one tile column
            assert Xq >= n * max(px, ex)
