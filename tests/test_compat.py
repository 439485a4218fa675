"""Tests for the ``hcat``-compatible facade (``hcunet_tpu/compat.py``).

The facade speaks the reference's public API — names, call signatures,
torch channels-first array layout (``/root/reference/hcat/__init__.py:1-5``)
— on top of the TPU-native engines.  These tests pin:

* the module constants (``hcat/__init__.py:18-30``) to the reference values;
* layout round-trips (facade output == direct channels-last engine output);
* ``unet.save``/``load`` round-trips, including loading an actual
  reference-format ``.unet`` torch.save blob (``hcat/unet.py:145-196``)
  with forward parity against the live torch reference model;
* the segment-function surface chained end-to-end the way
  ``hcat/main.py:83-194`` chains it;
* ``analyze`` returning the reference's ``[1, 1, X, Y, Z]`` mask layout.
"""

import numpy as np
import pytest
import torch

from hcunet_tpu import compat
from hcunet_tpu.config import DetectorConfig, TileConfig, WatershedConfig

from tests.reference_loader import reference_unet_module

TINY_KW = dict(
    image_dimensions=3,
    in_channels=4,
    out_channels=1,
    feature_sizes=[8, 16],
    kernel={"conv1": (3, 3, 2), "conv2": (3, 3, 1)},
    upsample_kernel=(4, 4, 2),
    max_pool_kernel=(2, 2, 1),
    upsample_stride=(2, 2, 1),
    dilation=1,
    groups=1,
)
TINY_TILES = TileConfig(eval_size=(48, 48, 6), pad=(24, 24, 3), batch=2)


@pytest.fixture(scope="module")
def tiny_compat_unet():
    return compat.unet(**TINY_KW)


def test_hcat_alias_package_is_the_facade():
    # the repo-root `hcat` package makes the reference's literal import line
    # (`from hcat import unet, rcnn, analyze` — reference hcat/__init__.py:1-5,
    # loop_main.py:1-10) resolve to the facade
    import importlib

    import hcat

    # any earlier `from hcat.unet import ...` rebinds the package attr to
    # the submodule — a quirk the REFERENCE package has too (its __init__
    # binds class over submodule the same way); reload restores the
    # fresh-interpreter surface this test pins
    hcat = importlib.reload(hcat)

    assert hcat.unet is compat.unet
    assert hcat.rcnn is compat.rcnn
    assert hcat.analyze is compat.analyze
    assert hcat.predict_segmentation_mask is compat.predict_segmentation_mask
    assert hcat.__conectivity__ == compat.__conectivity__
    assert set(hcat.__all__) == set(compat.__all__)


def test_compat_constants_match_reference():
    # hcat/__init__.py:18-30 (same names, same conectivity typo)
    assert compat.__conectivity__ == 1
    assert compat.__compactness__ == 0.01
    assert compat.__expand_mask__ == 15
    assert compat.__expand_z__ == 5
    assert compat.__z_tolerance__ == 2
    assert compat.__mask_prob_threshold__ == 0.5
    assert compat.__cell_prob_threshold__ == 0.25


def test_compat_unet_forward_torch_layout(tiny_compat_unet, rng):
    """forward takes/returns [B, C, X, Y, Z] and equals the channels-last
    engine output transposed."""
    m = tiny_compat_unet
    x = rng.standard_normal((1, 4, 48, 48, 6)).astype(np.float32)
    out = m(x)
    direct = m.model.apply(
        m.variables, np.moveaxis(x, 1, -1), train=False
    )
    np.testing.assert_allclose(
        out, np.moveaxis(np.asarray(direct), -1, 1), rtol=1e-6, atol=1e-6
    )
    assert out.shape[0] == 1 and out.shape[1] == 1  # B, out_channels
    # valid convs: strictly smaller spatial output
    assert all(o < i for o, i in zip(out.shape[2:], x.shape[2:]))


def test_compat_unet_train_mode_updates_batch_stats(rng):
    m = compat.unet(**TINY_KW)
    before = np.asarray(
        next(iter(jax_tree_leaves(m.variables["batch_stats"])))
    ).copy()
    m.train()
    m(rng.standard_normal((1, 4, 48, 48, 6)).astype(np.float32) + 3.0)
    after = np.asarray(
        next(iter(jax_tree_leaves(m.variables["batch_stats"])))
    )
    assert not np.allclose(before, after)
    m.eval()
    assert m._training is False


def jax_tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_compat_unet_save_load_roundtrip(tmp_path, tiny_compat_unet, rng):
    m = tiny_compat_unet
    path = str(tmp_path / "model.unet")
    m.save(path, hyperparameters={"epochs": 7, "lr": 1e-3})
    m2 = compat.unet(**TINY_KW, seed=99)  # different init, then restored
    hyper = m2.load(path)
    assert hyper == {"epochs": 7, "lr": 1e-3}
    x = rng.standard_normal((1, 4, 48, 48, 6)).astype(np.float32)
    np.testing.assert_array_equal(m(x), m2(x))


def test_compat_unet_loads_reference_dot_unet_file(tmp_path):
    """An actual reference checkpoint — a torch.save blob with the
    ``hcat/unet.py:145-165`` keys from a live ``Unet_Constructor`` — loads
    through ``compat.unet.load`` with forward parity vs the torch model
    (including the reference's swapped-args crop behavior, ``unet.py:311``)."""
    U = reference_unet_module()
    torch.manual_seed(3)
    net = U.Unet_Constructor(**TINY_KW)
    net.eval()
    blob = {
        "state_dict": net.state_dict(),
        "model_specifications": net.model_specification,
        "hyperparameters": {"epochs": 123},
    }
    path = str(tmp_path / "ref.unet")
    torch.save(blob, path)

    m = compat.unet(**TINY_KW)
    hyper = m.load(path)
    assert hyper == {"epochs": 123}
    assert m.config.reference_skip_bug  # trained-under-bug weights

    torch.manual_seed(4)
    x = torch.randn(1, 4, 48, 48, 6)
    with torch.no_grad():
        want = net(x).numpy()
    got = m(x.numpy())
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_compat_predict_segmentation_mask_layouts(tiny_compat_unet, rng):
    m = tiny_compat_unet
    image = rng.random((1, 4, 64, 64, 6)).astype(np.float32)
    prob = compat.predict_segmentation_mask(
        m, image, use_probability_map=True, tile_cfg=TINY_TILES
    )
    assert prob.shape == (1, 1, 64, 64, 6)
    assert prob.dtype == np.float32
    assert 0.0 <= prob.min() and prob.max() <= 1.0
    hard = compat.predict_segmentation_mask(
        m, image, use_probability_map=False, tile_cfg=TINY_TILES
    )
    assert hard.dtype == np.uint8
    np.testing.assert_array_equal(hard[0, 0], (prob[0, 0] > 0.5))


@pytest.fixture(scope="module")
def tiny_compat_rcnn():
    cfg = DetectorConfig(
        num_classes=2, max_detections=10, rpn_pre_nms_top_n=64,
        rpn_post_nms_top_n=16, anchor_sizes=(16, 32, 64, 128, 256),
        box_score_thresh=0.0,
    )
    return compat.rcnn(config=cfg, backbone="small", image_hw=(64, 64))


def test_compat_rcnn_torchvision_contract(tiny_compat_rcnn, rng):
    """model(images) → list of {'boxes' [N,4], 'labels', 'scores'} — the
    shape hcat/segment.py:192-199 consumes."""
    model = tiny_compat_rcnn.eval()
    images = rng.random((2, 3, 64, 64)).astype(np.float32)
    out = model(images)
    assert isinstance(out, list) and len(out) == 2
    for det in out:
        assert set(det) == {"boxes", "labels", "scores"}
        assert det["boxes"].shape == (len(det["scores"]), 4)
        assert det["labels"].dtype == np.int64
    with pytest.raises(ValueError):
        model.train()  # inference facade
    assert model.cuda() is model  # placement no-ops


def test_compat_segment_chain_and_analyze(tmp_path, tiny_compat_unet,
                                          tiny_compat_rcnn, rng,
                                          monkeypatch):
    """Chain the facade the way hcat/main.py:83-194 does, then the
    one-call analyze; masks come back [1, 1, X, Y, Z]."""
    monkeypatch.chdir(tmp_path)  # analyze writes ./all_cells.pkl (main.py:219)
    m = tiny_compat_unet
    image = rng.random((1, 4, 64, 64, 6)).astype(np.float32)

    cands = compat.predict_cell_candidates(
        image[:, [0, 2, 3]], tiny_compat_rcnn
    )
    assert set(cands) >= {"boxes", "scores", "labels", "z_level"}
    # merge path: feeding the result back through stays NMS-consistent
    merged = compat.predict_cell_candidates(
        image[:, [0, 2, 3]], tiny_compat_rcnn, candidate_list=cands
    )
    assert len(merged["scores"]) <= 2 * max(len(cands["scores"]), 1)

    prob = compat.predict_segmentation_mask(
        m, image, use_probability_map=True, tile_cfg=TINY_TILES
    )
    unique_mask, seed = (
        compat.generate_unique_segmentation_mask_from_probability(
            prob, cands, image
        )
    )
    assert unique_mask.shape == (64, 64, 6)
    cells = compat.generate_cell_objects(image, unique_mask)
    assert len(cells) == len(np.setdiff1d(np.unique(unique_mask), [0]))

    mask, uniq, cell_list = compat.analyze(
        volume=np.moveaxis(image[0], 0, -1),
        numchunks=2,
        path_chunk_storage=str(tmp_path / "work"),
        unet_model=m,
        faster_rcnn=tiny_compat_rcnn,
        tiles=TINY_TILES,
        watershed=WatershedConfig(expand_mask=2),
        fit_cochlea=False,
    )
    assert mask.shape == (1, 1, 64, 64, 6)
    assert uniq.shape == (1, 1, 64, 64, 6)
    assert isinstance(cell_list, list)
    # the reference's ./all_cells.pkl side effect (main.py:219) — the batch
    # driver reloads it for CSV export (loop_main.py:58-59)
    import pickle

    with open(tmp_path / "all_cells.pkl", "rb") as f:
        assert len(pickle.load(f)) == len(cell_list)


def test_compat_analyze_guards():
    with pytest.raises(NotADirectoryError):
        compat.analyze(volume=np.zeros((8, 8, 4, 4)))  # main.py:22-23
    with pytest.raises(ValueError):
        compat.analyze(volume=np.zeros((8, 8, 4, 4)),
                       path_chunk_storage="/tmp")
