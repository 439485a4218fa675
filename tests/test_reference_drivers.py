"""Execute the reference's OWN driver scripts against the repo's ``hcat``
alias package (VERDICT r4 #6, advisor r4 #1).

The alias used to be a single ``__init__.py``, so every reference driver
that imports submodules (``from hcat.main import analyze``,
``from hcat import dataloader, utils as u, transforms as t`` …) died with
ModuleNotFoundError.  These tests pin the full driver import surface, and
run the actual source of ``/root/reference/loop_main.py`` — glob loop,
lock-file idempotency, ``analyze(numchunks=6)``, ``all_cells.pkl`` reload,
CSV export — with only its hard-coded paths and checkpoint-loading
monkeypatched (the reference wires absolute ``/media/...`` data paths and
checkpoint files into ``loop_main.py:13-14`` / ``hcat/main.py:57-66``).
"""

import glob as glob_module
import pickle
from functools import partial

import numpy as np
import pytest

import hcat
import hcat.main
from hcunet_tpu import compat
from hcunet_tpu.config import DetectorConfig, TileConfig, WatershedConfig
from hcunet_tpu.data.tiff import imwrite

LOOP_MAIN = "/root/reference/loop_main.py"

TINY_UNET_KW = dict(
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


# --- the import surface of every reference driver ---------------------------

DRIVER_IMPORT_FORMS = [
    # loop_main.py:3-4
    "from hcat.main import analyze\nfrom hcat.utils import cells_to_csv",
    # train_rcnn.py:6-7
    "from hcat import dataloader, utils as u, transforms as t\n"
    "import hcat.train",
    # validate.py:7
    "from hcat import haircell",
    # valscripts/main_func.py:1-4
    "from hcat.unet import Unet_Constructor as GUnet\n"
    "import hcat.transforms as t\n"
    "from hcat import mask as m, utils, segment\n"
    "import hcat",
    # preprocess_manual_masks.py:10,16-19
    "from hcat.train import train_utils\n"
    "mm = train_utils.makeMask(erosion=True)\n"
    "mpwl = train_utils.makePWL()\n"
    "com = train_utils.CalculateCenterOfMass()\n"
    "pix2center = train_utils.VectorToCenter()",
    # tests/r_unet_test.py:1
    "from hcat.r_unet import RecursiveUnet as RUnet, RDCNet",
    # tests/stacked_dialation_test.py:1
    "from hcat.r_unet import StackedDilation, RDCNet",
    # hcat/main.py's own internal imports, spelled as a consumer would
    "from hcat.validate.render_size import render_size\n"
    "from hcat import loss\nfrom hcat import rcnn",
]


@pytest.mark.parametrize("form", DRIVER_IMPORT_FORMS)
def test_reference_driver_import_forms_resolve(form):
    exec(compile(form, "<driver import>", "exec"), {})


# --- loop_main.py executed as-is --------------------------------------------


def _write_scene_tif(path, X=96, Y=96, Z=6):
    from hcunet_tpu.benchmarks import _blob_scene

    vol16, _prob = _blob_scene(X, Y, Z, n_cells=6, seed=3)
    # the reference reads tifs in skimage [Z, Y, X, C] layout (SURVEY §2.2)
    imwrite(str(path), np.transpose(vol16, (2, 1, 0, 3)))


@pytest.fixture(scope="module")
def driver_models():
    unet_m = compat.unet(**TINY_UNET_KW)
    det = compat.rcnn(
        config=DetectorConfig(
            num_classes=2, max_detections=10, rpn_pre_nms_top_n=64,
            rpn_post_nms_top_n=16, anchor_sizes=(16, 32, 64, 128, 256),
            box_score_thresh=0.0,
        ),
        backbone="small", image_hw=(64, 64),
    )
    return unet_m, det


@pytest.mark.slow
def test_loop_main_runs_unmodified_through_alias(
    tmp_path, monkeypatch, driver_models
):
    unet_m, det = driver_models
    data_dir = tmp_path / "AAV injection results" / "animal" / "day1"
    data_dir.mkdir(parents=True)
    tif = data_dir / "cochlea1.tif"
    _write_scene_tif(tif)

    # models: the reference hard-codes its checkpoint paths inside analyze
    # (hcat/main.py:57-66); bind them onto the name loop_main imports
    monkeypatch.setattr(
        hcat.main, "analyze",
        partial(
            compat.analyze, unet_model=unet_m, faster_rcnn=det,
            tiles=TINY_TILES, watershed=WatershedConfig(expand_mask=2),
            fit_cochlea=False,
        ),
    )
    # paths: loop_main hard-codes '/media/DataStorage/...' (loop_main.py:13)
    real_glob = glob_module.glob

    def fake_glob(pattern, *a, **k):
        if pattern.startswith("/media/"):
            return [str(tif)]
        return real_glob(pattern, *a, **k)

    monkeypatch.setattr(glob_module, "glob", fake_glob)
    monkeypatch.chdir(tmp_path)

    with open(LOOP_MAIN) as f:
        src = f.read()
    exec(compile(src, LOOP_MAIN, "exec"), {"__name__": "__main__"})

    outdir = data_dir / "cochlea1_cellBycell"
    err = outdir / "error.lock"
    assert not err.exists(), f"loop_main hit an error: {err.read_text()}"
    assert (outdir / "analysis.lock").exists()
    assert (outdir / "all_cells.csv").exists()
    with open(outdir / "all_cells.pkl", "rb") as f:
        cells = pickle.load(f)
    assert isinstance(cells, list)
    assert (outdir / "maskfiles").is_dir()

    # second pass: the lock-file idempotency branch (loop_main.py:31-37)
    # skips the image and renames the CSV to <image>.csv
    exec(compile(src, LOOP_MAIN, "exec"), {"__name__": "__main__"})
    assert (outdir / "cochlea1.csv").exists()
    assert not (outdir / "all_cells.csv").exists()


# --- submodule behavior spot-checks -----------------------------------------


def test_train_utils_classes_generate_targets(tmp_path):
    from hcat.train import train_utils

    # a color-coded two-cell [Z, Y, X, C] mask like an amira export
    color = np.zeros((2, 24, 24, 3), np.uint8)
    color[:, 4:10, 4:10] = (255, 0, 0)
    color[:, 14:20, 14:20] = (0, 255, 0)

    cleaned = train_utils.makeMask()(color)
    assert cleaned.shape == color.shape
    binary = train_utils.colormask_to_mask(cleaned)
    assert set(np.unique(binary)) <= {0, 1} and binary.any()

    pwl = train_utils.makePWL()(color)
    assert pwl.shape == color.shape[:3]
    assert pwl.max() > 0  # background between the two cells gets weight
    assert (pwl[color.any(-1)] == 0).all()  # zero on cells

    centers, labels = train_utils.CalculateCenterOfMass()(color)
    # two cells + background (ids come from unique-color order, like the
    # reference's enumerate over unique colors — not necessarily 1, 2)
    assert len(np.unique(labels)) == 3 and (labels == 0).any()
    assert len(np.unique(centers)) == 3  # 0 + two painted ids

    vec = train_utils.VectorToCenter()(centers, labels, binary)
    assert vec.shape == color.shape[:3] + (3,)
    # offsets: zero on background, shape-normalized (|v| <= 1) on cells,
    # and within a cell the y-offsets straddle the (rounded) center
    assert (vec[labels == 0] == 0).all()
    cell_id = int(np.unique(labels)[1])
    assert np.abs(vec).max() <= 1.0
    assert (vec[labels == cell_id][:, 1] > 0).any()
    assert (vec[labels == cell_id][:, 1] < 0).any()


def test_loss_module_reference_layout(rng):
    from hcat import loss

    pred = rng.standard_normal((1, 1, 12, 12, 4)).astype(np.float32)
    mask = (rng.random((1, 1, 16, 16, 6)) > 0.5).astype(np.float32)
    pwl = rng.random((1, 16, 16, 6)).astype(np.float32)[:, None]
    for method in ("pixel", "worst_z", "sigmoid"):
        v = loss.cross_entropy(pred, mask, pwl, method=method)
        assert np.isfinite(v) and v > 0
    assert 0 <= loss.dice(pred, mask) <= 1
    assert loss.L1Loss(pred, mask) >= 0
    assert loss.MSELoss(pred, mask) >= 0


def test_segment_pixel_vec_to_cell_torch_layout(rng):
    import hcat.segment
    from hcunet_tpu.infer.vector_cluster import pixel_vec_to_cell as _direct

    X, Y, Z = 24, 24, 4
    vec = rng.standard_normal((X, Y, Z, 3)).astype(np.float32) * 0.1
    mask = rng.random((X, Y, Z)).astype(np.float32)
    want = _direct(vec, mask)
    # torch layout [1, 3, X, Y, Z] must give the identical labels
    got = hcat.segment.pixel_vec_to_cell(
        np.moveaxis(vec, -1, 0)[None], mask[None, None]
    )
    np.testing.assert_array_equal(got, want)


def test_utils_pad_and_reconstruct_layouts(rng, tmp_path):
    import torch

    from hcat import utils as u
    from hcunet_tpu.infer.chunks import Part

    img = torch.from_numpy(rng.random((1, 4, 12, 12, 6)).astype(np.float32))
    padded = u.pad_image_with_reflections(img, (4, 4, 2))
    assert isinstance(padded, torch.Tensor)
    assert tuple(padded.shape) == (1, 4, 20, 20, 10)
    with pytest.raises(ValueError):
        u.pad_image_with_reflections(img, (3, 4, 2))  # odd pad

    part = Part.create(
        np.ones((8, 8, 4), np.float32),
        np.ones((8, 8, 4), np.int32), (0, 0),
    )
    part.save(str(tmp_path / "c.maskpart.npz"))
    assert u.reconstruct_mask(str(tmp_path)).shape == (1, 1, 8, 8, 4)
    assert u.reconstruct_segmented(str(tmp_path)).shape == (1, 1, 8, 8, 4)


@pytest.mark.slow
def test_train_frcnn_through_alias(tmp_path, rng):
    """train_rcnn.py's call shape (train_rcnn.py:68):
    ``model, summed_losses = hcat.train.frcnn(model, data, optimizer,
    scheduler, epochs, lr, gamma, device, scale=scale)``."""
    import hcat.train
    from hcat import dataloader, rcnn  # rcnn = the factory, as in the ref
    from hcat import transforms as t

    img = (rng.random((64, 64, 4)) * 255).astype(np.uint8)
    imwrite(str(tmp_path / "a.tif"), img)
    (tmp_path / "a.xml").write_text(
        "<annotation><object><name>OHC1</name><bndbox>"
        "<xmin>8</xmin><ymin>8</ymin><xmax>28</xmax><ymax>28</ymax>"
        "</bndbox></object></annotation>"
    )
    data = dataloader.Section(
        str(tmp_path), image_transforms=[t.to_float()], simple_class=True
    )
    model = rcnn(
        config=DetectorConfig(
            num_classes=2, max_detections=10, rpn_pre_nms_top_n=64,
            rpn_post_nms_top_n=16,
        ),
        backbone="small", image_hw=(64, 64),
    )
    model, summed = hcat.train.frcnn(
        model, data, None, None, 2, 1e-4, 0.9, None, scale=3
    )
    assert len(summed) == 2
    assert all(np.isfinite(s) for s in summed)
    # the trained weights landed back in the serving facade
    out = model(rng.random((1, 3, 64, 64)).astype(np.float32))
    assert isinstance(out, list) and len(out) == 1
