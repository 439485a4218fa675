"""Trainer, target-generator, vector-clustering and checkpoint tests."""

import numpy as np
import pytest

from hcunet_tpu.config import UNetConfig


def _color_volume():
    """[Z,Y,X,C] color-coded instance mask with two touching cells."""
    img = np.zeros((3, 20, 20, 3), np.uint8)
    img[:, :, :] = [10, 10, 10]  # background color
    img[:, 4:10, 4:10] = [200, 0, 0]
    img[:, 10:16, 4:10] = [0, 200, 0]  # touches the red cell at y=10
    return img


def test_colors_to_labels_and_make_mask():
    from hcunet_tpu.train.targets import colors_to_labels, make_mask

    img = _color_volume()
    labels = colors_to_labels(img)
    assert set(np.unique(labels)) == {0, 1, 2} or len(set(np.unique(labels))) == 3

    cleaned = make_mask(img)
    lab2 = colors_to_labels(cleaned)
    # the touching boundary rows must have been stripped to background
    assert (lab2[:, 9, 4:10] == 0).all() or (lab2[:, 10, 4:10] == 0).all()
    # background color is now literal zero
    assert (cleaned[0, 0, 0] == 0).all()


def test_make_pwl_peaks_between_cells():
    from hcunet_tpu.train.targets import make_pwl

    img = _color_volume()
    pwl = make_pwl(img)
    assert pwl.shape == (3, 20, 20)
    # weight is zero on cells, positive between them
    assert pwl[:, 5, 5].max() == 0
    between = pwl[:, 9:11, 2].max()  # just outside the touching boundary col
    far = pwl[0, 0, 0]
    assert pwl.max() > 0
    assert far < pwl.max()
    # max should occur near the inter-cell boundary
    z, y, x = np.unravel_index(pwl.argmax(), pwl.shape)
    assert 8 <= y <= 12


def _ray_march_loop(labels2d, w0=11.0, sigma=5.0):
    """Literal transcription of the reference's find_closest ray march
    (hcat/train/train_utils.py:62-93) over a 2D label slice — the slow
    oracle for make_pwl_ray_march."""
    pad = 9
    sl = np.pad(labels2d, pad)
    out = np.zeros(labels2d.shape, np.float64)
    angles = np.linspace(0, 2 * np.pi, 63)
    for y in range(labels2d.shape[0]):
        for x in range(labels2d.shape[1]):
            if labels2d[y, x] != 0:
                continue
            closest = 0
            lens = []
            w = 0.0
            for l in np.arange(1, 10):
                for theta in angles:
                    dx = int(np.rint(l * np.cos(theta)))
                    dy = int(np.rint(l * np.sin(theta)))
                    hit = sl[pad + y + dy, pad + x + dx]
                    if hit != 0:
                        if closest == 0:
                            closest = hit
                            lens.append(l)
                        elif hit != closest:
                            lens.append(l)
                            w = w0 * np.exp(
                                -((lens[0] + lens[1]) ** 2) / (2 * sigma**2)
                            )
                            break
                if w:
                    break
            out[y, x] = w
    return out


def test_make_pwl_ray_march_matches_reference_loop(rng):
    """Vectorized ray-march PWL == literal transcription of the
    reference's numba triple loop, on random multi-cell slices."""
    from hcunet_tpu.train.targets import make_pwl_ray_march

    for seed in range(3):
        r = np.random.default_rng(seed)
        lab = np.zeros((24, 24), np.int32)
        for i in range(1, 5):
            cy, cx = r.integers(3, 21, 2)
            lab[max(0, cy - 3) : cy + 3, max(0, cx - 3) : cx + 3] = i
        color = np.zeros((1,) + lab.shape + (3,), np.uint8)
        color[0, ..., 0] = lab * 40  # distinct colors per label
        got = make_pwl_ray_march(color)
        want = _ray_march_loop(lab)
        np.testing.assert_allclose(got[0], want, atol=1e-12)


def test_make_pwl_edt_vs_ray_march_delta():
    """Quantifies the exact-EDT make_pwl against the reference's 63-ray
    march (VERDICT r1 item 7).  The ray march quantizes distance to
    integer radii ≤9 along 63 angles, so it *overestimates* d1+d2 and
    truncates the weight tail; the EDT map is a strict refinement.  The
    bound asserted here (mean |Δ| and support agreement near the peak)
    documents the training-target delta."""
    from hcunet_tpu.train.targets import make_pwl, make_pwl_ray_march

    img = _color_volume()
    edt = make_pwl(img)
    ray = make_pwl_ray_march(img)
    assert edt.shape == ray.shape
    # same support class: both peak at the stripped inter-cell boundary
    ze, ye, xe = np.unravel_index(edt.argmax(), edt.shape)
    zr, yr, xr = np.unravel_index(ray.argmax(), ray.shape)
    assert abs(ye - yr) <= 1 and abs(xe - xr) <= 2
    # peak magnitudes agree within the ray-quantization error
    assert abs(edt.max() - ray.max()) < 2.0
    # mean absolute delta over background is small relative to w0=11
    bg = (img != img[0, 0, 0]).any(-1) == 0
    delta = np.abs(edt - ray)[bg]
    assert delta.mean() < 0.25, delta.mean()


def test_com_and_vector_targets():
    from hcunet_tpu.train.targets import (
        center_of_mass_target,
        colors_to_labels,
        vector_to_center,
    )

    img = _color_volume()
    centers, labels = center_of_mass_target(img)
    ids = set(np.unique(centers)) - {0}
    assert len(ids) == 2
    vec = vector_to_center(centers, labels)
    assert vec.shape == labels.shape + (3,)
    # at the painted center the offset is ~0
    for i in ids:
        z, y, x = np.argwhere(centers == i)[0]
        assert abs(vec[z, y, x]).max() < 0.1
    # offsets normalized by shape
    assert np.abs(vec).max() <= 1.0


def test_preprocess_volume_roundtrip(tmp_path):
    from hcunet_tpu.data.tiff import imwrite
    from hcunet_tpu.train.targets import preprocess_volume

    img = _color_volume()
    p = str(tmp_path / "vol.labels.tif")
    imwrite(p, img)
    centers, labels, vec = preprocess_volume(p)
    import os

    assert os.path.exists(str(tmp_path / "vol.labels.com.tif"))
    assert os.path.exists(str(tmp_path / "vol.labels.vector.pkl"))


def test_pixel_vec_to_cell_two_cells():
    from hcunet_tpu.infer.vector_cluster import pixel_vec_to_cell

    X, Y, Z = 30, 30, 6
    mask = np.zeros((X, Y, Z))
    vec = np.zeros((X, Y, Z, 3))
    for cx, cy in [(8, 8), (22, 22)]:
        for dx in range(-3, 4):
            for dy in range(-3, 4):
                mask[cx + dx, cy + dy, 2:4] = 1.0
                # vector channels ordered (z, y, x)
                vec[cx + dx, cy + dy, 2:4, 2] = -dx
                vec[cx + dx, cy + dy, 2:4, 1] = -dy
    labels = pixel_vec_to_cell(vec, mask, num_peaks=10)
    ids = set(np.unique(labels)) - {0}
    assert len(ids) >= 2
    assert labels[8, 8, 3] != labels[22, 22, 3] != 0


def test_unet_trainer_loss_decreases(rng):
    import jax

    from hcunet_tpu.models.unet import init_unet
    from hcunet_tpu.train.trainer import TrainConfig, UNetTrainer

    cfg = UNetConfig(
        feature_sizes=(8, 16), kernel1=(3, 3, 2), kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), groups=1,
    )
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (32, 32, 6))
    img = rng.random((1, 32, 32, 6, 4)).astype(np.float32)
    mask = (rng.random((1, 32, 32, 6, 1)) > 0.7).astype(np.float32)
    pwl = np.ones_like(mask)

    trainer = UNetTrainer(model, variables, TrainConfig(learning_rate=1e-2, log_every=0))
    losses = trainer.fit([(img, mask, pwl)], epochs=8)
    assert losses[-1] < losses[0]


def test_trainer_checkpoint_roundtrip(tmp_path, rng):
    import jax

    from hcunet_tpu.models.unet import UNet, init_unet
    from hcunet_tpu.train.trainer import TrainConfig, UNetTrainer
    from hcunet_tpu.utils.checkpoint import load_unet

    cfg = UNetConfig(
        feature_sizes=(8, 16), kernel1=(3, 3, 2), kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), groups=1,
    )
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (32, 32, 6))
    trainer = UNetTrainer(model, variables, TrainConfig(log_every=0))
    p = str(tmp_path / "model.hcunet")
    trainer.save(p)

    model2, vars2, hyper = load_unet(p)
    assert model2.config == cfg
    assert "learning_rate" in hyper
    x = rng.random((1, 32, 32, 6, 4)).astype(np.float32)
    a = model.apply(variables, x, train=False)
    b = model2.apply(vars2, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # source snapshot present
    import zipfile

    with zipfile.ZipFile(p) as z:
        names = z.namelist()
    assert any(n.startswith("sources/") and n.endswith("unet.py") for n in names)


def test_recurrent_trainer_runs(rng):
    import jax

    from hcunet_tpu.config import RDCNetConfig
    from hcunet_tpu.models.rdcnet import RDCNet
    from hcunet_tpu.train.trainer import RecurrentTrainer, TrainConfig

    model = RDCNet(RDCNetConfig(timesteps=2))
    x = rng.random((1, 16, 16, 4, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    mask = (rng.random((1, 16, 16, 4, 1)) > 0.5).astype(np.float32)
    pwl = np.ones_like(mask)
    vec = rng.random((1, 16, 16, 4, 3)).astype(np.float32)
    ds = [(x, mask, pwl, None, vec)]
    trainer = RecurrentTrainer(model, dict(variables), TrainConfig(learning_rate=1e-3))
    losses = trainer.fit(ds, epochs=3)
    assert len(losses) == 3 and np.isfinite(losses).all()


def test_random_affine_and_distance_transform(rng):
    from hcunet_tpu.data import transforms as t

    imgs = [rng.random((16, 16, 4, 4)), (rng.random((16, 16, 4, 1)) > 0.5).astype(float)]
    a, m = t.random_affine(0.3)(list(imgs), np.random.default_rng(0))
    assert a.shape == imgs[0].shape
    assert set(np.unique(m)) <= {0.0, 1.0}

    binary = (rng.random((3, 20, 20)) > 0.6).astype(np.uint8)
    d = t.distance_transform(binary)
    assert d.shape == binary.shape and d.max() > 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.distance_transform(binary.astype(np.float32))


def test_generic_load_model(tmp_path, rng):
    import jax

    from hcunet_tpu.config import RDCNetConfig
    from hcunet_tpu.models.rdcnet import RDCNet
    from hcunet_tpu.utils.checkpoint import load_model, save_checkpoint

    cfg = RDCNetConfig(timesteps=2)
    model = RDCNet(cfg)
    x = rng.random((1, 16, 16, 4, 4)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    p = str(tmp_path / "rdc.hcunet")
    save_checkpoint(p, dict(variables), cfg, snapshot_sources=False)
    model2, v2, _ = load_model(p)
    assert isinstance(model2, RDCNet) and model2.config == cfg
    a = model.apply(variables, x)
    b = model2.apply(v2, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_viz_helpers(rng):
    import matplotlib

    matplotlib.use("Agg")
    from hcunet_tpu.analysis.viz import (
        construct_instance_mask,
        labels_to_rgb,
        show_box_pred,
    )
    from hcunet_tpu.analysis.haircell import HairCell

    ax = show_box_pred(
        rng.random((32, 32)),
        {"boxes": np.array([[4, 4, 12, 12]]), "scores": np.array([0.95]),
         "labels": np.array([1])},
    )
    assert ax is not None

    cell = HairCell([2, 2, 0, 8, 8, 2], [5, 5, 1], unique_id=1)
    vol = np.zeros((16, 16, 3))
    inst = construct_instance_mask([cell], vol)
    assert inst[3, 3, 1] == 1
    rgb = labels_to_rgb(inst[..., 1])
    assert rgb.shape == (16, 16, 4)


def test_cli_recurrent_train_and_predict_end_to_end(tmp_path, rng):
    """`hcunet preprocess` -> `train-recurrent` -> `predict-recurrent`:
    the recurrent family's full product path (targets from color masks,
    RecursiveStack recipe, checkpoint save/load, packed recurrent
    serving)."""
    import os

    from hcunet_tpu.cli import main as cli_main
    from hcunet_tpu.data.tiff import imwrite

    Z, Y, X = 6, 40, 36
    img = (rng.random((Z, Y, X, 4)) * 65535).astype(np.uint16)
    mask = np.zeros((Z, Y, X), np.uint8)
    mask[:, 8:16, 8:16] = 255  # on-disk masks are 0/255 like the reference's
    pwl = np.full((Z, Y, X), 40, np.uint8)
    color = np.zeros((Z, Y, X, 3), np.uint8)
    color[...] = [10, 10, 10]
    color[:, 8:16, 8:16] = [200, 0, 0]
    color[:, 22:30, 20:28] = [0, 200, 0]
    data = tmp_path / "data"
    data.mkdir()
    imwrite(str(data / "s0.tif"), img)
    imwrite(str(data / "s0.mask.tif"), mask)
    imwrite(str(data / "s0.pwl.tif"), pwl)
    imwrite(str(data / "s0.labels.tif"), color)

    assert cli_main(["preprocess", str(data)]) == 0
    assert (data / "s0.labels.com.tif").exists()
    assert (data / "s0.labels.vector.pkl").exists()

    ckpt = str(tmp_path / "runet.hcunet")
    assert cli_main([
        "train-recurrent", str(data), "--model", "runet", "--out", ckpt,
        "--epochs", "1", "--crop", "24", "24", "6", "--timesteps", "2",
    ]) == 0
    assert os.path.exists(ckpt)

    out_dir = str(tmp_path / "pred")
    assert cli_main([
        "predict-recurrent", str(data / "s0.tif"),
        "--checkpoint", ckpt, "--out-dir", out_dir,
    ]) == 0
    out = np.load(os.path.join(out_dir, "s0.recurrent.npy"))
    # [X, Y, Z, out_channels=5] head stack for the volume
    assert out.shape == (X, Y, Z, 5)
    assert np.isfinite(out).all()
