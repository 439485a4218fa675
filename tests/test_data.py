"""Data layer tests: transforms semantics + dataset contracts on synthetic
tif fixtures."""

import numpy as np
import pytest

from hcunet_tpu.data import transforms as t
from hcunet_tpu.data.datasets import RecursiveStack, Section, Stack
from hcunet_tpu.data.tiff import imread, imwrite


def test_to_float_ranges():
    tr = t.to_float()
    a = tr(np.array([[0, 255]], np.uint8))
    assert a.max() <= 1.0 and a.dtype == np.float64
    b = tr(np.array([[0, 2**16 - 1]], np.uint16))
    assert b.max() < 1.0
    with pytest.raises(TypeError):
        tr(np.array([[1]], np.int32))


def test_reshape_swaps_skimage_layout():
    zyxc = np.zeros((5, 7, 9, 4))
    out = t.reshape()(zyxc)
    assert out.shape == (9, 7, 5, 4)
    yxc = np.zeros((7, 9, 3))
    assert t.reshape()(yxc).shape == (9, 7, 3)


def test_joint_transforms_apply_identically(rng):
    imgs = [rng.random((20, 20, 6, 4)), rng.random((20, 20, 6, 1))]
    crop = t.random_crop([8, 8, 4])
    a, b = crop(list(imgs), np.random.default_rng(0))
    assert a.shape == (8, 8, 4, 4) and b.shape == (8, 8, 4, 1)
    # same crop offsets: re-run with same generator seed and compare regions
    a2, b2 = crop(list(imgs), np.random.default_rng(0))
    np.testing.assert_array_equal(a, a2)
    np.testing.assert_array_equal(b, b2)


def test_random_crop_small_z_fallback(rng):
    img = rng.random((30, 30, 3, 4))
    out = t.random_crop([8, 8, 24])(img, np.random.default_rng(1))
    assert out.shape == (8, 8, 3, 4)


def test_nul_crop_removes_empty_rows(rng):
    img = rng.random((10, 12, 3, 4))
    mask = np.zeros((10, 12, 3, 1))
    mask[2:5, 3:9] = 1.0
    pwl = rng.random((10, 12, 3, 1))
    a, m, p = t.nul_crop(rate=1.0)([img, mask, pwl], np.random.default_rng(0))
    assert m.shape[0] == 3 and m.shape[1] == 6
    assert a.shape[:2] == m.shape[:2] == p.shape[:2]


def test_elastic_deform_mask_stays_binary(rng):
    img = rng.random((24, 24, 6, 4))
    mask = (rng.random((24, 24, 6, 1)) > 0.5).astype(np.float64)
    a, m = t.elastic_deform(grid_shape=(4, 4, 3), scale=3)(
        [img, mask], np.random.default_rng(2)
    )
    assert set(np.unique(m)) <= {0.0, 1.0}  # order-0 keeps labels crisp
    assert a.shape == img.shape


def test_intensity_transforms_bounds(rng):
    img = rng.random((8, 8, 4, 4))
    g = np.random.default_rng(0)
    assert t.spekle(0.1)(img, g).max() <= 1.0
    assert t.random_gamma((0.7, 1.3))(img, g).shape == img.shape
    out = t.random_intensity((-15, 15))(img, g)
    assert out.min() >= 0.0
    dropped = t.drop_channel(1.0)(img, np.random.default_rng(3))
    assert (dropped == 0).all(axis=(0, 1, 2)).any()
    norm = t.normalize([0.5] * 4, [0.5] * 4)(img)
    assert norm.min() >= -1.0 and norm.max() <= 1.0


def test_flip_transforms_box_remap():
    img = np.zeros((20, 30, 3))
    boxes = [[2, 3, 10, 8]]  # x1,y1,x2,y2 with x horizontal=axis1
    labels = [4]
    im2, b2, l2 = t.random_x_flip(rate=1.0)(img, boxes, labels, np.random.default_rng(0))
    assert b2 == [[2, 12, 10, 17]]  # y-coords flipped about shape[0]=20
    assert l2 == [4]
    im3, b3, l3 = t.random_y_flip(rate=1.0)(img, boxes, labels, np.random.default_rng(0))
    assert b3 == [[20, 3, 28, 8]]  # x-coords flipped about shape[1]=30
    assert l3 == [4]


def test_junk_image_keeps_labels_aligned(rng):
    """When a pasted junk region drops a box, the dropped box's *own* label
    must go with it (labels previously truncated from the end)."""
    junk = rng.random((60, 60, 3))
    tr = t.add_junk_image([junk], junk_image_size=(20, 20))
    img = rng.random((80, 80, 3))
    boxes = [[5, 5, 12, 12], [40, 40, 50, 50], [65, 65, 75, 75]]
    labels = [1, 4, 2]
    # try several seeds until exactly one box is dropped
    for seed in range(50):
        im2, b2, l2 = tr(img.copy(), list(boxes), list(labels),
                         np.random.default_rng(seed))
        if len(b2) == 2:
            kept_pairs = {(tuple(b), l) for b, l in zip(b2, l2)}
            orig_pairs = {(tuple(b), l) for b, l in zip(boxes, labels)}
            assert kept_pairs <= orig_pairs
            break
    else:
        raise AssertionError("no seed dropped exactly one box")


def test_tiff_roundtrip(tmp_path):
    vol = (np.random.default_rng(0).random((5, 16, 17)) * 255).astype(np.uint8)
    p = str(tmp_path / "v.tif")
    imwrite(p, vol)
    back = imread(p)
    np.testing.assert_array_equal(back, vol)


def test_tiff_imagej_hyperstack_roundtrip(tmp_path):
    """uint16 4-channel z-stack round-trips through the ImageJ hyperstack
    page layout (Z·C grayscale pages, channel fastest) — the reference's
    actual confocal input format (hcat/dataloader.py:40-63)."""
    from PIL import Image, ImageSequence

    vol = (np.random.default_rng(1).random((5, 18, 14, 4)) * 65535).astype(
        np.uint16
    )
    p = str(tmp_path / "hyper.tif")
    imwrite(p, vol)

    # on-disk structure: 20 single-channel pages + ImageJ description
    with Image.open(p) as im:
        desc = im.tag_v2[270]
        frames = [np.asarray(f.copy()) for f in ImageSequence.Iterator(im)]
    assert "ImageJ" in desc and "channels=4" in desc and "slices=5" in desc
    assert len(frames) == 20 and frames[0].ndim == 2
    assert frames[0].dtype == np.uint16
    # channel-fastest interleave: page k is (z=k//4, c=k%4)
    np.testing.assert_array_equal(frames[6], vol[1, :, :, 2])

    back = imread(p)
    assert back.dtype == np.uint16 and back.shape == vol.shape
    np.testing.assert_array_equal(back, vol)


def test_tiff_hyperstack_externally_authored(tmp_path):
    """Reads a hyperstack whose description came from another writer
    (extra keys, \\r\\n line endings, byte-typed tag)."""
    from PIL import Image

    vol = (np.random.default_rng(2).random((3, 10, 11, 2)) * 65535).astype(
        np.uint16
    )
    planes = np.moveaxis(vol, -1, 1).reshape(6, 10, 11)
    pages = [Image.fromarray(pl) for pl in planes]
    desc = (
        "ImageJ=1.51s\r\nimages=6\r\nchannels=2\r\nslices=3\r\nframes=1\r\n"
        "hyperstack=true\r\nunit=micron\r\nspacing=1.0\r\n"
    )
    p = str(tmp_path / "ext.tif")
    pages[0].save(p, save_all=True, append_images=pages[1:], tiffinfo={270: desc})
    back = imread(p)
    np.testing.assert_array_equal(back, vol)


def test_stack_dataset_from_hyperstack_tiffs(tmp_path, rng):
    """End-to-end: uint16 hyperstack triplets on disk → Stack → correct
    [Z,Y,X,C] samples (guards against page/channel interleave mistakes
    corrupting everything downstream)."""
    img = (rng.random((4, 24, 20, 4)) * 65535).astype(np.uint16)
    mask = (rng.random((4, 24, 20)) > 0.5).astype(np.uint8)
    pwl = (rng.random((4, 24, 20)) * 255).astype(np.uint8)
    imwrite(str(tmp_path / "s0.tif"), img)
    imwrite(str(tmp_path / "s0.mask.tif"), mask)
    imwrite(str(tmp_path / "s0.pwl.tif"), pwl)
    ds = Stack(str(tmp_path), joint_transforms=[t.to_float()])
    sample_img, sample_mask, _ = ds[0]
    assert sample_img.shape == (1, 4, 24, 20, 4)
    np.testing.assert_allclose(
        sample_img[0], img.astype(np.float32) / 65535, atol=1e-4
    )
    np.testing.assert_array_equal(sample_mask[0, ..., 0] > 0, mask > 0)


@pytest.fixture
def stack_dir(tmp_path, rng):
    """Synthetic [Z,Y,X,C] triplets in the reference's file convention."""
    for i in range(2):
        img = (rng.random((4, 24, 20, 4)) * 65535).astype(np.uint16)
        mask = (rng.random((4, 24, 20)) > 0.5).astype(np.uint8)
        pwl = (rng.random((4, 24, 20)) * 255).astype(np.uint8)
        np.save(tmp_path / f"s{i}.npy", img)
        np.save(tmp_path / f"s{i}.mask.npy", mask)
        np.save(tmp_path / f"s{i}.pwl.npy", pwl)
    return str(tmp_path)


def test_stack_dataset(stack_dir):
    ds = Stack(
        stack_dir,
        joint_transforms=[t.to_float(), t.reshape(), t.random_crop([16, 16, 4])],
        image_transforms=[t.normalize([0.5] * 4, [0.5] * 4)],
    )
    assert len(ds) == 2
    img, mask, pwl = ds[0]
    assert img.shape == (1, 16, 16, 4, 4)
    assert mask.shape == (1, 16, 16, 4, 1)
    assert pwl.shape == (1, 16, 16, 4, 1)


def test_stack_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        Stack(str(tmp_path))


def test_section_dataset(tmp_path, rng):
    img = (rng.random((30, 40, 4)) * 255).astype(np.uint8)
    imwrite(str(tmp_path / "a.tif"), img)
    xml = """<annotation>
      <object><name>OHC1</name><bndbox><xmin>1</xmin><ymin>2</ymin><xmax>10</xmax><ymax>12</ymax></bndbox></object>
      <object><name>IHC</name><bndbox><xmin>5</xmin><ymin>6</ymin><xmax>15</xmax><ymax>16</ymax></bndbox></object>
    </annotation>"""
    (tmp_path / "a.xml").write_text(xml)
    ds = Section(
        str(tmp_path),
        image_transforms=[t.to_float()],
        simple_class=True,
    )
    img_out, target = ds[0]
    assert target["boxes"].shape == (2, 4)
    np.testing.assert_array_equal(target["labels"], [1, 2])


def test_recursive_stack(stack_dir, tmp_path, rng):
    import pickle

    # add com + vec files next to the stack fixtures
    import glob as g
    import os

    for f in g.glob(os.path.join(stack_dir, "*.mask.npy")):
        stem = f[: -len(".mask.npy")]
        com = np.zeros((4, 24, 20), np.uint16)
        from hcunet_tpu.data.tiff import imwrite as iw

        iw(stem + ".labels.com.tif", com)
        vec = np.zeros((4, 24, 20, 3), np.float32)
        with open(stem + ".labels.vector.pkl", "wb") as fh:
            pickle.dump(vec, fh)
    ds = RecursiveStack(stack_dir, joint_transforms=[t.to_float(), t.reshape()])
    out = ds[0]
    assert len(out) == 5
    assert out[0].shape[0] == 1 and out[3].shape[-1] == 1 and out[4].shape[-1] == 3
