"""``hcat.transforms`` — the reference's augmentation classes
(``/root/reference/hcat/transforms.py``), as imported by the drivers:
``from hcat import ... transforms as t`` (``train_rcnn.py:6``),
``import hcat.transforms as t`` (``valscripts/main_func.py:2``).

Same class names and constructor keywords; instances plug into the alias
:mod:`hcat.dataloader` datasets.  One design divergence, documented in
SURVEY §7.3: randomness comes from an explicit ``np.random.Generator`` the
dataset threads through each call (replacing the reference's
``@joint_transform`` global-seed trick, ``transforms.py:15-91``), so the
``rng`` parameter appears after the reference's positional arguments.
"""

import glob
import os

import numpy as np

from hcunet_tpu.data.transforms import (  # noqa: F401
    clean_image,
    drop_channel,
    elastic_deform,
    normalize,
    nul_crop,
    random_affine,
    random_crop,
    random_gamma,
    random_intensity,
    random_resize,
    random_rotate,
    random_x_flip,
    random_y_flip,
    remove_channel,
    reshape,
    spekle,
    to_float,
)
from hcunet_tpu.data.transforms import (  # noqa: F401
    distance_transform,
    to_batch,
)
from hcunet_tpu.data import transforms as _t


class to_tensor(to_batch):
    """``transforms.py:118-136``: [x, y, z, c] → batched [1, c, x, y, z]
    for torch.  Here: batched channels-LAST numpy (the TPU-native layout);
    the models consume it directly."""


class add_junk_image(_t.add_junk_image):
    """``transforms.py:634-725``: paste a random crop of a junk tif and
    drop overlapped boxes.  This alias accepts the reference's
    path-globbing constructor (``path=...`` of ``*.tif``) on top of the
    first-class array-based one."""

    def __init__(self, path, channel_index=(0, 2, 3),
                 junk_image_size=(100, 100), normalize=None):
        from hcunet_tpu.data.tiff import imread
        from hcunet_tpu.data.transforms import integer_unit_scale

        files = sorted(glob.glob(os.path.join(path, "*.tif")))
        if len(files) < 1:
            raise FileNotFoundError(f"No valid *.tif files found at {path}")
        images = []
        for f in files:
            img = np.asarray(imread(f))
            if np.issubdtype(img.dtype, np.integer):
                img = img.astype(np.float32) / integer_unit_scale(img.dtype)
            if img.ndim == 3 and img.shape[-1] > len(channel_index):
                img = img[..., list(channel_index)]
            if isinstance(normalize, dict):
                img = (img - np.asarray(normalize["mean"])) / np.asarray(
                    normalize["std"]
                )
            images.append(img.astype(np.float32))
        super().__init__(images, junk_image_size=junk_image_size)


__all__ = [
    "to_float",
    "reshape",
    "to_tensor",
    "to_batch",
    "clean_image",
    "spekle",
    "random_gamma",
    "normalize",
    "drop_channel",
    "random_intensity",
    "random_rotate",
    "random_crop",
    "elastic_deform",
    "random_affine",
    "nul_crop",
    "random_x_flip",
    "random_y_flip",
    "random_resize",
    "remove_channel",
    "add_junk_image",
    "distance_transform",
]
