"""``hcat.train.train_utils`` — the target generators
(``/root/reference/hcat/train/train_utils.py``), as imported by the
preprocessing driver (``preprocess_manual_masks.py:10,16-19``):
``makeMask(erosion=True)``, ``makePWL()``, ``CalculateCenterOfMass()``,
``VectorToCenter()`` — callable class instances that read a color-coded
instance-mask tif (``[Z, Y, X, C]``) and emit the training targets.

Backed by the vectorized generators of :mod:`hcunet_tpu.train.targets`
(the reference's ``@njit`` triple loops re-done as array ops; the
reference-exact 63-ray PWL variant stays available as
``makePWL(ray_march=True)`` with a quantified delta — see
``train/targets.py``).
"""

import numpy as np

from hcunet_tpu.train import targets as _targets
from hcunet_tpu.train.targets import colors_to_labels  # noqa: F401


def _load_colormask(imagepath) -> np.ndarray:
    if isinstance(imagepath, np.ndarray):
        img = imagepath  # also accept an in-memory volume
    else:
        from hcunet_tpu.data.tiff import imread

        img = np.asarray(imread(imagepath))
    if img.ndim == 3:
        img = np.stack([img] * 3, axis=3)
    return img


def colormask_to_mask(colormask: np.ndarray) -> np.ndarray:
    """``train_utils.py:175-187``: color-coded instances → binary mask."""
    return (colors_to_labels(np.asarray(colormask)) != 0).astype(np.uint8)


class makePWL:
    """``train_utils.py:9-93``: U-Net paper pixel-wise weight map
    ``w0*exp(-(d1+d2)^2 / 2 sigma^2)``; returns float ``[Z, Y, X]``."""

    def __init__(self, ray_march: bool = False):
        self.ray_march = ray_march

    def __call__(self, imagepath) -> np.ndarray:
        return _targets.make_pwl(
            _load_colormask(imagepath), ray_march=self.ray_march
        )


class makeMask:
    """``train_utils.py:96-172``: background removal + inter-cell boundary
    stripping (+ optional per-z binary erosion); returns the cleaned color
    volume ``[Z, Y, X, C]``."""

    def __init__(self, erosion: bool = False):
        self.erosion = erosion

    def __call__(self, imagepath) -> np.ndarray:
        return _targets.make_mask(
            _load_colormask(imagepath), erosion=self.erosion
        )


class CalculateCenterOfMass:
    """``train_utils.py:190-237``: unique colors → integer ids; returns
    ``(center_of_mass [Z,Y,X] with the id painted at each cell's rounded
    COM, id_volume [Z,Y,X] uint32)``."""

    def __call__(self, imagepath):
        centers, labels = _targets.center_of_mass_target(
            _load_colormask(imagepath)
        )
        return centers, labels


class VectorToCenter:
    """``train_utils.py:240-274``: per-pixel (z, y, x) offset to the
    pixel's own cell center, normalized by the volume shape; returns
    ``[Z, Y, X, 3]``.  ``center``/``colormask`` are the two outputs of
    :class:`CalculateCenterOfMass`; ``mask`` is accepted for signature
    parity (unused, as in the reference)."""

    def __call__(self, center, colormask, mask=None) -> np.ndarray:
        return _targets.vector_to_center(
            np.asarray(center), np.asarray(colormask)
        )


__all__ = [
    "makePWL",
    "makeMask",
    "CalculateCenterOfMass",
    "VectorToCenter",
    "colormask_to_mask",
    "colors_to_labels",
]
