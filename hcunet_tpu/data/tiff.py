"""Minimal multi-page TIFF IO built on PIL.

The reference leans on ``skimage.io.imread`` (tifffile underneath) which is
not in this environment; PIL reads/writes multipage TIFFs fine for the
confocal exports this pipeline consumes.  Layout convention on disk follows
the reference/skimage: 3D stacks are ``[Z, Y, X, C]`` (or ``[Z, Y, X]``),
2D images ``[Y, X, C]``.

``.npy``/``.npz`` paths pass straight through to numpy — convenient for
synthetic fixtures and faster for large volumes.
"""

from __future__ import annotations


import numpy as np


def imread(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return z[list(z.files)[0]]
    from PIL import Image, ImageSequence

    with Image.open(path) as im:
        frames = [np.asarray(f.copy()) for f in ImageSequence.Iterator(im)]
    if len(frames) == 1:
        return frames[0]
    return np.stack(frames, axis=0)


def imwrite(path: str, array: np.ndarray) -> None:
    if path.endswith(".npy"):
        np.save(path, array)
        return
    from PIL import Image

    arr = np.asarray(array)
    if arr.ndim == 2 or (arr.ndim == 3 and arr.shape[-1] in (1, 3, 4)):
        Image.fromarray(_to_pil_compatible(arr)).save(path)
        return
    # multipage: leading axis = pages
    pages = [Image.fromarray(_to_pil_compatible(a)) for a in arr]
    pages[0].save(path, save_all=True, append_images=pages[1:])


def _to_pil_compatible(a: np.ndarray) -> np.ndarray:
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    if a.dtype == np.int64 or a.dtype == np.int32:
        return a.astype(np.int32)
    if a.dtype in (np.float64,):
        return a.astype(np.float32)
    return a
