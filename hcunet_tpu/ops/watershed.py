"""Seeded watershed — ctypes binding of the native priority-flood kernel.

Replaces ``skimage.segmentation.watershed`` as called by the instance
segmenter (``hcat/segment.py:468-471``): seeded, mask-limited, connectivity
1 (faces), compactness, watershed_line.  The implementation lives in
``native/watershed.cpp`` (built on demand with g++); watershed is an
inherently sequential priority-flood, so the exact version runs on host —
the bounded-iteration on-device approximation lives in
:mod:`hcunet_tpu.ops.watershed_jax`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libhcunet_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.watershed3d.restype = ctypes.c_int
        lib.watershed3d.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
        ]
        lib.label3d.restype = ctypes.c_int
        lib.label3d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.instance_tile3d.restype = ctypes.c_int
        lib.instance_tile3d.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
        ]
        _lib = lib
        return lib


def _as3d(a: np.ndarray) -> np.ndarray:
    return a[..., None] if a.ndim == 2 else a


def watershed(
    image: np.ndarray,
    markers: np.ndarray,
    mask: Optional[np.ndarray] = None,
    connectivity: int = 1,
    compactness: float = 0.0,
    watershed_line: bool = False,
) -> np.ndarray:
    """Flood ``image`` ascending from ``markers`` (int labels), returning the
    int32 label volume.  2D or 3D, [X, Y(, Z)]."""
    lib = _load()
    squeeze = image.ndim == 2
    img = np.ascontiguousarray(_as3d(np.asarray(image)), np.float64)
    out = np.ascontiguousarray(_as3d(np.asarray(markers)), np.int32).copy()
    if mask is None:
        msk = np.ones(img.shape, np.uint8)
    else:
        msk = np.ascontiguousarray(_as3d(np.asarray(mask)) != 0).astype(np.uint8)
    if out.min() < 0:
        raise ValueError("marker labels must be positive integers")
    if img.shape != out.shape or img.shape != msk.shape:
        raise ValueError(
            f"shape mismatch: image {img.shape}, markers {out.shape}, mask {msk.shape}"
        )
    dims = np.asarray(img.shape, np.int64)
    rc = lib.watershed3d(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        msk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(connectivity),
        float(compactness),
        int(bool(watershed_line)),
    )
    if rc != 0:
        raise RuntimeError(f"watershed3d failed with code {rc}")
    return out[..., 0] if squeeze else out


def instance_tile(
    distance: np.ndarray,
    binary: np.ndarray,
    seed: np.ndarray,
    *,
    expand_z: int,
    expand_mask: int,
    distance_floor: float,
    seed_background_below: float,
    connectivity: int = 1,
    compactness: float = 0.0,
    watershed_line: bool = True,
) -> np.ndarray:
    """Fused per-tile instance step (``hcat/segment.py:444-480``) — the exact
    equivalent of: z-replicate ``distance``/``seed``/``binary`` by
    ``expand_z``, floor the height, dilate the mask ``expand_mask`` times
    (cross structuring element), background-seed below
    ``seed_background_below``, run the compact seeded watershed with lines on
    ``-distance``, and decimate z back — but without materializing any of the
    float64 expanded volumes (only the expanded int32 labels + uint8 mask
    live natively, transiently).

    All inputs are UNEXPANDED ``[X, Y, Z]``.  Returns int32 labels (line
    pixels 0); background label 1 is kept (the caller zeroes it, matching
    ``segment.py:475``).
    """
    lib = _load()
    img = np.ascontiguousarray(np.asarray(distance), np.float64)
    msk = np.ascontiguousarray(np.asarray(binary) != 0).astype(np.uint8)
    sd = np.ascontiguousarray(np.asarray(seed), np.int32)
    if img.shape != msk.shape or img.shape != sd.shape or img.ndim != 3:
        raise ValueError(
            f"shape mismatch: distance {img.shape}, binary {msk.shape}, "
            f"seed {sd.shape}"
        )
    out = np.zeros(img.shape, np.int32)
    dims = np.asarray(img.shape, np.int64)
    rc = lib.instance_tile3d(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        msk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sd.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(expand_z),
        int(expand_mask),
        float(distance_floor),
        float(seed_background_below),
        int(connectivity),
        float(compactness),
        int(bool(watershed_line)),
    )
    if rc != 0:
        raise RuntimeError(f"instance_tile3d failed with code {rc}")
    return out


def label(binary: np.ndarray) -> tuple[np.ndarray, int]:
    """Connected components (face connectivity). Returns (labels, count)."""
    lib = _load()
    squeeze = binary.ndim == 2
    b = np.ascontiguousarray(_as3d(np.asarray(binary)) != 0).astype(np.uint8)
    out = np.zeros(b.shape, np.int32)
    dims = np.asarray(b.shape, np.int64)
    n = lib.label3d(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return (out[..., 0] if squeeze else out), int(n)
