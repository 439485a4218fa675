"""Chunk spill/merge — the crash-resumable chunk store.

Rebuild of ``hcat/mask.py`` (``Part``) and
``hcat/utils.py:256-333`` (``reconstruct_mask``/``reconstruct_segmented``):
per-chunk records of (probability mask, instance mask, top-left location)
with null-compression for empty chunks, written to disk so a crashed
whole-cochlea run resumes mid-image, then reassembled with instance ids
renumbered across chunks.

Implementation notes: ``.npz`` instead of pickle (no arbitrary code on
load, compressed); renumbering is max-id offsetting exactly like
``utils.py:320-327``.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass
class Part:
    """One chunk's results.  ``mask``: [X, Y, Z] float/uint8 semantic mask;
    ``segmented_mask``: [X, Y, Z] int labels; ``loc``: global (x, y) of the
    chunk's top-left corner."""

    mask: Optional[np.ndarray]
    segmented_mask: Optional[np.ndarray]
    loc: Tuple[int, int]
    shape: Tuple[int, ...]
    mask_dtype: np.dtype

    @classmethod
    def create(cls, mask: np.ndarray, segmented_mask: np.ndarray, loc) -> "Part":
        return cls(
            mask=None if mask.sum() == 0 else mask,
            segmented_mask=None if segmented_mask.sum() == 0 else segmented_mask,
            loc=tuple(int(v) for v in loc),
            shape=tuple(mask.shape),
            mask_dtype=mask.dtype,
        )

    def dense_mask(self) -> np.ndarray:
        return self.mask if self.mask is not None else np.zeros(self.shape, self.mask_dtype)

    def dense_segmented(self) -> np.ndarray:
        return (
            self.segmented_mask
            if self.segmented_mask is not None
            else np.zeros(self.shape, np.int32)
        )

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            loc=np.asarray(self.loc),
            shape=np.asarray(self.shape),
            mask=self.mask if self.mask is not None else np.zeros(0, self.mask_dtype),
            segmented=self.segmented_mask
            if self.segmented_mask is not None
            else np.zeros(0, np.int32),
            dtype=str(np.dtype(self.mask_dtype)),
        )

    @classmethod
    def load(cls, path: str) -> "Part":
        with np.load(path, allow_pickle=False) as z:
            shape = tuple(int(v) for v in z["shape"])
            dtype = np.dtype(str(z["dtype"]))
            mask = z["mask"] if z["mask"].size else None
            seg = z["segmented"] if z["segmented"].size else None
            return cls(
                mask=mask,
                segmented_mask=seg,
                loc=tuple(int(v) for v in z["loc"]),
                shape=shape,
                mask_dtype=dtype,
            )


PART_EXT = ".maskpart.npz"


def _parts(path: str):
    files = sorted(glob.glob(os.path.join(path, f"*{PART_EXT}")))
    if not files:
        raise FileNotFoundError(f"no valid part files found under {path}")
    return [Part.load(f) for f in files]


def _canvas_shape(parts) -> Tuple[int, int, int]:
    x_max = max(p.loc[0] + p.shape[0] for p in parts)
    y_max = max(p.loc[1] + p.shape[1] for p in parts)
    z = parts[0].shape[-1]
    return x_max, y_max, z


def reconstruct_mask(path: str) -> np.ndarray:
    """Reassemble the semantic mask from spilled parts ([X, Y, Z])."""
    parts = _parts(path)
    X, Y, Z = _canvas_shape(parts)
    out = np.zeros((X, Y, Z), parts[0].mask_dtype)
    for p in parts:
        x, y = p.loc
        out[x : x + p.shape[0], y : y + p.shape[1], :] = p.dense_mask()
    return out


def reconstruct_segmented(path: str) -> np.ndarray:
    """Reassemble the instance mask, renumbering ids across chunks
    (``utils.py:294-333``)."""
    parts = _parts(path)
    X, Y, Z = _canvas_shape(parts)
    out = np.zeros((X, Y, Z), np.int64)
    max_id = 0
    for p in parts:
        x, y = p.loc
        seg = p.dense_segmented().astype(np.int64)
        seg[seg != 0] += max_id
        out[x : x + p.shape[0], y : y + p.shape[1], :] = seg
        max_id = int(out.max())
    return out
