"""Reflection padding for tiled valid-conv inference.

TPU-native counterpart of ``hcat/utils.py:33-74`` (pad_image_with_reflections),
which mirror-pads a ``[B, C, X, Y, Z]`` torch tensor one axis at a time via
numpy reverse slices.  Here it is a single ``jnp.pad(mode="reflect")`` —
XLA fuses it and it runs on device, channels-last.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def reflection_pad(x: jnp.ndarray, pad_size: Sequence[int]) -> jnp.ndarray:
    """Mirror-pad the spatial axes of a channels-last array.

    ``x`` is ``[B, *spatial, C]``; ``pad_size`` has one entry per spatial
    axis and each face of axis *i* gains ``pad_size[i]`` voxels.

    Matches the reference's convention: the reflection excludes the edge
    sample's mirror partner being itself (``image[pad-1::-1]`` — i.e. edge
    voxel *is* repeated in reverse order starting at index pad-1, which is
    numpy/jnp ``mode="symmetric"``... see note below).

    The reference (``utils.py:52-55``) uses ``image[:, :, pad-1::-1]`` for the
    leading face: indices ``pad-1, pad-2, ..., 0`` — the edge voxel is
    *included* in the mirror.  That is ``mode="symmetric"``, not numpy's
    ``"reflect"``.  We replicate ``"symmetric"`` for parity.

    The reference also demands even pads (``utils.py:45-47``); that
    restriction is an artifact of its crop arithmetic and is not needed here,
    but we validate pads are non-negative and no larger than the axis size
    (a hard constraint of single-pass symmetric padding).
    """
    spatial = x.shape[1:-1]
    if len(pad_size) != len(spatial):
        raise ValueError(
            f"pad_size {tuple(pad_size)} does not match spatial rank {len(spatial)}"
        )
    for p, s in zip(pad_size, spatial):
        if p < 0:
            raise ValueError(f"negative pad {p}")
        if p > s:
            raise ValueError(f"pad {p} larger than axis size {s}")
    widths = [(0, 0)] + [(int(p), int(p)) for p in pad_size] + [(0, 0)]
    return jnp.pad(x, widths, mode="symmetric")


def reflection_pad_np(x: np.ndarray, pad_size: Sequence[int]) -> np.ndarray:
    """Host-side variant of :func:`reflection_pad` for numpy arrays."""
    spatial = x.shape[1:-1]
    widths = [(0, 0)] + [(int(p), int(p)) for p in pad_size] + [(0, 0)]
    return np.pad(x, widths, mode="symmetric")


def pad_to_shape(
    x: jnp.ndarray, target_spatial: Sequence[int], mode: str = "symmetric"
) -> jnp.ndarray:
    """Right-pad the spatial axes of ``[B, *spatial, C]`` up to a target shape.

    Used by the regular tile grid to round volumes up to a multiple of the
    tile core.  Padding is appended on the high side only.  When an axis
    needs more symmetric padding than its size allows, falls back to edge
    padding for that axis.
    """
    spatial = x.shape[1:-1]
    sym_widths: list[Tuple[int, int]] = [(0, 0)]
    edge_widths: list[Tuple[int, int]] = [(0, 0)]
    for s, t in zip(spatial, target_spatial):
        if t < s:
            raise ValueError(f"pad_to_shape cannot shrink {s} -> {t}")
        # only the axis whose pad exceeds its size falls back to edge
        # replication; other axes keep the requested mode
        if mode == "symmetric" and t - s > s:
            sym_widths.append((0, 0))
            edge_widths.append((0, t - s))
        else:
            sym_widths.append((0, t - s))
            edge_widths.append((0, 0))
    sym_widths.append((0, 0))
    edge_widths.append((0, 0))
    out = jnp.pad(x, sym_widths, mode=mode)
    if any(w != (0, 0) for w in edge_widths):
        out = jnp.pad(out, edge_widths, mode="edge")
    return out
