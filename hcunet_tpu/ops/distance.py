"""Euclidean distance transforms.

The reference computes per-z-slice ``cv2.distanceTransform(bin, DIST_L2, 5)``
(``hcat/segment.py:433-435``, ``transforms.py:748``) — distance from each
foreground pixel to the nearest background pixel, via a 5×5 chamfer
approximation.  Two implementations here:

* :func:`edt` — **exact** EDT in JAX using the separable
  Felzenszwalb/Huttenlocher lower-envelope formulation recast as a
  vectorized min-plus reduction per axis:
      d1(i, j)² = min_k ( (j - k)² + 0·[x(i,k)=0] + INF·[x(i,k)=1 …] )
  Each axis pass is a broadcasted minimum over the axis — O(n²) work but
  fully parallel on the VPU, processed in column blocks to bound memory.
  Exact EDT is *more* accurate than cv2's chamfer; the instance watershed
  only consumes relative ordering, and tests check against
  ``scipy.ndimage.distance_transform_edt``.
* :func:`chamfer_edt_host` — host-side cv2-compatible 5×5 chamfer (two-pass
  dynamic program over numpy) for bit-level reference comparisons.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e12


def _axis_pass(dist2: jnp.ndarray, axis: int, block: int = 256) -> jnp.ndarray:
    """One separable EDT pass: out[.., j, ..] = min_k dist2[.., k, ..] + (j-k)²."""
    n = dist2.shape[axis]
    moved = jnp.moveaxis(dist2, axis, -1)  # [..., n]
    k = jnp.arange(n, dtype=jnp.float32)

    def block_fn(j0):
        j = j0 + jnp.arange(block, dtype=jnp.float32)  # [block]
        # [..., 1, n] + [block, n] -> [..., block, n] -> min over k
        cost = moved[..., None, :] + (j[:, None] - k[None, :]) ** 2
        return jnp.min(cost, axis=-1)  # [..., block]

    n_blocks = -(-n // block)
    starts = jnp.arange(n_blocks, dtype=jnp.float32) * block
    outs = jax.lax.map(block_fn, starts)  # [n_blocks, ..., block]
    outs = jnp.moveaxis(outs, 0, -2)  # [..., n_blocks, block]
    outs = outs.reshape(*moved.shape[:-1], n_blocks * block)[..., :n]
    return jnp.moveaxis(outs, -1, axis)


@functools.partial(jax.jit, static_argnames=("axes", "block"))
def edt(binary: jnp.ndarray, axes=None, block: int = 256) -> jnp.ndarray:
    """Exact euclidean distance to the nearest zero pixel, over ``axes``.

    ``binary``: any float/bool array; nonzero = foreground.  Matches
    ``scipy.ndimage.distance_transform_edt`` over the same axes.

    Kernel verdict (round 5, ``scripts/probe_edt_device.py`` on v5e): a
    hand-written Pallas min-plus kernel (row kept in VMEM, running minimum
    in registers) ran this pass at only 0.64× XLA at the 412²-slice
    watershed-tile geometry and 0.47× at 1212² (bit-exact outputs) —
    matching the round-3 finding that Pallas lands at 0.6–0.8× XLA's
    fusion on this toolchain.  The kernel was therefore retired; this jnp
    formulation IS the TPU path (see BASELINE.md kernel verdicts).
    """
    axes = tuple(range(binary.ndim)) if axes is None else tuple(axes)
    dist2 = jnp.where(jnp.asarray(binary) != 0, _INF, 0.0).astype(jnp.float32)
    for ax in axes:
        dist2 = _axis_pass(dist2, ax, block)
    return jnp.sqrt(jnp.minimum(dist2, _INF))


def edt_per_slice_host(binary: np.ndarray) -> np.ndarray:
    """Host path: exact EDT per z-slice of an [X, Y, Z] volume — the layout
    the instance segmenter consumes (``segment.py:433-435`` loops z)."""
    from scipy import ndimage as ndi

    out = np.zeros(binary.shape, np.float32)
    for z in range(binary.shape[-1]):
        out[..., z] = ndi.distance_transform_edt(binary[..., z] != 0)
    return out


def chamfer_edt_host(binary: np.ndarray) -> np.ndarray:
    """cv2-compatible DIST_L2 5×5 chamfer distance (two-pass DP, numpy).

    Mask weights a=1.0, b=1.4, c=2.1969 per OpenCV's 5×5 L2 mask.
    """
    a, b, c = 1.0, 1.4, 2.1969
    h, w = binary.shape
    d = np.where(binary != 0, np.float32(_INF), np.float32(0))
    d = np.pad(d, 2, constant_values=np.float32(_INF))
    # forward neighbors: (dy, dx, weight) strictly before in raster order
    fwd = [
        (-1, -1, b), (-1, 0, a), (-1, 1, b), (0, -1, a),
        (-2, -1, c), (-1, -2, c), (-2, 1, c), (-1, 2, c),
    ]
    bwd = [(-dy, -dx, wgt) for dy, dx, wgt in fwd]
    for y in range(2, h + 2):
        for x in range(2, w + 2):
            v = d[y, x]
            if v == 0:
                continue
            for dy, dx, wgt in fwd:
                v = min(v, d[y + dy, x + dx] + wgt)
            d[y, x] = v
    for y in range(h + 1, 1, -1):
        for x in range(w + 1, 1, -1):
            v = d[y, x]
            if v == 0:
                continue
            for dy, dx, wgt in bwd:
                v = min(v, d[y + dy, x + dx] + wgt)
            d[y, x] = v
    return d[2 : h + 2, 2 : w + 2]
