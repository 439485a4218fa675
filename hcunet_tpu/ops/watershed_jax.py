"""On-device seeded watershed — bounded-iteration relaxation.

The exact priority-flood watershed is inherently sequential and runs on the
host (``native/watershed.cpp``).  This is the XLA-friendly variant promised
by the build plan (SURVEY.md §7 step 2): seeded label assignment by
*minimax-path* relaxation —

    cost(p)  = min over paths from a seed of   max(image along the path)
    label(p) = label of the seed achieving that cost

computed by Bellman–Ford-style iteration over the 6-neighborhood: each step
every voxel adopts the (cost, label) of its best neighbor, where moving into
voxel p costs ``max(neighbor_cost, image[p]) + compactness·step``.  ``iters``
bounds the path length; regions wider than ``iters`` voxels stay partially
unlabeled, so pick iters ≥ the largest cell radius (cells here are ≲ 40 vox).

This is the classic flooding-order semantics of watershed without the global
priority queue; ties differ from the sequential algorithm only on plateaus.
A final pass zeroes voxels whose neighborhood contains another label when
``watershed_line`` is set.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e9)


def _shift(x, axis, direction, fill):
    """Neighbor view along one axis (shifted copy, edges filled)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    padded = jnp.pad(x, pad, constant_values=fill)
    idx = [slice(None)] * x.ndim
    start = 0 if direction > 0 else 2
    idx[axis] = slice(start, start + x.shape[axis])
    return padded[tuple(idx)]


@functools.partial(
    jax.jit, static_argnames=("iters", "compactness", "watershed_line")
)
def watershed_jax(
    image: jnp.ndarray,
    markers: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    iters: int = 64,
    compactness: float = 0.0,
    watershed_line: bool = False,
) -> jnp.ndarray:
    """``image``: [X, Y, Z] heights (flooded ascending); ``markers``: int
    labels; ``mask``: optional bool.  Returns int32 labels."""
    image = jnp.asarray(image, jnp.float32)
    markers = jnp.asarray(markers, jnp.int32)
    valid = jnp.ones(image.shape, bool) if mask is None else jnp.asarray(mask) != 0

    seeded = (markers != 0) & valid
    cost = jnp.where(seeded, image, _BIG)
    label = jnp.where(seeded, markers, 0)

    axes = [a for a in range(image.ndim) if image.shape[a] > 1]

    def step(state, _):
        cost, label = state
        best_cost, best_label = cost, label
        for ax in axes:
            for d in (1, -1):
                nc = _shift(cost, ax, d, _BIG)
                nl = _shift(label, ax, d, 0)
                cand = jnp.maximum(nc, image) + compactness
                better = (cand < best_cost) & (nl != 0) & valid
                best_cost = jnp.where(better, cand, best_cost)
                best_label = jnp.where(better, nl, best_label)
        return (best_cost, best_label), 0

    (cost, label), _ = jax.lax.scan(step, (cost, label), None, length=iters)
    label = jnp.where(valid, label, 0)

    if watershed_line:
        boundary = jnp.zeros(image.shape, bool)
        for ax in axes:
            for d in (1, -1):
                nl = _shift(label, ax, d, 0)
                boundary |= (nl != 0) & (label != 0) & (nl != label)
        label = jnp.where(boundary, 0, label)
    return label
