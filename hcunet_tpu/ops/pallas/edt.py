"""Pallas TPU kernel: separable EDT min-plus pass.

One axis pass of the exact euclidean distance transform:

    out[r, j] = min_k  d[r, k] + (j - k)^2

(the Felzenszwalb/Huttenlocher lower-envelope recurrence, recast as a dense
min-plus reduction — branch-free and perfectly shaped for the 8x128 VPU).

The jnp fallback in :mod:`hcunet_tpu.ops.distance` materializes
[..., block, N] cost tensors through HBM; this kernel keeps the full row in
VMEM and accumulates the running minimum in registers, so HBM traffic is
exactly one read + one write of the array.

Grid: (rows / BLOCK_R, N / BLOCK_J).  Each instance owns a [BLOCK_R, BLOCK_J]
output tile and loops over all N candidate columns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 8
BLOCK_J = 128


def _edt_pass_kernel(d_ref, out_ref):
    """out[r, j] = min_k d[r, k] + (j-k)^2, one [BLOCK_R, BLOCK_J] tile.

    k is consumed in 128-aligned lane tiles (per-lane dynamic slicing is not
    a TPU-friendly access); each k-tile contributes an all-pairs
    [j, k] quadratic cost reduced over k on the VPU.
    """
    j0 = pl.program_id(1) * BLOCK_J
    n = d_ref.shape[1]
    n_ktiles = n // BLOCK_J

    # delta[j, k] = (j0 + j) - k for k in the current tile starting at k0:
    # precompute the k0-independent part once.
    jj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_J, BLOCK_J), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_J, BLOCK_J), 1)
    base = (j0 + jj - kk).astype(jnp.float32)  # [j, k]

    def body(kt, acc):
        k0 = pl.multiple_of(kt * BLOCK_J, BLOCK_J)
        dk = d_ref[:, pl.ds(k0, BLOCK_J)]  # [BLOCK_R, BLOCK_J(k)]
        delta = base - (kt * BLOCK_J).astype(jnp.float32)  # [j, k]
        cost = dk[:, None, :] + (delta * delta)[None, :, :]  # [r, j, k]
        return jnp.minimum(acc, jnp.min(cost, axis=-1))

    init = jnp.full((BLOCK_R, BLOCK_J), jnp.float32(1e12))
    out_ref[:, :] = jax.lax.fori_loop(0, n_ktiles, body, init)


@functools.partial(jax.jit, static_argnames=("interpret",))
def edt_axis_pass_rows(d2: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """``d2``: [R, N] squared distances; returns the min-plus pass along N."""
    R, N = d2.shape
    pr = (-R) % BLOCK_R
    pj = (-N) % BLOCK_J
    padded = jnp.pad(d2, ((0, pr), (0, pj)), constant_values=1e12)
    Rp, Np = padded.shape
    out = pl.pallas_call(
        _edt_pass_kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, Np), jnp.float32),
        grid=(Rp // BLOCK_R, Np // BLOCK_J),
        in_specs=[
            pl.BlockSpec((BLOCK_R, Np), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, BLOCK_J), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded.astype(jnp.float32))
    return out[:R, :N]


def edt_pallas(binary: jnp.ndarray, axes=None, interpret: bool = False) -> jnp.ndarray:
    """Exact EDT over ``axes`` using the Pallas pass per axis.

    Same contract as :func:`hcunet_tpu.ops.distance.edt`.
    """
    axes = tuple(range(binary.ndim)) if axes is None else tuple(axes)
    dist2 = jnp.where(jnp.asarray(binary) != 0, 1e12, 0.0).astype(jnp.float32)
    for ax in axes:
        moved = jnp.moveaxis(dist2, ax, -1)
        flat = moved.reshape(-1, moved.shape[-1])
        flat = edt_axis_pass_rows(flat, interpret=interpret)
        dist2 = jnp.moveaxis(flat.reshape(moved.shape), -1, ax)
    return jnp.sqrt(jnp.minimum(dist2, 1e12))
