"""Spatially-sharded whole-volume inference over a device mesh.

This workload's counterpart of context parallelism (SURVEY.md §5.7): one
confocal z-stack is too large for a chip, so its X axis is sharded across
the ``spatial`` mesh axis.  Valid convolutions need a halo of neighbor
voxels; the reference fakes this with host-side reflection padding + overlap
+ crop per tile (``hcat/utils.py:33-74``, ``segment.py:103-106``).  Here the
halo is exchanged over ICI with ``lax.ppermute`` inside a ``shard_map`` —
no host round-trips, no duplicated tiles in HBM.

Each device holds a slab ``[1, X/n, Y, Z, C]``.  One step:

    recv_left  = ppermute(right edge of left neighbor)
    recv_right = ppermute(left edge of right neighbor)
    extended   = concat([recv_left, slab, recv_right], X)
    out        = model(extended reflected-padded on Y/Z) cropped to the core

Global edges (device 0's left face, device n-1's right face) use local
reflection, which equals the reference's global reflection pad because the
mirror only reads voxels the edge device already owns.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from hcunet_tpu.parallel.mesh import SPATIAL_AXIS


def spatial_sharded_forward(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    halo: Tuple[int, int, int],
    axis_name: str = SPATIAL_AXIS,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build a function evaluating ``apply_fn`` over an X-sharded volume.

    ``apply_fn`` maps ``[1, x+2hx, Y+2hy, Z+2hz, C] -> [1, >=x+hx, ...]``
    logits (a valid-conv net whose shrink fits inside the halo — same
    geometry contract as the tiling engine).  The returned function takes
    the *global* volume ``[1, X, Y, Z, C]`` (X divisible by the spatial axis
    size) and returns ``[1, X, Y, Z, Cout]`` probabilities, sharded the same
    way.
    """
    n = mesh.shape[axis_name]
    hx, hy, hz = halo

    def local_fn(slab: jnp.ndarray) -> jnp.ndarray:
        # slab: [1, x_local, Y, Z, C]
        idx = lax.axis_index(axis_name)

        right_edge = slab[:, -hx:]  # goes to right neighbor's left halo
        left_edge = slab[:, :hx]  # goes to left neighbor's right halo
        from_left = lax.ppermute(
            right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        from_right = lax.ppermute(
            left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        # global edges: reflect own face instead of wrapping around the ring
        reflect_left = slab[:, hx - 1 :: -1] if hx else slab[:, :0]
        reflect_right = slab[:, : -hx - 1 : -1] if hx else slab[:, :0]
        from_left = jnp.where(idx == 0, reflect_left, from_left)
        from_right = jnp.where(idx == n - 1, reflect_right, from_right)

        ext = jnp.concatenate([from_left, slab, from_right], axis=1)
        # Y/Z halos are local reflections (not sharded axes)
        widths = [(0, 0), (0, 0), (hy, hy), (hz, hz), (0, 0)]
        ext = jnp.pad(ext, widths, mode="symmetric")

        out = apply_fn(ext)
        core = out[
            :,
            hx : hx + slab.shape[1],
            hy : hy + slab.shape[2],
            hz : hz + slab.shape[3],
            :,
        ]
        return jax.nn.sigmoid(core.astype(jnp.float32))

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(None, axis_name, None, None, None),
        out_specs=P(None, axis_name, None, None, None),
        check_rep=False,
    )

    @jax.jit
    def run(volume: jnp.ndarray) -> jnp.ndarray:
        if volume.shape[1] % n:
            raise ValueError(
                f"X={volume.shape[1]} not divisible by spatial axis size {n}"
            )
        volume = lax.with_sharding_constraint(
            volume, NamedSharding(mesh, P(None, axis_name, None, None, None))
        )
        return sharded(volume)

    return run
