"""Multi-chip tiled inference: the batched tile grid composed with spatial
sharding over a device mesh.

Round-1 limitation (VERDICT item 4): ``parallel/spatial.py`` pushes each
device's whole X-slab through ONE model forward, so volumes larger than a
single forward per slab could not run multi-chip.  Here each device runs the
*tile engine* (``hcunet_tpu.infer.tiling._eval_tile_grid`` — gather, batched
evaluation, reassembly) over its own slab, so arbitrarily large volumes
scale across chips exactly like the single-chip path scales across tiles.

Sharding layout (one `shard_map`, everything on-device):

* the volume's X axis is sharded over the ``spatial`` mesh axis;
* each device exchanges a ``pad_x``-wide halo with its ring neighbors via
  ``lax.ppermute`` over ICI (device 0 / n-1 reflect their own global edge,
  matching the reference's global reflection pad, ``hcat/utils.py:33-74``);
* Y/Z halos are local reflections; the ragged grid overhang is edge-padded;
* each device evaluates its local tile grid and keeps its output slab
  sharded — no gather unless the caller asks for a replicated result.

This is the TPU-native version of the reference's chunk grid
(``hcat/main.py:74-89``): chunks become shards, pickle spills become ICI
halo exchanges.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from hcunet_tpu.config import TileConfig, UNetConfig
from hcunet_tpu.core.shapes import unet_shrinkage
from hcunet_tpu.infer.tiling import _eval_tile_grid
from hcunet_tpu.parallel.mesh import SPATIAL_AXIS


def sharded_tiled_forward(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    unet_cfg: UNetConfig,
    tile_cfg: TileConfig,
    *,
    axis_name: str = SPATIAL_AXIS,
    use_probability_map: bool = True,
    threshold: float = 0.5,
    postprocess: Optional[Tuple[float, float, float]] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build the multi-chip tiled segmentation function.

    The returned function maps a global ``[1, X, Y, Z, C]`` volume to
    ``[1, X, Y, Z, Cout]`` probabilities (or uint8 when
    ``use_probability_map=False``), numerically identical to the
    single-device ``predict_segmentation_mask`` on the same tile geometry.

    ``postprocess=(sigma, floor, scale)`` fuses the pipeline's gaussian
    blur / floor / rescale epilogue (``hcat/main.py:130-132``): it runs
    *outside* the ``shard_map`` but inside the same jit, on the still-sharded
    output — XLA/GSPMD inserts the cross-shard halo exchange for the blur
    stencil automatically, so the result matches the single-device epilogue
    exactly.

    Constraints (checked): ``X`` divisible by ``n_shards * eval_x`` so every
    device owns a whole number of tile columns, and the halo must cover the
    network shrink (callers bucket-pad; see ``infer/serving.py``).
    """
    n = mesh.shape[axis_name]
    ex, ey, ez = (int(e) for e in tile_cfg.eval_size)
    px, py, pz = (int(p) for p in tile_cfg.pad)
    batch = int(tile_cfg.batch)

    tile_in = (ex + 2 * px, ey + 2 * py, ez + 2 * pz)
    shrink = unet_shrinkage(tile_in, **unet_cfg.shape_kwargs())
    # same contract as infer.tiling._check_geometry: the trusted-core crop
    # [pad : eval+pad] needs the model's shrink to fit inside ONE halo
    for s, p in zip(shrink, (px, py, pz)):
        if s > p:
            raise ValueError(
                f"halo {(px, py, pz)} does not cover the network shrink "
                f"{shrink} for tile {tile_in}"
            )

    def local_fn(slab: jnp.ndarray) -> jnp.ndarray:
        # slab: [1, x_loc, Y, Z, C]
        idx = lax.axis_index(axis_name)
        slab = jnp.nan_to_num(slab, nan=0.0, posinf=1.0, neginf=0.0)

        # --- X halo over ICI (ring), reflection at the global edges ---
        right_edge = slab[:, -px:]
        left_edge = slab[:, :px]
        from_left = lax.ppermute(
            right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        from_right = lax.ppermute(
            left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        reflect_left = slab[:, px - 1 :: -1] if px else slab[:, :0]
        reflect_right = slab[:, : -px - 1 : -1] if px else slab[:, :0]
        from_left = jnp.where(idx == 0, reflect_left, from_left)
        from_right = jnp.where(idx == n - 1, reflect_right, from_right)
        ext = jnp.concatenate([from_left, slab, from_right], axis=1)

        # --- Y/Z halos by local reflection + ragged-grid overhang ---
        x_loc, Y, Z = slab.shape[1], slab.shape[2], slab.shape[3]
        nx = x_loc // ex
        ny = -(-Y // ey)
        nz = -(-Z // ez)
        over_y = ny * ey - Y
        over_z = nz * ez - Z
        ext = jnp.pad(
            ext,
            [(0, 0), (0, 0), (py, py), (pz, pz), (0, 0)],
            mode="symmetric",
        )
        ext = jnp.pad(
            ext,
            [(0, 0), (0, 0), (0, over_y), (0, over_z), (0, 0)],
            mode="edge",
        )

        out = _eval_tile_grid(
            ext,
            eval_size=(ex, ey, ez),
            pad=(px, py, pz),
            batch=batch,
            n_tiles=(nx, ny, nz),
            apply_fn=apply_fn,
            use_probability_map=use_probability_map,
            threshold=threshold,
        )
        return out[:, :, :Y, :Z, :]

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(None, axis_name, None, None, None),
        out_specs=P(None, axis_name, None, None, None),
        check_rep=False,
    )

    @jax.jit
    def run(volume: jnp.ndarray) -> jnp.ndarray:
        X = volume.shape[1]
        if X % (n * ex):
            raise ValueError(
                f"X={X} must divide into {n} shards of whole {ex}-wide tile "
                f"columns (bucket-pad the volume first)"
            )
        # Each shard's halo slices (slab[:, -px:] / slab[:, px-1::-1]) would
        # silently clamp to narrower arrays if the slab is thinner than one
        # halo, corrupting outputs instead of erroring.
        if X // n < max(px, ex):
            raise ValueError(
                f"per-shard slab width {X // n} is thinner than the halo "
                f"pad_x={px} / tile eval_x={ex}; use fewer shards or a "
                f"larger volume"
            )
        volume = lax.with_sharding_constraint(
            volume, NamedSharding(mesh, P(None, axis_name, None, None, None))
        )
        out = sharded(volume)
        if postprocess is not None:
            from hcunet_tpu.ops.filters import gaussian_blur

            sigma, floor, scale = postprocess
            out = gaussian_blur(out, sigma, axes=(1, 2, 3))
            out = jnp.where(out < floor, 0.0, out) * scale
            out = lax.with_sharding_constraint(
                out, NamedSharding(mesh, P(None, axis_name, None, None, None))
            )
        return out

    return run


def sharded_tile_config(
    unet_cfg: UNetConfig,
    tile_cfg: Optional[TileConfig] = None,
    *,
    n_shards: int,
    volume_shape: Optional[Tuple[int, int, int]] = None,
) -> TileConfig:
    """Pick a tile geometry whose X core divides a per-shard slab evenly.

    Starts from the HBM auto-tuner's choice and shrinks the X eval size to a
    divisor of the slab when ``volume_shape`` is given."""
    from hcunet_tpu.config import auto_tile_config

    if tile_cfg is None:
        z = volume_shape[2] if volume_shape else 15
        tile_cfg = auto_tile_config(unet_cfg, z_extent=z)
    if volume_shape is None:
        return tile_cfg
    X = volume_shape[0]
    if X % n_shards:
        raise ValueError(f"X={X} not divisible by {n_shards} shards")
    x_loc = X // n_shards
    ex = min(int(tile_cfg.eval_size[0]), x_loc)
    while x_loc % ex:
        ex -= 1
    return TileConfig(
        eval_size=(ex, *tile_cfg.eval_size[1:]),
        pad=tile_cfg.pad,
        batch=tile_cfg.batch,
    )
