"""Batched tiled whole-volume inference.

TPU-native redesign of the reference's hot loop #1
(``hcat/segment.py:21-136``, ``predict_segmentation_mask``): reflection-pad,
tile, run the valid-conv U-Net per tile, sigmoid, optionally threshold, and
reassemble the full-size mask.

What changes on TPU (and why it's the throughput lever):

* **Regular grid** — tiles are uniform (core ``eval_size`` + halo ``pad``),
  so a single compiled program evaluates every tile and reassembly is a
  transpose/reshape instead of a scatter.  The reference's grid
  (``calculate_indexes``) produces ragged final windows; it is supported via
  ``TileConfig.reference_exact_grid`` for parity runs but off the fast path.
* **Tile batching** — the reference evaluates one tile at a time
  (``segment.py:83-99``).  Here tiles are gathered with a vmapped
  ``dynamic_slice`` and evaluated ``batch`` at a time under ``lax.map``,
  keeping the MXU fed while bounding HBM (only ``batch`` padded tiles are
  live at once).
* **Fused epilogue** — sigmoid/threshold/cast run inside the same jit as the
  model; XLA fuses them into the last conv's epilogue instead of the
  reference's four in-place host ops (``segment.py:110-120``).
* The all-(-1) empty-tile skip (``segment.py:92-95``) becomes a masked
  ``where`` so the batch stays uniform.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hcunet_tpu.config import TileConfig, UNetConfig
from hcunet_tpu.core.padding import reflection_pad
from hcunet_tpu.core.shapes import calculate_indexes, unet_shrinkage


def _check_geometry(
    tile_input: Sequence[int], eval_size: Sequence[int], pad: Sequence[int],
    unet_cfg: UNetConfig,
):
    """The model's shrink must fit inside the halo so the valid core aligns
    (the reference raises the same way at ``segment.py:127-132``)."""
    shrink = unet_shrinkage(tuple(tile_input), **unet_cfg.shape_kwargs())
    for s, p, e in zip(shrink, pad, eval_size):
        if e + p > (e + 2 * p) - s:  # i.e. shrink exceeds the halo
            raise ValueError(
                f"amount of padding is not sufficient: tile {tuple(tile_input)} "
                f"shrinks by {shrink}, need pad >= shrink per axis "
                f"(pad={tuple(pad)})"
            )


def _eval_tile_grid(
    padded: jnp.ndarray,
    *,
    eval_size: Tuple[int, ...],
    pad: Tuple[int, ...],
    batch: int,
    n_tiles: Tuple[int, ...],
    apply_fn,
    use_probability_map: bool,
    threshold: float,
):
    """Evaluate the regular tile grid over an already-padded volume.

    ``padded``: [1, nx*ex + 2*px (+overhang), ..., C].  Returns the
    reassembled [1, nx*ex, ny*ey, nz*ez, Cout] core.  Shared by the
    single-device path (reflection padding) and the multi-device path
    (``hcunet_tpu.parallel.tiled``, halo exchange over ICI).
    """
    tile_in = tuple(e + 2 * p for e, p in zip(eval_size, pad))
    nx, ny, nz = n_tiles
    n = nx * ny * nz

    origins = jnp.stack(
        jnp.meshgrid(
            jnp.arange(nx) * eval_size[0],
            jnp.arange(ny) * eval_size[1],
            jnp.arange(nz) * eval_size[2],
            indexing="ij",
        ),
        axis=-1,
    ).reshape(n, 3)

    # round n up to a multiple of batch with dummy origin 0 tiles
    n_pad = (-n) % batch
    if n_pad:
        origins = jnp.concatenate([origins, jnp.zeros((n_pad, 3), origins.dtype)])
    origins = origins.reshape(-1, batch, 3)

    def gather_one(o):
        return jax.lax.dynamic_slice(
            padded[0],
            (o[0], o[1], o[2], 0),
            (*tile_in, padded.shape[-1]),
        )

    def eval_batch(obatch):
        tiles = jax.vmap(gather_one)(obatch)  # [B, *tile_in, C]
        out = apply_fn(tiles)  # [B, *out_spatial, Cout] (logits)
        # crop the trusted core: [pad : eval+pad] per axis (segment.py:103-106)
        out = out[
            :,
            pad[0] : eval_size[0] + pad[0],
            pad[1] : eval_size[1] + pad[1],
            pad[2] : eval_size[2] + pad[2],
            :,
        ]
        out = jax.nn.sigmoid(out.astype(jnp.float32))
        # empty-tile parity: all-(-1) input tiles produce zeros
        empty = jnp.all(tiles == -1, axis=tuple(range(1, tiles.ndim)))
        out = jnp.where(empty[:, None, None, None, None], 0.0, out)
        if not use_probability_map:
            out = (out > threshold).astype(jnp.uint8)
        return out

    outs = jax.lax.map(eval_batch, origins)  # [n/B, B, *eval, Cout]
    outs = outs.reshape(-1, *outs.shape[2:])[:n]
    c_out = outs.shape[-1]
    outs = outs.reshape(nx, ny, nz, *eval_size, c_out)
    outs = jnp.transpose(outs, (0, 3, 1, 4, 2, 5, 6))
    return outs.reshape(
        1, nx * eval_size[0], ny * eval_size[1], nz * eval_size[2], c_out
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "eval_size",
        "pad",
        "batch",
        "use_probability_map",
        "threshold",
        "n_tiles",
        "postprocess",
    ),
)
def _tiled_forward(
    apply_fn,  # a jax.tree_util.Partial — params ride along as traced leaves
    image: jnp.ndarray,
    *,
    eval_size: Tuple[int, ...],
    pad: Tuple[int, ...],
    batch: int,
    n_tiles: Tuple[int, ...],
    use_probability_map: bool,
    threshold: float,
    postprocess: Optional[Tuple[float, float, float]] = None,
):
    """Scrub, pad, and evaluate the regular tile grid — one fused program.

    ``image``: [1, X, Y, Z, C] (not donated — callers may reuse the buffer
    across calls, e.g. benchmarking and multi-pass pipelines).  Returns the
    trimmed [1, X, Y, Z, Cout] result.  Everything lives in a single jit so
    a call costs one dispatch — important on remote-attached TPUs where each
    eager op pays a host round-trip.
    """
    spatial = image.shape[1:-1]

    # nan/inf scrub (segment.py:66-67)
    image = jnp.nan_to_num(image, nan=0.0, posinf=1.0, neginf=0.0)

    # halo by reflection (like the reference), then right-pad the ragged
    # grid overhang with edge replication — the overhang only feeds halo
    # regions that get cropped or trimmed anyway.
    padded = reflection_pad(image, pad)
    overhang = [n * e - s for n, e, s in zip(n_tiles, eval_size, spatial)]
    widths = [(0, 0)] + [(0, int(o)) for o in overhang] + [(0, 0)]
    padded = jnp.pad(padded, widths, mode="edge")

    full = _eval_tile_grid(
        padded,
        eval_size=eval_size,
        pad=pad,
        batch=batch,
        n_tiles=n_tiles,
        apply_fn=apply_fn,
        use_probability_map=use_probability_map,
        threshold=threshold,
    )
    # trim grid-rounding overhang back to the true volume
    full = full[:, : spatial[0], : spatial[1], : spatial[2], :]

    if postprocess is not None:
        # fused pipeline epilogue (hcat/main.py:130-132): gaussian blur,
        # probability floor, rescale — on device instead of a host round trip
        from hcunet_tpu.ops.filters import gaussian_blur

        sigma, floor, scale = postprocess
        full = gaussian_blur(full, sigma, axes=(1, 2, 3))
        full = jnp.where(full < floor, 0.0, full) * scale
    return full


def predict_segmentation_mask(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    unet_cfg: UNetConfig,
    tile_cfg: Optional[TileConfig] = None,
    *,
    use_probability_map: bool = False,
    mask_cell_prob_threshold: float = 0.5,
    postprocess: Optional[Tuple[float, float, float]] = None,
) -> jnp.ndarray:
    """Tiled semantic segmentation of a whole volume.

    ``postprocess=(sigma, floor, scale)`` fuses the pipeline's
    blur/floor/rescale stage (``hcat/main.py:130-132``) into the same device
    program (only meaningful with ``use_probability_map``).

    ``apply_fn`` maps a batch of tiles ``[B, tx, ty, tz, C]`` to logits of
    the model's valid output shape.  ``image`` is ``[1, X, Y, Z, C]``
    channels-last (use ``hcunet_tpu.data.transforms`` to get there from raw
    tif layout).  Returns ``[1, X, Y, Z, 1]`` — float32 probabilities when
    ``use_probability_map`` else uint8 {0,1}.
    """
    if tile_cfg is None:
        tile_cfg = TileConfig()
    if image.ndim != 5:
        raise ValueError(f"expected [1, X, Y, Z, C], got {image.shape}")

    spatial = image.shape[1:-1]
    eval_size = tuple(
        min(e, s) for e, s in zip(tile_cfg.eval_size, spatial)
    )
    # single-pass symmetric reflection cannot exceed the axis size — clamp
    # the halo for small volumes/chunks (geometry check below still
    # guarantees the halo covers the network shrink, or raises).
    pad = tuple(min(int(p), int(s)) for p, s in zip(tile_cfg.pad, spatial))

    _check_geometry(
        tuple(e + 2 * p for e, p in zip(eval_size, pad)), eval_size, pad, unet_cfg
    )

    n_tiles = tuple(-(-s // e) for s, e in zip(spatial, eval_size))

    return _tiled_forward(
        apply_fn,
        image,
        eval_size=eval_size,
        pad=pad,
        batch=int(tile_cfg.batch),
        n_tiles=n_tiles,
        use_probability_map=bool(use_probability_map),
        threshold=float(mask_cell_prob_threshold),
        postprocess=None if postprocess is None else tuple(postprocess),
    )


def reference_tile_windows(
    spatial: Sequence[int], eval_size: Sequence[int], pad: Sequence[int]
):
    """The reference's exact (ragged) tile windows, for parity runs.

    Returns per-axis ``[start, stop]`` lists over the *padded* volume, as
    produced by ``hcat/segment.py:74-77`` via ``calculate_indexes``.
    """
    return [
        calculate_indexes(p, e, s, s + 2 * p)
        for p, e, s in zip(pad, eval_size, spatial)
    ]


def predict_segmentation_mask_reference_grid(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    unet_cfg: UNetConfig,
    tile_cfg: Optional[TileConfig] = None,
    *,
    use_probability_map: bool = False,
    mask_cell_prob_threshold: float = 0.5,
) -> np.ndarray:
    """Bit-parity variant walking the reference's exact ragged tile grid.

    Slower (one compile per distinct ragged tile shape, sequential loop) —
    use only to validate voxel placement against the reference.
    """
    if tile_cfg is None:
        tile_cfg = TileConfig()
    spatial = image.shape[1:-1]
    eval_size = [min(e, s) for e, s in zip(tile_cfg.eval_size, spatial)]
    pad = tuple(tile_cfg.pad)
    image = jnp.nan_to_num(image, nan=0.0, posinf=1.0, neginf=0.0)
    padded = reflection_pad(image, pad)
    x_ind, y_ind, z_ind = reference_tile_windows(spatial, eval_size, pad)

    out_dtype = np.float32 if use_probability_map else np.uint8
    mask = np.zeros((1, *spatial, 1), out_dtype)

    @functools.partial(jax.jit, static_argnames=())
    def run_tile(tile):
        out = apply_fn(tile[None])[0]
        return jax.nn.sigmoid(out.astype(jnp.float32))

    for z0, z1 in z_ind:
        for x0, x1 in x_ind:
            for y0, y1 in y_ind:
                tile = padded[0, x0:x1, y0:y1, z0:z1, :]
                if bool(jnp.all(tile == -1)):
                    continue
                out = run_tile(tile)
                valid = out[
                    pad[0] : eval_size[0] + pad[0],
                    pad[1] : eval_size[1] + pad[1],
                    pad[2] : eval_size[2] + pad[2],
                    :,
                ]
                if not use_probability_map:
                    valid = (np.asarray(valid) > mask_cell_prob_threshold).astype(
                        np.uint8
                    )
                else:
                    valid = np.asarray(valid)
                xe = min(x0 + eval_size[0], spatial[0])
                ye = min(y0 + eval_size[1], spatial[1])
                ze = min(z0 + eval_size[2], spatial[2])
                mask[0, x0:xe, y0:ye, z0:ze, :] = valid[: xe - x0, : ye - y0, : ze - z0]
    return mask
