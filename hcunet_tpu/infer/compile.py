"""Serving compiler: the inference-optimized forward pass.

Takes a trained :class:`~hcunet_tpu.models.unet.UNet` + variables and emits a
pure tile-batch -> logits function that is numerically equivalent to
``model.apply(..., train=False)`` but restructured for the TPU memory system
(measured per-op on v5e, ``scripts/probe_packed.py``):

1. **BN folding** — inference batch-norm collapses into the preceding conv's
   weights/bias (one conv instead of conv+scale+shift).
2. **z-block lane packing** — the U-Net's channel counts (4..32) waste the
   MXU/VPU lane dimension; XLA's conv moves ~taps x input bytes either way,
   but at 128 packed channels it runs ~1.3-2.1x faster per conv.  Pack
   ``zb`` z-planes into the channel dim (c-major lanes: ``lane = c*zb + z``)
   so convs become [3, 3, kzb] at ``C*zb`` channels with block-banded
   weights.  FLOPs inflate by ``zb`` — a winning trade at small ``C``.
3. **Whole levels stay packed** — pooling is a strided-slice max on (X, Y),
   channel concat is lane concat (c-major makes skip joins free), and the
   decoder's *top-left* crops make z-cropping free: a prefix z-crop never
   moves data, so only the logical ``z_len`` shrinks and garbage slots are
   ignored by construction (packed weights only produce valid out-slots'
   inputs).
4. **Transpose convs stay packed too** — torch ``ConvTranspose`` is a
   flipped-kernel conv with lhs_dilation on (X, Y); its z-kernel (stride-1)
   packs like a normal conv with a one-block left extension for the z
   zero-padding.

The reference has no counterpart (it runs the training graph for inference,
``hcat/segment.py:99``); this is the framework's production serving path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hcunet_tpu.config import UNetConfig
from hcunet_tpu.ops.conv import block_diagonal_weights, fold_bn_into_conv


def _dimnums(nd: int) -> lax.ConvDimensionNumbers:
    lhs = "N" + "".join(chr(ord("0") + i) for i in range(nd)) + "C"
    rhs = "".join(chr(ord("0") + i) for i in range(nd)) + "IO"
    return lax.conv_dimension_numbers(
        (1,) * (nd + 2), (1,) * (nd + 2), (lhs, rhs, lhs)
    )


# ---------------------------------------------------------------------------
# packing primitives (c-major lanes: lane = c * zb + z_slot)
# ---------------------------------------------------------------------------


def pack_volume(x: jnp.ndarray, zb: int) -> jnp.ndarray:
    """[B, X, Y, Z, C] -> [B, X, Y, nb, C*zb], z padded to nb*zb."""
    b, X, Y, z, c = x.shape
    nb = -(-z // zb)
    x = jnp.pad(x, [(0, 0)] * 3 + [(0, nb * zb - z), (0, 0)])
    x = x.reshape(b, X, Y, nb, zb, c)
    x = jnp.swapaxes(x, -1, -2)  # [..., nb, c, zb]
    return x.reshape(b, X, Y, nb, c * zb)


def unpack_volume(xp: jnp.ndarray, zb: int, z_len: int, c: int) -> jnp.ndarray:
    """[B, X, Y, nb, C*zb] -> [B, X, Y, z_len, C]."""
    b, X, Y, nb, _ = xp.shape
    x = xp.reshape(b, X, Y, nb, c, zb)
    x = jnp.swapaxes(x, -1, -2)  # [..., nb, zb, c]
    return x.reshape(b, X, Y, nb * zb, c)[:, :, :, :z_len, :]


def repack(xp: jnp.ndarray, zb_from: int, zb_to: int, z_len: int, c: int) -> jnp.ndarray:
    return pack_volume(unpack_volume(xp, zb_from, z_len, c), zb_to)


def pack_conv_weights(
    w: np.ndarray, zb: int, z_shift: int = 0, z_dilation: int = 1
) -> Tuple[jnp.ndarray, int, int]:
    """Pack [kx, ky, kz, Cin, Cout] into block-banded
    [kx, ky, kzb, Cin*zb, Cout*zb] (c-major lanes).

    Out slot ``zo`` of relative block 0 consumes input slot
    ``zi = zo + dz * z_dilation + z_shift`` (``z_shift`` < 0 encodes the
    transpose-conv's zero left-extension; ``z_dilation`` > 1 the dilated
    taps of StackedDilation, ``hcat/r_unet.py:348-364``).  Returns
    ``(wp, kzb, nb_left)`` where ``nb_left`` is how many zero blocks the
    input must be extended by on the left.
    """
    kx, ky, kz, cin, cout = w.shape
    lo = min(0 + 0 + z_shift, (zb - 1) + 0 + z_shift)
    hi = (zb - 1) + (kz - 1) * z_dilation + z_shift
    rb_min = lo // zb if lo < 0 else 0
    rb_max = hi // zb
    kzb = rb_max - rb_min + 1
    wp = np.zeros((kx, ky, kzb, cin * zb, cout * zb), np.float32)
    wn = np.asarray(w, np.float32)
    for zo in range(zb):
        for dz in range(kz):
            zi = zo + dz * z_dilation + z_shift
            rb, ri = zi // zb, zi % zb  # floor-division: rb may be rb_min<0
            wp[:, :, rb - rb_min, ri::zb, zo::zb] = wn[:, :, dz]
    return jnp.asarray(wp), kzb, -rb_min


@dataclasses.dataclass
class _Packed:
    """A packed activation: [B, X, Y, nb, C*zb] plus logical metadata."""

    data: jnp.ndarray
    zb: int
    c: int
    z_len: int  # valid z extent (slots beyond hold garbage)

    @property
    def nb(self) -> int:
        return self.data.shape[3]

    def spatial(self) -> Tuple[int, int]:
        return self.data.shape[1], self.data.shape[2]


def zero_garbage_slots(x: _Packed) -> _Packed:
    """Zero the z slots beyond ``z_len``.

    Packed tensors carry garbage in trailing z slots (valid outputs never
    read them for shrink-only convs), but a z-GROWING conv (the transpose
    conv) legitimately reads one slot past ``z_len`` where torch's zero
    padding lives — so the garbage must be scrubbed to zero first."""
    nb, L = x.nb, x.data.shape[-1]
    zb, c = x.zb, x.c
    slot = np.arange(nb * zb).reshape(nb, zb)  # global z slot per (block, r)
    lane_valid = jnp.asarray(
        np.repeat(slot[:, None, :], c, axis=1).reshape(nb, L) < x.z_len
    )
    return _Packed(
        x.data * lane_valid.astype(x.data.dtype)[None, None, None],
        zb, c, x.z_len,
    )


def conv_packed(
    x: _Packed,
    wp: jnp.ndarray,
    kzb: int,
    nb_left: int,
    *,
    kz: int,
    cout: int,
    bias: Optional[jnp.ndarray] = None,
    relu: bool = False,
    lhs_dilation: Optional[Tuple[int, int]] = None,
    rhs_dilation_xy: Optional[Tuple[int, int]] = None,
    pad_xy: Tuple[int, int] = (0, 0),
    z_grow: int = 0,
    z_delta: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> _Packed:
    """Run one packed conv.  ``z_grow`` is the z-extent change (e.g. +1 for
    the (kz=2, stride-1) transpose conv); the nb axis is zero-extended so
    all valid out slots exist.  ``z_delta`` (used by the same-padding
    recurrent family) sets ``z_out = z_len + z_delta`` explicitly — e.g. 0
    for a symmetric-zero-pad z conv whose weights carry the matching
    ``z_shift``."""
    if z_delta is not None:
        z_out = x.z_len + z_delta
    else:
        z_out = x.z_len + z_grow if z_grow else x.z_len - (kz - 1)
    nb_out_needed = -(-z_out // x.zb)
    # VALID conv over nb: out_nb = nb + left + right - kzb + 1
    nb_right = max(0, nb_out_needed - (x.nb + nb_left - kzb + 1))
    xp = x.data
    if nb_left or nb_right:
        xp = jnp.pad(xp, [(0, 0), (0, 0), (0, 0), (nb_left, nb_right), (0, 0)])
    out = lax.conv_general_dilated(
        xp.astype(dtype),
        wp.astype(dtype),
        window_strides=(1, 1, 1),
        padding=[(pad_xy[0], pad_xy[0]), (pad_xy[1], pad_xy[1]), (0, 0)],
        lhs_dilation=(None if lhs_dilation is None else (*lhs_dilation, 1)),
        rhs_dilation=(
            None if rhs_dilation_xy is None else (*rhs_dilation_xy, 1)
        ),
        dimension_numbers=_dimnums(3),
        preferred_element_type=dtype,
    )
    if bias is not None:
        out = out + bias.astype(dtype)
    if relu:
        out = jax.nn.relu(out)
    return _Packed(out, x.zb, cout, z_out)


def tconv_packed_subpixel(
    x: _Packed,
    subs: Sequence[Sequence[Dict]],
    *,
    up_kz: int,
    cout: int,
    bias: jnp.ndarray,
    k_xy: Tuple[int, int],
    dtype=jnp.bfloat16,
) -> _Packed:
    """Stride-2 transpose conv as 4 parity convs + interleave.

    XLA lowers ``lhs_dilation`` convs poorly (the dilated input quadruples
    the tap count); the subpixel decomposition runs 4 dense convs with
    kernel ``k/2`` and interleaves — ~4x fewer analytical bytes.  Only the
    (8, 8, kz) / stride (2, 2, 1) geometry the model family uses.
    """
    outs = []
    for rx in (0, 1):
        row = []
        for ry in (0, 1):
            e = subs[rx][ry]
            row.append(
                conv_packed(
                    x, e["wp"], e["kzb"], e["nbl"], kz=up_kz, cout=cout,
                    bias=bias, pad_xy=(k_xy[0] // 2 - 1, k_xy[1] // 2 - 1),
                    z_grow=up_kz - 1, dtype=dtype,
                )
            )
        outs.append(row)
    # interleave parities: out[2m+rx, 2k+ry] = outs[rx][ry][m, k]
    a = jnp.stack(
        [jnp.stack([outs[0][0].data, outs[0][1].data], axis=3),
         jnp.stack([outs[1][0].data, outs[1][1].data], axis=3)],
        axis=2,
    )  # [B, Xo, 2, Yo, 2, nb, L]
    b_, Xo, _, Yo, _, nb, L = a.shape
    data = a.reshape(b_, Xo * 2, Yo * 2, nb, L)
    return _Packed(data, outs[0][0].zb, cout, outs[0][0].z_len)


def pack_tconv_subpixel_weights(
    w_up: np.ndarray, zb: int, up_kz: int
) -> List[List[Dict]]:
    """Build the 4 parity kernels of a k=(8,8,kz) stride-(2,2,1) torch
    ConvTranspose: ``kernel[rx][ry][ux, uy] = w[k-2-2ux+rx, k-2-2uy+ry]``
    (x/y flip embedded), z flipped and left-extended like the plain path."""
    kx = w_up.shape[0]
    ky = w_up.shape[1]
    subs: List[List[Dict]] = []
    for rx in (0, 1):
        row = []
        for ry in (0, 1):
            ux = np.arange(kx // 2)
            uy = np.arange(ky // 2)
            sub = w_up[kx - 2 - 2 * ux + rx][:, ky - 2 - 2 * uy + ry]
            sub = np.ascontiguousarray(sub[:, :, ::-1])  # flip z
            wp, kzb, nbl = pack_conv_weights(sub, zb, z_shift=-(up_kz - 1))
            row.append(dict(wp=wp, kzb=kzb, nbl=nbl))
        subs.append(row)
    return subs


def pool_packed(x: _Packed) -> _Packed:
    """(2, 2, 1) max pool as strided-slice max (z untouched: per-lane)."""
    d = x.data
    ex = (d.shape[1] // 2) * 2
    ey = (d.shape[2] // 2) * 2
    d = d[:, :ex, :ey]
    out = jnp.maximum(d[:, 0::2, 0::2], d[:, 1::2, 0::2])
    out = jnp.maximum(out, jnp.maximum(d[:, 0::2, 1::2], d[:, 1::2, 1::2]))
    return _Packed(out, x.zb, x.c, x.z_len)


def crop_join(up: _Packed, skip: _Packed) -> _Packed:
    """Top-left crop both to the common spatial extent and lane-concat
    channels (c-major packing makes this a plain concatenate; the z crop is
    purely logical — prefix crops never move data)."""
    assert up.zb == skip.zb
    cx = min(up.spatial()[0], skip.spatial()[0])
    cy = min(up.spatial()[1], skip.spatial()[1])
    cz = min(up.z_len, skip.z_len)
    nb = min(up.nb, skip.nb)
    a = up.data[:, :cx, :cy, :nb]
    b = skip.data[:, :cx, :cy, :nb]
    return _Packed(jnp.concatenate([a, b], axis=-1), up.zb, up.c + skip.c, cz)


# ---------------------------------------------------------------------------
# the compiler
# ---------------------------------------------------------------------------


def _folded_conv_params(params, stats, groups: int):
    """Extract conv weights with inference BN folded in (f32)."""
    w = np.asarray(params["kernel"], np.float32)
    b = np.asarray(params["bias"], np.float32)
    if groups > 1:
        w = np.asarray(block_diagonal_weights(jnp.asarray(w), groups))
    bn = params["BatchNorm_0"]
    w_f, b_f = fold_bn_into_conv(
        jnp.asarray(w),
        jnp.asarray(b),
        jnp.asarray(bn["scale"], jnp.float32),
        jnp.asarray(bn["bias"], jnp.float32),
        jnp.asarray(stats["BatchNorm_0"]["mean"], jnp.float32),
        jnp.asarray(stats["BatchNorm_0"]["var"], jnp.float32),
    )
    return np.asarray(w_f, np.float32), np.asarray(b_f, np.float32)


def _tile_bias(b: np.ndarray, zb: int) -> jnp.ndarray:
    """Per-channel bias -> per-lane (c-major: repeat each channel zb times)."""
    return jnp.asarray(np.repeat(b, zb))


def default_zb_plan(feature_sizes: Sequence[int]) -> List[int]:
    """Per-level z-block sizes: lanes ~= 128 at each level's working width.

    Level i's convs run at C = feature_sizes[i]; the decoder mirrors the
    encoder's plan.  zb = clamp(128 // C, 1, 8), measured best on v5e."""
    return [max(1, min(8, 128 // int(c))) for c in feature_sizes]


def compile_serving_apply(
    model,
    variables: Dict,
    *,
    dtype: Any = jnp.bfloat16,
    zb_plan: Optional[Sequence[int]] = None,
    subpixel_tconv: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build the packed inference forward for a 3D valid-conv UNet.

    Returns ``apply(tiles[B, tx, ty, tz, C]) -> logits`` (float32),
    numerically equivalent to ``model.apply(variables, tiles, train=False)``
    up to BN-folding rounding.  Falls back to the plain path for 2D configs
    or dilation > 1.
    """
    cfg: UNetConfig = model.config
    if cfg.image_dimensions != 3 or cfg.dilation != 1:
        return jax.tree_util.Partial(
            lambda v, t: model.apply(v, t, train=False), variables
        )

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    feats = cfg.feature_sizes
    n_levels = len(feats)
    zb_plan = list(zb_plan) if zb_plan is not None else default_zb_plan(feats)

    kz1, kz2 = cfg.kernel1[2], cfg.kernel2[2]
    up_kz = cfg.upsample_kernel[2]
    up_sz = cfg.upsample_stride[2]
    if up_sz != 1 or cfg.max_pool_kernel != (2, 2, 1):
        return jax.tree_util.Partial(
            lambda v, t: model.apply(v, t, train=False), variables
        )

    # --- pre-pack every weight (host, once) ---
    def packed_block(scope_params, scope_stats, zb, groups):
        out = []
        for i in (0, 1):
            w, b = _folded_conv_params(
                scope_params[f"ConvBNRelu_{i}"], scope_stats[f"ConvBNRelu_{i}"],
                groups,
            )
            wp, kzb, nbl = pack_conv_weights(w, zb)
            out.append(
                dict(
                    wp=wp, kzb=kzb, nbl=nbl, kz=w.shape[2], cout=w.shape[-1],
                    bias=_tile_bias(b, zb),
                )
            )
        return out

    downs = []
    for i in range(n_levels):
        downs.append(
            packed_block(
                params[f"down{i}"], stats[f"down{i}"], zb_plan[i], cfg.groups
            )
        )

    # measured on v5e: the subpixel decomposition's interleave copies cost
    # more than the lhs_dilation savings inside the fused program (265 vs
    # 238 ms on the batch-6 tile), so it is opt-in
    use_subpixel = subpixel_tconv and (
        tuple(cfg.upsample_stride[:2]) == (2, 2)
        and cfg.upsample_kernel[0] % 2 == 0
        and cfg.upsample_kernel[1] % 2 == 0
    )

    ups = []
    for i in range(n_levels - 1):
        level = n_levels - 2 - i  # level this Up block lands on
        zb = zb_plan[level]
        zb_in = zb_plan[level + 1]  # the T-conv runs at the incoming zb
        p = params[f"up{i}"]
        s = stats[f"up{i}"]
        w_up = np.asarray(p["up_kernel"], np.float32)  # [kx, ky, kz, Cin, Cout]
        b_up = np.asarray(p["up_bias"], np.float32)
        if use_subpixel:
            up_entry = dict(
                subs={
                    z: pack_tconv_subpixel_weights(w_up, z, up_kz)
                    for z in {zb, zb_in}
                },
                cout=w_up.shape[-1],
                bias={z: _tile_bias(b_up, z) for z in {zb, zb_in}},
                k_xy=(cfg.upsample_kernel[0], cfg.upsample_kernel[1]),
            )
        else:
            # torch ConvTranspose == conv with flipped kernel, (k-1) zero
            # padding, lhs_dilation=stride.  z: stride 1, pad (kz-1)=1 ->
            # z_shift = -(kz-1)
            w_upf = np.ascontiguousarray(w_up[::-1, ::-1, ::-1])
            packed = {}
            for z in {zb, zb_in}:
                wp, kzb, nbl = pack_conv_weights(w_upf, z, z_shift=-(up_kz - 1))
                packed[z] = dict(wp=wp, kzb=kzb, nbl=nbl, bias=_tile_bias(b_up, z))
            up_entry = dict(
                packed=packed, cout=w_up.shape[-1],
                pad_xy=(cfg.upsample_kernel[0] - 1, cfg.upsample_kernel[1] - 1),
                lhs_dilation=(cfg.upsample_stride[0], cfg.upsample_stride[1]),
                z_grow=up_kz - 1,
            )
        ups.append((up_entry, packed_block(p, s, zb, cfg.groups)))

    w_out = np.asarray(params["out_kernel"], np.float32)
    b_out = np.asarray(params["out_bias"], np.float32)
    zb_out = zb_plan[0]
    wp_out, kzb_out, nbl_out = pack_conv_weights(w_out, zb_out)
    bias_out = _tile_bias(b_out, zb_out)

    def apply_fn(tiles: jnp.ndarray) -> jnp.ndarray:
        x = _Packed(
            pack_volume(tiles.astype(dtype), zb_plan[0]),
            zb_plan[0],
            cfg.in_channels,
            tiles.shape[3],
        )
        skips: List[_Packed] = []
        for i in range(n_levels):
            if x.zb != zb_plan[i]:
                x = _Packed(
                    repack(x.data, x.zb, zb_plan[i], x.z_len, x.c),
                    zb_plan[i], x.c, x.z_len,
                )
            for conv in downs[i]:
                x = conv_packed(
                    x, conv["wp"], conv["kzb"], conv["nbl"],
                    kz=conv["kz"], cout=conv["cout"], bias=conv["bias"],
                    relu=True, dtype=dtype,
                )
            if i < n_levels - 1:
                skips.append(x)
                x = pool_packed(x)
        for i, (up_entry, block) in enumerate(ups):
            level = n_levels - 2 - i
            # repack (cheap, pre-upsample resolution) then T-conv at the
            # level's zb.  Running the T-conv at the incoming (smaller) zb
            # and repacking at full resolution was measured WORSE on v5e
            # (243.9 vs 239.2 ms): the full-res repack traffic outweighs the
            # T-conv FLOP savings.
            if x.zb != zb_plan[level]:
                x = _Packed(
                    repack(x.data, x.zb, zb_plan[level], x.z_len, x.c),
                    zb_plan[level], x.c, x.z_len,
                )
            if x.nb * x.zb != x.z_len:
                # the z-growing T-conv reads one slot past z_len, which must
                # be zero (torch's z padding), not leftover garbage
                x = zero_garbage_slots(x)
            if use_subpixel:
                x = tconv_packed_subpixel(
                    x, up_entry["subs"][x.zb], up_kz=up_kz,
                    cout=up_entry["cout"],
                    bias=up_entry["bias"][x.zb], k_xy=up_entry["k_xy"],
                    dtype=dtype,
                )
            else:
                e = up_entry["packed"][x.zb]
                x = conv_packed(
                    x, e["wp"], e["kzb"], e["nbl"],
                    kz=up_kz, cout=up_entry["cout"], bias=e["bias"],
                    lhs_dilation=up_entry["lhs_dilation"],
                    pad_xy=up_entry["pad_xy"], z_grow=up_entry["z_grow"],
                    dtype=dtype,
                )
            skip = skips.pop()
            if cfg.reference_skip_bug:
                cx = min(x.spatial()[0], skip.spatial()[0])
                cy = min(x.spatial()[1], skip.spatial()[1])
                cz = min(x.z_len, skip.z_len)
                nb = min(x.nb, skip.nb)
                a = x.data[:, :cx, :cy, :nb]
                x = _Packed(
                    jnp.concatenate([a, a], axis=-1), x.zb, 2 * x.c, cz
                )
            else:
                x = crop_join(x, skip)
            for conv in block:
                x = conv_packed(
                    x, conv["wp"], conv["kzb"], conv["nbl"],
                    kz=conv["kz"], cout=conv["cout"], bias=conv["bias"],
                    relu=True, dtype=dtype,
                )
        x = conv_packed(
            x, wp_out, kzb_out, nbl_out, kz=1, cout=cfg.out_channels,
            bias=bias_out, dtype=dtype,
        )
        out = unpack_volume(x.data, x.zb, x.z_len, cfg.out_channels)
        return out.astype(jnp.float32)

    return apply_fn
