"""Convolution primitives for the valid-conv U-Net family.

These wrap ``lax.conv_general_dilated`` / ``lax.conv_transpose`` with the
framework's channels-last layout and the exact semantics of the reference's
torch layers (``hcat/unet.py:236-315``), so that reference checkpoints can be
ported weight-for-weight:

* valid (padding=0) convs with per-axis kernels, dilation, and groups;
* torch-style ``ConvTranspose`` (gradient-of-conv, padding=0);
* max pool with stride = kernel.

Convs map straight onto the MXU — XLA tiles a [spatial..., Cin] x
[Cin, Cout] contraction per output point and fuses the BN/ReLU epilogue, so
no hand-written Pallas kernel is needed for the conv itself (the Pallas wins
in this framework are the tiling epilogue and post-processing ops, see
``hcunet_tpu/ops/pallas``).  ``preferred_element_type=float32`` keeps MXU
accumulation in f32 even under bf16 inputs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _dim_numbers(nd: int) -> lax.ConvDimensionNumbers:
    """Channels-last dimension numbers for nd spatial dims.

    lhs: [B, *spatial, C]; rhs: [*spatial, Cin, Cout]; out: [B, *spatial, C].
    """
    lhs = "N" + "".join(chr(ord("0") + i) for i in range(nd)) + "C"
    rhs = "".join(chr(ord("0") + i) for i in range(nd)) + "IO"
    return lax.conv_dimension_numbers(
        (1,) * (nd + 2), (1,) * (nd + 2), (lhs, rhs, lhs)
    )


def block_diagonal_weights(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Expand grouped-conv weights [*k, Cin/g, Cout] to dense block-diagonal
    [*k, Cin, Cout].

    XLA's TPU grouped-convolution path is ~4-5x slower than a dense conv for
    the small group counts this model family uses (measured: conv1 of the
    production U-Net, 159ms grouped vs 38ms dense on v5e), so grouped convs
    run as dense convs whose cross-group weights are structurally zero —
    numerically identical, and the wasted FLOPs (x groups) are far cheaper
    than the slow path.
    """
    k = w.shape[:-2]
    cin_g, cout = w.shape[-2], w.shape[-1]
    cout_g = cout // groups
    dense = jnp.zeros((*k, cin_g * groups, cout), w.dtype)
    for j in range(groups):
        dense = dense.at[
            ..., j * cin_g : (j + 1) * cin_g, j * cout_g : (j + 1) * cout_g
        ].set(w[..., :, j * cout_g : (j + 1) * cout_g])
    return dense


# below this many input channels per group, dense block-diagonal wins
_GROUPED_DENSE_MAX_EXPANSION = 8


def conv_valid(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: Sequence[int] | int = 1,
    dilation: Sequence[int] | int = 1,
    groups: int = 1,
    accum_dtype=jnp.float32,
) -> jnp.ndarray:
    """Valid convolution, channels-last.

    ``x``: [B, *spatial, Cin]; ``w``: [*kspatial, Cin//groups, Cout].
    """
    nd = x.ndim - 2
    if isinstance(stride, int):
        stride = (stride,) * nd
    if isinstance(dilation, int):
        dilation = (dilation,) * nd
    feature_groups = groups
    if groups > 1 and groups <= _GROUPED_DENSE_MAX_EXPANSION:
        w = block_diagonal_weights(w, groups)
        feature_groups = 1
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding="VALID",
        rhs_dilation=tuple(dilation),
        dimension_numbers=_dim_numbers(nd),
        feature_group_count=feature_groups,
        preferred_element_type=accum_dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_same(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: Sequence[int] | int = 1,
    padding: Sequence[int] | int = 0,
    dilation: Sequence[int] | int = 1,
    groups: int = 1,
    accum_dtype=jnp.float32,
) -> jnp.ndarray:
    """Convolution with explicit symmetric zero padding (torch ``padding=p``).

    Used by the recurrent models (``hcat/r_unet.py``) which, unlike the main
    U-Net, run same-padding convs.
    """
    nd = x.ndim - 2
    if isinstance(stride, int):
        stride = (stride,) * nd
    if isinstance(padding, int):
        padding = (padding,) * nd
    if isinstance(dilation, int):
        dilation = (dilation,) * nd
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=[(int(p), int(p)) for p in padding],
        rhs_dilation=tuple(dilation),
        dimension_numbers=_dim_numbers(nd),
        feature_group_count=groups,
        preferred_element_type=accum_dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose_torch(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: Sequence[int] | int = 1,
    padding: Sequence[int] | int = 0,
    accum_dtype=jnp.float32,
) -> jnp.ndarray:
    """Transposed convolution with torch ``ConvTranspose{2,3}d`` semantics.

    ``w``: [*kspatial, Cout, Cin] stored torch-style-transposed as
    [*kspatial, Cin, Cout]? — we standardize on [*kspatial, Cout, Cin] being
    irrelevant: pass ``w`` as [*kspatial, Cin, Cout] ("input feeds output"),
    i.e. the same layout as :func:`conv_valid`, and we implement the
    fractionally-strided equivalent:

        out = conv_valid(zero_dilate(x, stride), flip(w)) cropped by padding

    which equals torch's output ``(in-1)*stride - 2*padding + kernel``.
    """
    nd = x.ndim - 2
    if isinstance(stride, int):
        stride = (stride,) * nd
    if isinstance(padding, int):
        padding = (padding,) * nd
    kernel = w.shape[:nd]
    # torch ConvTranspose = lhs-dilated conv with flipped kernel and padding
    # (k - 1 - p) on each side.
    pads = [(int(k - 1 - p), int(k - 1 - p)) for k, p in zip(kernel, padding)]
    w_flipped = jnp.flip(w, axis=tuple(range(nd)))
    out = lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1,) * nd,
        padding=pads,
        lhs_dilation=tuple(stride),
        dimension_numbers=_dim_numbers(nd),
        preferred_element_type=accum_dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def max_pool(x: jnp.ndarray, kernel: Sequence[int]) -> jnp.ndarray:
    """Max pool with stride = kernel (torch ``MaxPool`` default)."""
    nd = x.ndim - 2
    window = (1,) + tuple(kernel) + (1,)
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=window,
        window_strides=window,
        padding="VALID",
    )


def batch_norm_inference(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inference-mode batch norm folded to one multiply-add.

    Equivalent to torch ``BatchNorm{2,3}d.eval()`` with running stats
    (the BN-in-eval parity concern of SURVEY.md §7 hard-part (e))."""
    inv = lax.rsqrt(var.astype(jnp.float32) + eps) * scale.astype(jnp.float32)
    shift = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    return (x.astype(jnp.float32) * inv + shift).astype(x.dtype)


def fold_bn_into_conv(
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BN into the preceding conv's weights (speed-of-light
    eval path: one conv instead of conv+BN).

    ``w``: [*kspatial, Cin, Cout]; stats are per-Cout.
    """
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps) * scale.astype(jnp.float32)
    w_f = w.astype(jnp.float32) * inv  # broadcast over trailing Cout axis
    b0 = jnp.zeros_like(mean) if b is None else b.astype(jnp.float32)
    b_f = (b0 - mean.astype(jnp.float32)) * inv + bias.astype(jnp.float32)
    return w_f.astype(w.dtype), b_f
