"""Recurrent U-Net (GRU-style) — ``lax.scan`` re-design of
``hcat/r_unet.py:38-204``.

The reference runs a Python loop of 10 timesteps, each concatenating the
image with the previous 5-channel state, passing through a 2-level
*same-padding* U-Net with two gated branches:

    x   = down1(cat(image, s_t))         # 9 -> 16 channels
    a   = x;  x = maxpool(x)
    h   = tanh(fh(x));  z = sigmoid(fz(x))
    h_t = h_t * z + (-1 * z * h)         # note: NOT a standard GRU update
    s_t = out_conv(up2(h_t, a))          # -> 5 channels [prob, center, z/y/x]

On TPU the timestep loop is a ``lax.scan`` carrying ``(s_t, h_t)`` — one
compiled step body instead of 10 unrolled copies.

Parity notes:
* The update ``h_t*z + (-1*z*h) == z*(h_t - h)`` is kept verbatim
  (``r_unet.py:155``), oddness and all.
* The reference hardcodes ``.cuda()`` for the t=0 states
  (``r_unet.py:141,152``) — device placement is implicit here.
* Like the main U-Net, the reference's ``Up`` discards the skip
  (``y = crop(x, y)``, ``r_unet.py:332``); ``reference_skip_bug`` restores
  that for parity testing (the channel counts work out either way because
  skip and upsampled tensors share a channel count).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hcunet_tpu.config import RUNetConfig
from hcunet_tpu.ops.conv import conv_same, conv_transpose_torch, max_pool


class SameConvBNRelu(nn.Module):
    """conv(same padding) → BN → ReLU (reference r_unet ``Down`` half)."""

    features: int
    kernel: Tuple[int, ...]
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            tuple(self.kernel) + (x.shape[-1], self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = conv_same(x.astype(self.dtype), w.astype(self.dtype), b, padding=self.padding)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x.astype(self.dtype))
        return nn.relu(x).astype(self.dtype)


class RDown(nn.Module):
    """Two same-padding conv-BN-relu steps (``r_unet.py:250-285``)."""

    features: int
    kernel: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SameConvBNRelu(self.features, self.kernel, 1, self.dtype)(x, train)
        x = SameConvBNRelu(self.features, self.kernel, 1, self.dtype)(x, train)
        return x


class RUp(nn.Module):
    """Transpose-conv upsample + join + two convs (``r_unet.py:288-336``)."""

    features: int
    kernel: Tuple[int, ...]
    up_kernel: Tuple[int, ...]
    up_stride: Tuple[int, ...]
    up_padding: int = 2
    reference_skip_bug: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        w_up = self.param(
            "up_kernel",
            nn.initializers.he_normal(),
            tuple(self.up_kernel) + (x.shape[-1], self.features),
            jnp.float32,
        )
        b_up = self.param("up_bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = conv_transpose_torch(
            x.astype(self.dtype), w_up.astype(self.dtype), b_up,
            stride=self.up_stride, padding=self.up_padding,
        )
        common = tuple(
            min(int(a), int(b)) for a, b in zip(x.shape[1:-1], skip.shape[1:-1])
        )
        slc = (slice(None),) + tuple(slice(0, c) for c in common) + (slice(None),)
        x = x[slc]
        joined = x if self.reference_skip_bug else skip[slc].astype(self.dtype)
        x = jnp.concatenate([x, joined], axis=-1)
        x = SameConvBNRelu(self.features, self.kernel, 1, self.dtype)(x, train)
        x = SameConvBNRelu(self.features, self.kernel, 1, self.dtype)(x, train)
        return x


class GateBranch(nn.Module):
    """The ``f`` mini-U-net shared topology (``r_unet.py:232-246``):
    down → stash → pool → down → up."""

    c_mid: int
    c_deep: int
    kernel: Tuple[int, ...]
    up_kernel: Tuple[int, ...]
    up_stride: Tuple[int, ...]
    pool: Tuple[int, ...]
    reference_skip_bug: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = RDown(self.c_mid, self.kernel, self.dtype, name="down_a")(x, train)
        b = x
        x = max_pool(x, self.pool)
        x = RDown(self.c_deep, self.kernel, self.dtype, name="down_b")(x, train)
        x = RUp(
            self.c_mid, self.kernel, self.up_kernel, self.up_stride, 2,
            self.reference_skip_bug, self.dtype, name="up",
        )(x, b, train)
        return x


class RUNetStep(nn.Module):
    """One recurrence step (the body of the reference's t-loop,
    ``r_unet.py:139-160``) — scanned by :class:`RecursiveUNet`."""

    config: RUNetConfig
    reference_skip_bug: bool = False
    dtype: Any = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, carry, _):
        cfg = self.config
        c0, c1, c2 = cfg.channels
        image, s_t, h_t = carry
        spatial = image.shape[1:-1]

        x = jnp.concatenate([image.astype(self.dtype), s_t], axis=-1)
        x = RDown(c0, cfg.kernel, self.dtype, name="down1")(x, self.train)
        a = x
        x = max_pool(x, cfg.max_pool_kernel)
        h = jnp.tanh(
            GateBranch(
                c1, c2, cfg.kernel, cfg.upsample_kernel, cfg.upsample_stride,
                cfg.max_pool_kernel, self.reference_skip_bug, self.dtype,
                name="fh",
            )(x, self.train)
        )
        z = jax.nn.sigmoid(
            GateBranch(
                c1, c2, cfg.kernel, cfg.upsample_kernel, cfg.upsample_stride,
                cfg.max_pool_kernel, self.reference_skip_bug, self.dtype,
                name="fz",
            )(x, self.train)
        )
        # h_t arrives as ones for t=0 (the reference initializes it from the
        # first h — r_unet.py:151-152)
        h_t = crop_like(h_t, h) * z + (-1.0 * z * h)  # r_unet.py:155, verbatim
        x = RUp(
            c0, cfg.kernel, cfg.upsample_kernel, cfg.upsample_stride, 2,
            self.reference_skip_bug, self.dtype, name="up2",
        )(h_t, a, self.train)
        out_w = self.param(
            "out_kernel", nn.initializers.he_normal(),
            (1, 1, 1, c0, cfg.out_channels), jnp.float32,
        )
        out_b = self.param(
            "out_bias", nn.initializers.zeros, (cfg.out_channels,), jnp.float32
        )
        x = conv_same(
            x.astype(self.dtype), out_w.astype(self.dtype), out_b, padding=0,
            accum_dtype=self.dtype,
        )
        if x.shape[1:-1] != spatial:
            # odd xy sizes lose a pixel through pool->upsample; the reference
            # simply crashes there (torch cat shape mismatch at t=1) —
            # zero-pad the state back instead so the scan carry keeps one
            # type. Identity for even sizes.
            widths = [(0, 0)] + [
                (0, s - c) for s, c in zip(spatial, x.shape[1:-1])
            ] + [(0, 0)]
            x = jnp.pad(x, widths)
        return (image, x, h_t.astype(self.dtype)), x


def crop_like(a, b):
    """Top-left crop ``a``'s spatial axes down to ``b``'s (identity when
    equal) — keeps the carried gate state aligned for odd sizes."""
    if a.shape == b.shape:
        return a
    slc = (slice(None),) + tuple(slice(0, s) for s in b.shape[1:-1]) + (slice(None),)
    return a[slc]


class RecursiveUNet(nn.Module):
    """The full recurrent model (``r_unet.py:38-160``).

    The timestep loop is an ``nn.scan`` — one traced step body instead of
    ``timesteps`` unrolled copies (the unrolled version took >5 min to
    compile on the remote TPU toolchain; the scanned one compiles ~10x
    faster and trains with O(1) live activations per step).
    """

    config: RUNetConfig
    reference_skip_bug: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = False, return_sequence: bool = False):
        cfg = self.config
        if image.ndim != 5:
            raise ValueError(f"expected [B, X, Y, Z, C], got {image.shape}")
        c1 = cfg.channels[1]
        B = image.shape[0]
        spatial = image.shape[1:-1]

        # the gate-branch output spatial shape (h_t's shape): same-padding
        # convs keep sizes; pool halves x/y (floor); the up step doubles and
        # top-left-crops to the skip — q when q even, q-1 when odd.
        pooled = [
            s // k for s, k in zip(spatial, cfg.max_pool_kernel)
        ]
        gate_xy = [
            (q if q % 2 == 0 else q - 1) if k > 1 else q
            for q, k in zip(pooled, cfg.max_pool_kernel)
        ]
        h0 = jnp.ones((B, *gate_xy, c1), self.dtype)
        s0 = jnp.zeros((B, *spatial, cfg.out_channels), self.dtype)

        scan = nn.scan(
            RUNetStep,
            variable_broadcast=["params"] + ([] if train else ["batch_stats"]),
            variable_carry=["batch_stats"] if train else [],
            split_rngs={"params": False},
            length=cfg.timesteps,
        )
        (image_out, s_t, h_t), seq = scan(
            cfg, self.reference_skip_bug, self.dtype, train, name="step"
        )((image, s0, h0), None)
        if return_sequence:
            return s_t, seq
        return s_t
