"""RDCNet — recurrent dilated-convolution network (``hcat/r_unet.py:207-227``)
with its StackedDilation block (``r_unet.py:339-364``).

Structure: stride-2 input conv → 10 iterations of
``y = RDCBlock(cat(x, y)) + y`` → 3×3 conv → transpose-conv back to full
resolution.  The iteration is an ``nn.scan`` recurrence — one traced body
instead of 10 unrolled copies (unrolled, the 50 dilated 3D convs stall the
remote TPU compiler past 10 minutes; scanned it compiles in seconds).

StackedDilation evaluates five 5×5×5 convs at dilations 1..5 (paddings
2,4,6,8,10 keep spatial size) and merges with a 1×1 conv.  On TPU the five
parallel convs become one grouped conv over a channel-tiled input: the input
is repeated 5× along channels and each group owns one dilation — but XLA
cannot vary dilation per group, so we keep five ``lax`` convs; they fuse
into independent MXU calls that overlap fine.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from hcunet_tpu.config import RDCNetConfig
from hcunet_tpu.ops.conv import conv_same, conv_transpose_torch


class StackedDilation(nn.Module):
    """Multi-receptive-field block: parallel dilated convs, concat, 1×1 merge."""

    features: int
    kernel: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        k = (self.kernel,) * 3
        for d in range(1, 6):
            w = self.param(
                f"conv{d}_kernel",
                nn.initializers.he_normal(),
                k + (x.shape[-1], self.features),
                jnp.float32,
            )
            b = self.param(
                f"conv{d}_bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            outs.append(
                conv_same(
                    x.astype(self.dtype), w.astype(self.dtype), b,
                    padding=2 * d, dilation=d,
                )
            )
        cat = jnp.concatenate(outs, axis=-1)
        w = self.param(
            "merge_kernel",
            nn.initializers.he_normal(),
            (1, 1, 1, 5 * self.features, self.features),
            jnp.float32,
        )
        b = self.param("merge_bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return conv_same(cat.astype(self.dtype), w.astype(self.dtype), b, padding=0)


class RDCBlock(nn.Module):
    """1×1 squeeze then StackedDilation (``r_unet.py:367-378``)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "squeeze_kernel",
            nn.initializers.he_normal(),
            (1, 1, 1, x.shape[-1], self.features),
            jnp.float32,
        )
        b = self.param("squeeze_bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = conv_same(x.astype(self.dtype), w.astype(self.dtype), b, padding=0)
        return StackedDilation(self.features, dtype=self.dtype)(x)


class _RDCStep(nn.Module):
    """One recurrence iteration (``y = RDCBlock(cat(x, y)) + y``) — scanned
    by :class:`RDCNet` with broadcast (shared) params."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        x, y = carry
        y = RDCBlock(self.features, self.dtype, name="rdc_block")(
            jnp.concatenate([x, y], axis=-1)
        ) + y
        return (x, y), None


class RDCNet(nn.Module):
    """The full recurrent dilated model."""

    config: RDCNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = False):
        cfg = self.config
        if image.ndim != 5:
            raise ValueError(f"expected [B, X, Y, Z, C], got {image.shape}")
        c = cfg.complexity

        w_in = self.param(
            "in_kernel",
            nn.initializers.he_normal(),
            (3, 3, 3, image.shape[-1], c),
            jnp.float32,
        )
        b_in = self.param("in_bias", nn.initializers.zeros, (c,), jnp.float32)
        x = conv_same(
            image.astype(self.dtype), w_in.astype(self.dtype), b_in,
            stride=2, padding=1,
        )

        scan = nn.scan(
            _RDCStep,
            variable_broadcast=["params"],
            split_rngs={"params": False},
            length=cfg.timesteps,
        )
        (_, y), _ = scan(c, self.dtype, name="step")(
            (x, jnp.zeros_like(x)), None
        )

        w_out = self.param(
            "out_kernel", nn.initializers.he_normal(), (3, 3, 3, c, c), jnp.float32
        )
        b_out = self.param("out_bias", nn.initializers.zeros, (c,), jnp.float32)
        y = conv_same(y.astype(self.dtype), w_out.astype(self.dtype), b_out, padding=1)

        w_up = self.param(
            "up_kernel",
            nn.initializers.he_normal(),
            (4, 4, 4, c, cfg.out_channels),
            jnp.float32,
        )
        b_up = self.param(
            "up_bias", nn.initializers.zeros, (cfg.out_channels,), jnp.float32
        )
        return conv_transpose_torch(
            y.astype(self.dtype), w_up.astype(self.dtype), b_up,
            stride=(2, 2, 2), padding=(1, 1, 1),
        ).astype(jnp.float32)
