"""ResNet backbone (flax) for the detection head.

The reference gets its backbone for free from torchvision
(``fasterrcnn_resnet50_fpn``, ``hcat/rcnn.py:14``).  This is a standard
bottleneck ResNet with the torchvision layout so torchvision weights can be
ported (``hcunet_tpu/utils/port_torch.py`` conventions); pretrained weights
are not bundled (zero-egress environment) — detectors here train from
scratch or load ported checkpoints.

Returns the C2..C5 feature maps for FPN consumption.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp


class BottleneckBlock(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype,
            scale_init=nn.initializers.zeros,  # zero-init last BN (std trick)
        )(y)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Bottleneck ResNet; ``stage_sizes`` (3,4,6,3) = ResNet50."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        y = nn.Conv(
            self.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = {}
        for stage, n_blocks in enumerate(self.stage_sizes):
            width = self.width * (2**stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = BottleneckBlock(
                    width, stride, self.dtype, name=f"stage{stage + 2}_block{b}"
                )(y, train)
            feats[f"c{stage + 2}"] = y
        return feats


class SmallBackbone(nn.Module):
    """A light conv backbone for fast tests / small detectors — same output
    contract as :class:`ResNet` (c2..c5 at strides 4/8/16/32)."""

    width: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = {}
        y = x
        for i, name in enumerate(["c2", "c3", "c4", "c5"]):
            stride = 4 if i == 0 else 2
            y = nn.Conv(
                self.width * (2**i), (3, 3), strides=(stride, stride),
                padding="SAME", dtype=self.dtype,
            )(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
            y = nn.relu(y)
            y = nn.Conv(
                self.width * (2**i), (3, 3), padding="SAME", dtype=self.dtype
            )(y)
            y = nn.relu(y)
            feats[name] = y
        return feats
