"""Feature Pyramid Network over ResNet C2..C5 → P2..P6 (torchvision-style)."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = ["c2", "c3", "c4", "c5"]
        laterals = {
            n: nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name=f"lateral_{n}")(feats[n])
            for n in names
        }
        # top-down pathway with nearest-neighbor upsampling
        p = {"p5": laterals["c5"]}
        for hi, lo in (("c5", "c4"), ("c4", "c3"), ("c3", "c2")):
            up = p[f"p{hi[1]}"]
            target = laterals[lo]
            up = jax.image.resize(
                up,
                (up.shape[0], target.shape[1], target.shape[2], up.shape[3]),
                method="nearest",
            )
            p[f"p{lo[1]}"] = target + up
        out = {}
        for lvl in ("p2", "p3", "p4", "p5"):
            out[lvl] = nn.Conv(
                self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"output_{lvl}",
            )(p[lvl])
        # p6: stride-2 max pool of p5 (torchvision LastLevelMaxPool)
        out["p6"] = nn.max_pool(out["p5"], (1, 1), strides=(2, 2))
        return out
