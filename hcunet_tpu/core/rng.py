"""PRNG key plumbing.

The reference drives all randomness from numpy's global seed, with the
``joint_transform`` decorator (``hcat/transforms.py:15-91``) drawing one
``np.random.randint(0, 1e8)`` seed per call so the same random transform hits
every image in a list.  In JAX that trick becomes explicit key splitting:
one key per sample, shared across the images of that sample, split per
transform.  This module centralizes the conventions.
"""

from __future__ import annotations

from typing import Iterator

import jax


def key_stream(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys derived from ``key``."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def fold_in_str(key: jax.Array, name: str) -> jax.Array:
    """Derive a named subkey — stable across runs for the same name."""
    h = 0
    for ch in name:
        h = (h * 131 + ord(ch)) % (2**31 - 1)
    return jax.random.fold_in(key, h)
