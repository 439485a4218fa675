"""Profiling + numerical-hygiene hooks.

The reference's only telemetry is wall-clock prints; its only numerical
hygiene is nan/inf scrubbing and hard raises (SURVEY.md §5.1-2).  Here:

* :func:`trace` — context manager around ``jax.profiler`` traces
  (view in TensorBoard / xprof);
* :func:`timed` — host wall-clock stage timing with an honest device sync
  (remote-attached TPUs return from ``block_until_ready`` at dispatch; a
  scalar readback is the only reliable barrier);
* :func:`enable_nan_checks` — flips ``jax_debug_nans``;
* :func:`assert_finite` — pytree finite check that names the bad leaf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x: Any) -> None:
    """Force completion of all computation feeding every leaf of ``x``.

    On remote-attached platforms ``block_until_ready`` can return at
    dispatch, so each leaf also gets a scalar device→host readback —
    the reliable barrier (leaves may live on different devices/shards).
    """
    for leaf in jax.tree_util.tree_leaves(x):
        arr = jnp.asarray(leaf)
        arr.block_until_ready()
        if arr.size:
            float(arr.ravel()[0])


class timed:
    """``with timed("stage") as t: ...`` then ``t.seconds``."""

    def __init__(self, label: str = "", sync: Any = None):
        self.label = label
        self.sync = sync
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            device_sync(self.sync)
        self.seconds = time.perf_counter() - self._t0
        return False


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def assert_finite(tree: Any, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = jnp.asarray(leaf)
        if not bool(jnp.isfinite(arr).all()):
            key = "/".join(str(p) for p in path)
            raise FloatingPointError(f"non-finite values in {name}{key}")
