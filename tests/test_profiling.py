"""Profiling / numerical-hygiene utility tests."""

import numpy as np
import pytest


def test_timed_and_device_sync():
    import jax.numpy as jnp

    from hcunet_tpu.utils.profiling import timed

    x = jnp.ones((64, 64))
    with timed("matmul", sync=None) as t0:
        y = x @ x
    with timed("matmul", sync=y) as t1:
        y = x @ x
    assert t1.seconds >= 0 and t0.seconds >= 0


def test_assert_finite_names_bad_leaf():
    import jax.numpy as jnp

    from hcunet_tpu.utils.profiling import assert_finite

    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_finite(good, "params")  # no raise
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    with pytest.raises(FloatingPointError, match="b.*c"):
        assert_finite(bad, "params")


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    from hcunet_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        _ = (jnp.ones((32, 32)) @ jnp.ones((32, 32))).sum()
    import os

    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "profiler trace produced no files"
