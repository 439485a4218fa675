"""Test harness configuration.

Tests run on an 8-device virtual CPU mesh — the TPU-native answer to "test
multi-device code without a pod" (see SURVEY.md §4).  The env vars must be
set before jax initializes, which pytest guarantees by importing conftest
first.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    import jax

    return jax.random.PRNGKey(0)
