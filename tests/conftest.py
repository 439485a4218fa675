"""Test harness configuration.

Tests run on an 8-device virtual CPU mesh — the TPU-native answer to "test
multi-device code without a pod" (see SURVEY.md §4).

Note: in the TPU container a sitecustomize registers the TPU PJRT plugin at
interpreter startup and overrides ``JAX_PLATFORMS``, so env vars alone don't
stick; we force the cpu platform through jax.config here, before any backend
is initialized.  This also keeps concurrent test runs from contending for
the single TPU tunnel.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

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
    return jax.random.PRNGKey(0)
