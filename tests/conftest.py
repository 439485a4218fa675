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

# Persistent XLA compile cache: the suite's long pole is whole-model CPU
# compiles (packed serving program, detector trunk, recurrent scan), which
# are pure functions of the HLO — cache them across runs like the CLI and
# bench already do.  First-ever run builds the cache; warm runs skip the
# compiles without touching any test's assertions.
from hcunet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

# Long-running tests (>10 s on this machine, mostly whole-model compiles or
# training loops) carry the ``slow`` marker so iteration runs can use
# ``pytest -m 'not slow'`` (~2 min) while full/oracle runs keep everything.
# Kept in one place instead of scattered decorators.
SLOW_TESTS = {
    "test_detector_learns_synthetic_box",
    "test_detect_contract",
    "test_tiled_detection_driver",
    "test_analyze_with_trained_detector_localizes_cells",
    "test_analyze_end_to_end",
    "test_analyze_resumes_from_journal",
    "test_sharded_train_step_runs_and_matches_single",
    "test_spatial_sharded_forward_matches_dense",
    "test_segmenter_sharded_matches_single_device",
    "test_segmenter_sharded_with_postprocess_and_packed",
    "test_analyze_sharded_matches_single_device",
    "test_cli_analyze_spatial_shards",
    "test_tiled_matches_dense_when_aligned",
    "test_reference_grid_parity_with_torch_oracle",
    "test_fused_postprocess_matches_scipy",
    "test_tiled_threshold_output_uint8",
    "test_readme_2d_quickstart_trains",
    "test_cli_recurrent_train_and_predict_end_to_end",
    "test_unet_gradient_parity_with_reference",
    "test_matched_sgd_training_trajectory",
    "test_unet_forward_parity_with_reference",
    "test_unet_rejects_too_small_input",
    "test_runet_fixed_skips_run",
    "test_rdcnet_shape_invariance",
    "test_runet_parity",
    "test_segmenter_bf16",
    "test_training_state_resume",
    "test_pipeline_dice_vs_torch_reference_composition",
    "test_analyze_overlap_equals_sequential",
    "test_cli_analyze_end_to_end",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
