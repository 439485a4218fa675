"""Packed serving compiler parity (infer/compile.py).

The serving path restructures the forward (BN folding, z-block lane packing,
packed T-convs, logical z-crops); these tests pin it to the plain
``model.apply`` on the full production architecture and its variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcunet_tpu.config import UNetConfig
from hcunet_tpu.infer.compile import (
    compile_serving_apply,
    default_zb_plan,
    pack_volume,
    unpack_volume,
)
from hcunet_tpu.models.unet import init_unet


def _parity(cfg, spatial, batch=1, atol=5e-5, **kwargs):
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), spatial)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (batch, *spatial, cfg.in_channels), jnp.float32
    )
    want = model.apply(variables, x, train=False)
    got = compile_serving_apply(model, variables, dtype=jnp.float32, **kwargs)(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)


def test_pack_unpack_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 5, 6, 11, 3))
    for zb in (1, 2, 4, 8):
        p = pack_volume(x, zb)
        back = unpack_volume(p, zb, 11, 3)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_serving_parity_production_3d():
    """Full production config (groups=2, anisotropic kernels)."""
    _parity(UNetConfig.production_3d(), (156, 156, 10))


def test_serving_parity_subpixel_tconv():
    _parity(UNetConfig.production_3d(), (156, 156, 10), subpixel_tconv=True)


def test_serving_parity_custom_zb_plan():
    _parity(UNetConfig.production_3d(), (156, 156, 10), zb_plan=[4, 4, 2, 1])


def test_serving_parity_reference_skip_bug():
    cfg = UNetConfig(reference_skip_bug=True)
    _parity(cfg, (156, 156, 10))


def test_serving_parity_small_net_batch2():
    cfg = UNetConfig(
        feature_sizes=(8, 16),
        kernel1=(3, 3, 2),
        kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2),
        max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1),
        groups=1,
    )
    _parity(cfg, (48, 48, 8), batch=2)


def test_serving_2d_falls_back_to_plain():
    cfg = UNetConfig.readme_2d()
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (188, 188))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 188, 188, 4), jnp.float32)
    fn = compile_serving_apply(model, variables)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        np.asarray(model.apply(variables, x, train=False)),
        atol=1e-6,
    )


def test_default_zb_plan():
    assert default_zb_plan((16, 32, 64, 128)) == [8, 4, 2, 1]
    assert default_zb_plan((8, 16)) == [8, 8]
