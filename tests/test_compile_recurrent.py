"""Packed serving compiler parity for the recurrent family
(infer/compile_recurrent.py).

``RecursiveUNet``'s scan body is restructured (BN folding, z-block lane
packing with z-divisor blocks, packed same-pad convs and transpose convs);
these tests pin it to the plain ``model.apply``.  f32 must match to
float-rounding; bf16 drifts through the 10-step tanh/sigmoid recurrence
(each step amplifies rounding), so it is only sanity-bounded relative to
the plain bf16 model, which drifts the same way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcunet_tpu.config import RUNetConfig
from hcunet_tpu.infer.compile_recurrent import compile_recurrent_apply, zb_for
from hcunet_tpu.models.runet import RecursiveUNet


def _parity(cfg, shape, atol=5e-5, skip_bug=False, dtype=jnp.float32):
    model = RecursiveUNet(cfg, reference_skip_bug=skip_bug)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (1, *shape, cfg.in_channels), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    want = model.apply(variables, x, train=False)
    got = compile_recurrent_apply(model, variables, dtype=dtype)(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)
    return model, variables, x, want


def test_zb_for_divisors_only():
    for z in (5, 6, 10, 12):
        for c in (9, 16, 32, 64):
            zb = zb_for(c, z)
            assert z % zb == 0, (z, c, zb)
    # the measured 64//c rule (see zb_for docstring for the v5e sweep)
    assert zb_for(16, 6) == 3  # target 4 -> nearest divisor of 6
    assert zb_for(32, 6) == 2
    assert zb_for(64, 10) == 1
    assert zb_for(16, 10) == 5


def test_recurrent_parity_default_config():
    """Production RUNet geometry (channels 16/32/64, k=3, up (6,6,5))."""
    _parity(RUNetConfig(timesteps=3), (32, 32, 6))


def test_recurrent_parity_ten_timesteps():
    _parity(RUNetConfig(timesteps=10), (16, 16, 5), atol=2e-4)


def test_recurrent_parity_skip_bug():
    _parity(RUNetConfig(timesteps=2), (16, 16, 6), skip_bug=True)


def test_recurrent_parity_fused_tconv():
    """The lhs_dilation T-conv path (subpixel decomposition off)."""
    cfg = RUNetConfig(timesteps=2)
    model = RecursiveUNet(cfg)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (1, 16, 16, 6, cfg.in_channels), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    want = model.apply(variables, x, train=False)
    got = compile_recurrent_apply(
        model, variables, dtype=jnp.float32, subpixel_tconv=False
    )(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_recurrent_parity_explicit_plan():
    cfg = RUNetConfig(timesteps=2)
    model = RecursiveUNet(cfg)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (1, 16, 16, 10, cfg.in_channels), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    want = model.apply(variables, x, train=False)
    got = compile_recurrent_apply(
        model, variables, dtype=jnp.float32, zb_plan=(5, 2, 2)
    )(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)
    with pytest.raises(ValueError):
        compile_recurrent_apply(
            model, variables, dtype=jnp.float32, zb_plan=(4, 2, 2)
        )(x)


def test_recurrent_parity_z_indivisible_by_lane_target():
    """z=7 (prime): zb falls back to 7 or 1 — both must stay exact."""
    _parity(RUNetConfig(timesteps=2), (16, 16, 7))


def test_recurrent_bf16_tracks_plain_bf16():
    """bf16 drift comes from the recurrence, not the packing: the packed
    bf16 output must sit within a few x of the plain model's own bf16
    drift from f32."""
    cfg = RUNetConfig(timesteps=10)
    model = RecursiveUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 6, cfg.in_channels))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    ref32 = model.apply(variables, x, train=False)
    plain16 = RecursiveUNet(cfg, dtype=jnp.bfloat16).apply(
        variables, x, train=False
    )
    packed16 = compile_recurrent_apply(model, variables, dtype=jnp.bfloat16)(x)
    plain_drift = float(jnp.abs(ref32 - plain16.astype(jnp.float32)).max())
    packed_drift = float(jnp.abs(ref32 - packed16).max())
    assert packed_drift < max(4.0 * plain_drift, 0.05), (
        packed_drift, plain_drift
    )


def _rdc_parity(cfg, shape, atol=5e-5, rtol=1e-6, dtype=jnp.float32, zb=None):
    from hcunet_tpu.infer.compile_recurrent import compile_rdcnet_apply
    from hcunet_tpu.models.rdcnet import RDCNet

    model = RDCNet(cfg)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (1, *shape, cfg.in_channels), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(1), x)
    want = model.apply(variables, x, train=False)
    got = compile_rdcnet_apply(model, variables, dtype=dtype, zb=zb)(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=atol, rtol=rtol
    )


def test_rdcnet_packed_parity_default():
    """Production RDCNet geometry: c=10, 10 timesteps, z=10 -> half-z 5,
    zb 5 (VERDICT r3 #5 — the dilated 5^3 convs pack as strided z-block
    taps).  Ten residual accumulations at random-init magnitudes (~80)
    leave only f32-reorder rounding headroom -> relative tolerance."""
    from hcunet_tpu.config import RDCNetConfig

    _rdc_parity(
        RDCNetConfig(timesteps=10), (16, 16, 10), atol=1e-3, rtol=2e-3
    )


def test_rdcnet_packed_parity_z12_and_explicit_zb():
    from hcunet_tpu.config import RDCNetConfig

    cfg = RDCNetConfig(timesteps=2)
    _rdc_parity(cfg, (16, 16, 12), zb=3)
    _rdc_parity(cfg, (16, 16, 12), zb=6)


def test_rdcnet_packed_parity_odd_z():
    """z=9 -> half-z 5; z=7 -> half-z 4."""
    from hcunet_tpu.config import RDCNetConfig

    cfg = RDCNetConfig(timesteps=2)
    _rdc_parity(cfg, (16, 16, 9))
    _rdc_parity(cfg, (16, 16, 7))


def test_rdcnet_dispatched_by_compile_recurrent_apply():
    """compile_recurrent_apply must route RDCNet to the packed path (the
    round-3 silent plain-scan fallback is gone)."""
    from hcunet_tpu.config import RDCNetConfig
    from hcunet_tpu.models.rdcnet import RDCNet

    cfg = RDCNetConfig(timesteps=2)
    model = RDCNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 10, 4))
    variables = model.init(jax.random.PRNGKey(1), x)
    got = compile_recurrent_apply(model, variables, dtype=jnp.float32)(x)
    want = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-5
    )


def test_split_helpers_properties():
    """_split_stack / _halo_refresh / _split_unstack invariants for every
    tile count: (a) unstack(stack(v)) == v; (b) a freshly-stacked (globally
    consistent) tiling is a fixed point of the halo refresh; (c) after
    corrupting every tile's halo columns, one refresh restores exactly the
    stacked tiling."""
    from hcunet_tpu.infer.compile_recurrent import (
        _halo_refresh,
        _split_stack,
        _split_unstack,
    )

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((96, 5, 3), np.float32))
    for n, halo in ((2, 8), (3, 8), (4, 12), (6, 4)):
        core = 96 // n
        tile = core + (2 * halo if n >= 3 else halo)
        tiles = _split_stack(vol, n, tile, core)
        assert tiles.shape == (n, tile, 5, 3)
        np.testing.assert_array_equal(
            np.asarray(_split_unstack(tiles, halo))[0], np.asarray(vol)
        )
        np.testing.assert_array_equal(
            np.asarray(_halo_refresh(tiles, halo)), np.asarray(tiles)
        )
        corrupted = np.asarray(tiles).copy()
        for j in range(n):
            if j > 0:
                corrupted[j, :halo] = -1.0  # left halo (seam side)
            if j < n - 1:
                corrupted[j, tile - halo:] = -1.0  # right halo
        np.testing.assert_array_equal(
            np.asarray(_halo_refresh(jnp.asarray(corrupted), halo)),
            np.asarray(tiles),
        )


def test_recurrent_split_x_bit_identical():
    """split_x=2 (VERDICT r3 #8): per-timestep halo exchange of both
    carries keeps the tile interiors exact — the cropped/reassembled
    output must be BIT-identical to the unsplit packed program at f32
    (halo 32 >= the measured one-step receptive radius of 28)."""
    cfg = RUNetConfig(timesteps=4)
    model = RecursiveUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 32, 10, 4))
    variables = model.init(jax.random.PRNGKey(1), x[:, :32, :32], train=False)
    want = compile_recurrent_apply(model, variables, dtype=jnp.float32)(x)
    got = compile_recurrent_apply(
        model, variables, dtype=jnp.float32, split_x=2
    )(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # n-way split (interior tiles carry two-sided halos): x=256 so the
    # n=4 core (64) clears the 2*halo requirement
    x4 = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 16, 10, 4))
    want4 = compile_recurrent_apply(model, variables, dtype=jnp.float32)(x4)
    got4 = compile_recurrent_apply(
        model, variables, dtype=jnp.float32, split_x=4
    )(x4)
    np.testing.assert_array_equal(np.asarray(got4), np.asarray(want4))

    # engagement proof: an under-sized halo (20 < radius 28) must leak
    # seam error — if it doesn't, the split path silently fell back
    leaky = compile_recurrent_apply(
        model, variables, dtype=jnp.float32, split_x=2, halo_x=20
    )(x)
    assert np.abs(np.asarray(leaky - want)).max() > 1e-4

    # halo_x=0 passes the %4 gate but would seam-corrupt with no exchange
    # at all — the gate must disengage the split (== unsplit), not run it
    # (review r4)
    zero = compile_recurrent_apply(
        model, variables, dtype=jnp.float32, split_x=2, halo_x=0
    )(x)
    np.testing.assert_array_equal(np.asarray(zero), np.asarray(want))


def test_rdcnet_split_x_bit_identical():
    """RDCNet split_x=2: the half-res recurrence runs as two overlapping
    x-tiles, exchanging 12 seam columns of the carried y per iteration
    (12 >= the widest dilated tap's reach, 2*d_max = 10).  Bit-identical
    to the unsplit packed program at f32; an undersized halo must leak."""
    from hcunet_tpu.config import RDCNetConfig
    from hcunet_tpu.infer.compile_recurrent import compile_rdcnet_apply
    from hcunet_tpu.models.rdcnet import RDCNet

    cfg = RDCNetConfig(timesteps=4)
    model = RDCNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 96, 32, 10, 4))
    variables = model.init(jax.random.PRNGKey(1), x[:, :32, :32])
    want = compile_rdcnet_apply(model, variables, dtype=jnp.float32)(x)
    got = compile_rdcnet_apply(
        model, variables, dtype=jnp.float32, split_x=2
    )(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # n=4 (interior tiles carry two-sided halos) needs half-res core >
    # 2*halo: width 224 -> half-res 112 -> core 28 > 24
    x4 = jax.random.normal(jax.random.PRNGKey(2), (1, 224, 16, 10, 4))
    want4 = compile_rdcnet_apply(model, variables, dtype=jnp.float32)(x4)
    got4 = compile_rdcnet_apply(
        model, variables, dtype=jnp.float32, split_x=4
    )(x4)
    np.testing.assert_array_equal(np.asarray(got4), np.asarray(want4))

    leaky = compile_rdcnet_apply(
        model, variables, dtype=jnp.float32, split_x=2, halo_x=8
    )(x)
    assert np.abs(np.asarray(leaky - want)).max() > 1e-4


def test_recurrent_fallback_odd_xy():
    """x/y not divisible by 4 -> plain apply (bit-identical)."""
    cfg = RUNetConfig(timesteps=2)
    model = RecursiveUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 18, 18, 6, cfg.in_channels))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    got = compile_recurrent_apply(model, variables)(x)
    want = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
