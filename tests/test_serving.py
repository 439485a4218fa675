"""Serving-layer tests: shape bucketing, compile reuse, exact-resume."""

import numpy as np
import pytest

from hcunet_tpu.config import TileConfig, UNetConfig


@pytest.fixture(scope="module")
def segmenter(tmp_path_factory):
    import jax

    from hcunet_tpu.infer.serving import Segmenter
    from hcunet_tpu.models.unet import init_unet
    from hcunet_tpu.train.trainer import TrainConfig, UNetTrainer

    cfg = UNetConfig(
        feature_sizes=(8, 16), kernel1=(3, 3, 2), kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), groups=1,
    )
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (48, 48, 6))
    p = str(tmp_path_factory.mktemp("ck") / "m.hcunet")
    UNetTrainer(model, variables, TrainConfig(log_every=0)).save(p)
    return Segmenter.from_checkpoint(
        p, tile_cfg=TileConfig(eval_size=(48, 48, 6), pad=(24, 24, 3), batch=2)
    )


def test_bucketing_shares_programs(segmenter):
    assert segmenter.bucket_shape((50, 90, 6)) == (96, 96, 6)
    assert segmenter.bucket_shape((48, 48, 6)) == (48, 48, 6)
    assert segmenter.bucket_shape((40, 48, 4)) == (40, 48, 4)


def test_predict_trims_to_input(segmenter, rng):
    vol = rng.random((50, 90, 6, 4)).astype(np.float32)
    out = segmenter.predict(vol)
    assert out.shape == (50, 90, 6)
    assert np.isfinite(out).all() and 0 <= out.min() and out.max() <= 1


def test_predict_bucketed_equals_direct_core(segmenter, rng):
    """Bucketing pads then trims — the core region must equal predicting
    the padded volume directly."""
    vol = rng.random((50, 96, 6, 4)).astype(np.float32)
    out = segmenter.predict(vol)
    padded = np.pad(vol, [(0, 46), (0, 0), (0, 0), (0, 0)], mode="symmetric")
    out2 = segmenter.predict(padded)[:50]
    np.testing.assert_allclose(out, out2, atol=2e-5)


def test_training_state_resume(tmp_path, rng):
    import jax

    from hcunet_tpu.models.unet import init_unet
    from hcunet_tpu.train.trainer import TrainConfig, UNetTrainer

    cfg = UNetConfig(
        feature_sizes=(8, 16), kernel1=(3, 3, 2), kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), groups=1,
    )
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (32, 32, 6))
    img = rng.random((1, 32, 32, 6, 4)).astype(np.float32)
    mask = (rng.random((1, 32, 32, 6, 1)) > 0.7).astype(np.float32)
    pwl = np.ones_like(mask)

    a = UNetTrainer(model, variables, TrainConfig(learning_rate=1e-2, log_every=0))
    for _ in range(3):
        a.train_step(img, mask, pwl)
    p = str(tmp_path / "state.bin")
    a.save_training_state(p)
    # continue 2 more steps on a
    ref = [a.train_step(img, mask, pwl) for _ in range(2)]

    b = UNetTrainer(model, variables, TrainConfig(learning_rate=1e-2, log_every=0))
    b.load_training_state(p)
    got = [b.train_step(img, mask, pwl) for _ in range(2)]
    np.testing.assert_allclose(got, ref, rtol=1e-5)
