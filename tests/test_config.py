import pytest

from hcunet_tpu.config import (
    PipelineConfig,
    UNetConfig,
    auto_tile_config,
    config_from_dict,
    config_to_dict,
)


def test_unet_config_validates_feature_doubling():
    with pytest.raises(ValueError):
        UNetConfig(feature_sizes=(16, 48))
    with pytest.raises(ValueError):
        UNetConfig(feature_sizes=(16,))
    with pytest.raises(ValueError):
        UNetConfig(image_dimensions=4)


def test_config_roundtrip():
    cfg = PipelineConfig(numchunks=5)
    d = config_to_dict(cfg)
    back = config_from_dict(d)
    assert back == cfg
    assert isinstance(back.unet, UNetConfig)
    assert back.unet.kernel1 == (3, 3, 2)


def test_auto_tile_config_fits_small_hbm():
    small = auto_tile_config(UNetConfig.production_3d(), hbm_bytes=4 * 2**30)
    big = auto_tile_config(UNetConfig.production_3d(), hbm_bytes=32 * 2**30)
    assert small.eval_size[0] <= big.eval_size[0]
    assert small.batch >= 1


def test_auto_tile_config_halo_covers_shrink():
    from hcunet_tpu.core.shapes import unet_shrinkage

    cfg = UNetConfig.production_3d()
    tc = auto_tile_config(cfg, hbm_bytes=16 * 2**30)
    tile_in = tuple(e + 2 * p for e, p in zip(tc.eval_size, tc.pad))
    shrink = unet_shrinkage(tile_in, **cfg.shape_kwargs())
    assert all(p >= s for p, s in zip(tc.pad, shrink)), (tc, shrink)
    assert tc.batch >= 1
