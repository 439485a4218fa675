"""Tiled-inference engine tests: seam-freeness, parity grid, geometry guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcunet_tpu.config import TileConfig, UNetConfig
from hcunet_tpu.infer.tiling import (
    predict_segmentation_mask,
    predict_segmentation_mask_reference_grid,
)
from hcunet_tpu.models.unet import init_unet


@pytest.fixture(scope="module")
def small_unet():
    """A small 3D valid-conv U-Net with total pool stride 4 in x/y."""
    cfg = UNetConfig(
        feature_sizes=(8, 16, 32),
        kernel1=(3, 3, 2),
        kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2),
        max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1),
        groups=1,
    )
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (64, 64, 8))
    apply_fn = jax.tree_util.Partial(
        lambda v, t: model.apply(v, t, train=False), variables
    )
    return cfg, apply_fn


def test_tiled_matches_dense_when_aligned(small_unet):
    """With eval_size a multiple of the total pool stride, tiled evaluation
    must equal dense evaluation of the padded volume (no seams)."""
    cfg, apply_fn = small_unet
    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (1, 96, 96, 8, 4))
    tile_cfg = TileConfig(eval_size=(48, 48, 8), pad=(40, 40, 4), batch=3)

    got = predict_segmentation_mask(
        apply_fn, img, cfg, tile_cfg, use_probability_map=True
    )
    assert got.shape == (1, 96, 96, 8, 1)

    # dense oracle: pad whole image by the halo, run once, crop the core
    widths = [(0, 0), (40, 40), (40, 40), (4, 4), (0, 0)]
    padded = jnp.pad(img, widths, mode="symmetric")
    dense = jax.nn.sigmoid(apply_fn(padded).astype(jnp.float32))
    dense_core = dense[:, 40 : 96 + 40, 40 : 96 + 40, 4 : 8 + 4, :]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(dense_core), atol=2e-5
    )


def test_tiled_threshold_output_uint8(small_unet):
    cfg, apply_fn = small_unet
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 50, 60, 8, 4))
    out = predict_segmentation_mask(
        apply_fn,
        img,
        cfg,
        TileConfig(eval_size=(48, 48, 8), pad=(40, 40, 4), batch=2),
        use_probability_map=False,
    )
    out = np.asarray(out)
    assert out.dtype == np.uint8
    assert set(np.unique(out)) <= {0, 1}
    assert out.shape == (1, 50, 60, 8, 1)


def test_empty_tile_parity(small_unet):
    """All-(-1) volumes produce all-zero masks (segment.py:92-95)."""
    cfg, apply_fn = small_unet
    img = -jnp.ones((1, 48, 48, 8, 4))
    out = predict_segmentation_mask(
        apply_fn,
        img,
        cfg,
        TileConfig(eval_size=(48, 48, 8), pad=(40, 40, 4), batch=1),
        use_probability_map=True,
    )
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_reference_grid_parity_with_torch_oracle():
    """Voxel-placement parity: walk the reference's exact ragged tile grid
    with ported weights and compare against an in-test torch oracle that
    re-executes the reference's predict loop (``hcat/segment.py:70-126``).
    """
    import torch

    from hcunet_tpu.core.shapes import calculate_indexes
    from hcunet_tpu.models.unet import UNet
    from hcunet_tpu.utils.port_torch import unet_variables_from_torch_state_dict
    from tests.reference_loader import reference_unet_module

    U = reference_unet_module()
    torch.manual_seed(11)
    net = U.Unet_Constructor(
        image_dimensions=3,
        in_channels=4,
        out_channels=1,
        feature_sizes=[8, 16, 32],
        kernel={"conv1": (3, 3, 2), "conv2": (3, 3, 1)},
        upsample_kernel=(4, 4, 2),
        max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1),
        dilation=1,
        groups=1,
    ).eval()
    cfg = UNetConfig(
        feature_sizes=(8, 16, 32),
        kernel1=(3, 3, 2),
        kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2),
        max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1),
        groups=1,
        reference_skip_bug=True,
    )
    variables = unet_variables_from_torch_state_dict(net.state_dict(), cfg)
    model = UNet(cfg)
    apply_fn = jax.tree_util.Partial(
        lambda v, t: model.apply(v, t, train=False), variables
    )

    torch.manual_seed(12)
    img_t = torch.rand(1, 4, 70, 70, 8)
    E, P = (48, 48, 8), (40, 40, 4)

    # --- torch oracle: the reference algorithm verbatim-shaped ---
    padded = img_t.numpy()
    for axis, p in zip((2, 3, 4), P):
        left = np.flip(np.take(padded, range(0, p), axis=axis), axis=axis)
        right = np.flip(
            np.take(padded, range(padded.shape[axis] - p, padded.shape[axis]), axis=axis),
            axis=axis,
        )
        padded = np.concatenate([left, padded, right], axis=axis)
    padded = torch.as_tensor(padded)
    x_ind = calculate_indexes(P[0], E[0], 70, padded.shape[2])
    y_ind = calculate_indexes(P[1], E[1], 70, padded.shape[3])
    z_ind = calculate_indexes(P[2], E[2], 8, padded.shape[4])
    want = np.zeros((1, 1, 70, 70, 8), np.float32)
    with torch.no_grad():
        for z0, z1 in z_ind:
            for x0, x1 in x_ind:
                for y0, y1 in y_ind:
                    sl = padded[:, :, x0:x1, y0:y1, z0:z1]
                    out = torch.sigmoid(net(sl))
                    valid = out[
                        :, :, P[0] : E[0] + P[0], P[1] : E[1] + P[1], P[2] : E[2] + P[2]
                    ].numpy()
                    xe, ye, ze = min(x0 + E[0], 70), min(y0 + E[1], 70), min(z0 + E[2], 8)
                    want[:, :, x0:xe, y0:ye, z0:ze] = valid[
                        :, :, : xe - x0, : ye - y0, : ze - z0
                    ]

    # --- ours ---
    img = jnp.asarray(np.transpose(img_t.numpy(), (0, 2, 3, 4, 1)))
    got = predict_segmentation_mask_reference_grid(
        apply_fn,
        img,
        cfg,
        TileConfig(eval_size=E, pad=P, batch=1),
        use_probability_map=True,
    )
    np.testing.assert_allclose(
        got[0, :, :, :, 0], want[0, 0], atol=1e-4
    )


def test_insufficient_pad_raises(small_unet):
    cfg, apply_fn = small_unet
    img = jnp.zeros((1, 64, 64, 8, 4))
    with pytest.raises(ValueError, match="padding is not sufficient"):
        predict_segmentation_mask(
            apply_fn, img, cfg, TileConfig(eval_size=(48, 48, 8), pad=(4, 4, 4))
        )


def test_fused_postprocess_matches_scipy(small_unet):
    """postprocess=(sigma, floor, scale) inside the jit equals the host-side
    scipy sequence the reference runs (main.py:130-132)."""
    from scipy import ndimage as ndi

    cfg, apply_fn = small_unet
    img = jax.random.uniform(jax.random.PRNGKey(9), (1, 96, 96, 8, 4))
    tc = TileConfig(eval_size=(48, 48, 8), pad=(40, 40, 4), batch=2)
    plain = np.asarray(
        predict_segmentation_mask(apply_fn, img, cfg, tc, use_probability_map=True)
    )[0, ..., 0]
    fused = np.asarray(
        predict_segmentation_mask(
            apply_fn, img, cfg, tc, use_probability_map=True,
            postprocess=(3.0, 0.25, 10.0),
        )
    )[0, ..., 0]
    want = ndi.gaussian_filter(plain, sigma=3.0, mode="nearest", truncate=4.0)
    want[want < 0.25] = 0
    want = want * 10.0
    np.testing.assert_allclose(fused, want, atol=1e-3)
