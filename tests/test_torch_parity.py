"""Numerical parity vs the PyTorch reference on identical weights.

BASELINE.md's fidelity gate (config #4) can't use the stripped ``.runet``
checkpoints, so parity is proven on identically-seeded weights: build the
reference torch model, port its state_dict with
``hcunet_tpu.utils.port_torch``, and compare forward outputs.
"""

import numpy as np
import pytest
import torch

from hcunet_tpu.config import UNetConfig
from hcunet_tpu.models.unet import UNet
from hcunet_tpu.utils.port_torch import (
    conv_transpose_weight_to_jax,
    conv_weight_to_jax,
    unet_variables_from_torch_state_dict,
)
from tests.reference_loader import reference_unet_module


def to_channels_last(x: torch.Tensor) -> np.ndarray:
    """[B, C, *spatial] -> [B, *spatial, C]."""
    nd = x.ndim
    return np.ascontiguousarray(
        np.transpose(x.numpy(), (0,) + tuple(range(2, nd)) + (1,))
    )


def test_conv_valid_matches_torch():
    from hcunet_tpu.ops.conv import conv_valid

    torch.manual_seed(0)
    conv = torch.nn.Conv3d(4, 8, (3, 3, 2), groups=2, padding=0)
    x = torch.randn(2, 4, 12, 13, 7)
    want = conv(x).detach()
    got = conv_valid(
        to_channels_last(x),
        conv_weight_to_jax(conv.weight),
        conv.bias.detach().numpy(),
        groups=2,
    )
    np.testing.assert_allclose(np.asarray(got), to_channels_last(want), atol=2e-5)


def test_conv_transpose_matches_torch():
    from hcunet_tpu.ops.conv import conv_transpose_torch

    torch.manual_seed(0)
    tc = torch.nn.ConvTranspose3d(6, 3, (8, 8, 2), stride=(2, 2, 1))
    x = torch.randn(1, 6, 9, 9, 5)
    want = tc(x).detach()
    got = conv_transpose_torch(
        to_channels_last(x),
        conv_transpose_weight_to_jax(tc.weight),
        tc.bias.detach().numpy(),
        stride=(2, 2, 1),
    )
    np.testing.assert_allclose(np.asarray(got), to_channels_last(want), atol=2e-5)


def test_conv_transpose_padding_matches_torch():
    from hcunet_tpu.ops.conv import conv_transpose_torch

    torch.manual_seed(1)
    tc = torch.nn.ConvTranspose3d(4, 2, (6, 6, 5), stride=(2, 2, 1), padding=2)
    x = torch.randn(1, 4, 7, 7, 5)
    want = tc(x).detach()
    got = conv_transpose_torch(
        to_channels_last(x),
        conv_transpose_weight_to_jax(tc.weight),
        tc.bias.detach().numpy(),
        stride=(2, 2, 1),
        padding=2,
    )
    np.testing.assert_allclose(np.asarray(got), to_channels_last(want), atol=2e-5)


@pytest.fixture(scope="module")
def reference_pair():
    """Reference production-3D torch model + ported jax variables."""
    U = reference_unet_module()
    torch.manual_seed(42)
    net = U.Unet_Constructor(
        image_dimensions=3,
        in_channels=4,
        out_channels=1,
        feature_sizes=[16, 32, 64, 128],
        kernel={"conv1": (3, 3, 2), "conv2": (3, 3, 1)},
        upsample_kernel=(8, 8, 2),
        max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1),
        dilation=1,
        groups=2,
    )
    net.eval()
    cfg = UNetConfig(reference_skip_bug=True)
    variables = unet_variables_from_torch_state_dict(net.state_dict(), cfg)
    return net, cfg, variables


def test_unet_forward_parity_with_reference(reference_pair):
    net, cfg, variables = reference_pair
    torch.manual_seed(7)
    x = torch.randn(1, 4, 100, 100, 9)
    with torch.no_grad():
        want = net(x)
    model = UNet(cfg)
    got = model.apply(variables, to_channels_last(x), train=False)
    np.testing.assert_allclose(
        np.asarray(got), to_channels_last(want), atol=5e-4, rtol=1e-4
    )


def test_unet_fixed_skips_differ_from_reference(reference_pair):
    """Sanity: with real skip connections the output must differ — proving
    the compat flag actually toggles the documented reference bug."""
    net, cfg, variables = reference_pair
    torch.manual_seed(7)
    x = torch.randn(1, 4, 100, 100, 9)
    with torch.no_grad():
        want = to_channels_last(net(x))
    fixed_cfg = UNetConfig(reference_skip_bug=False)
    model = UNet(fixed_cfg)
    got = np.asarray(model.apply(variables, to_channels_last(x), train=False))
    assert got.shape == want.shape
    assert np.abs(got - want).max() > 1e-3


def test_unet_gradient_parity_with_reference(reference_pair):
    """Gradients of the pixel-BCE loss wrt every parameter match torch
    autograd on identical weights — validates the whole backward pass
    (convs, transpose convs, BN in train... here eval-mode BN for a
    deterministic comparison)."""
    import jax
    import jax.numpy as jnp

    from hcunet_tpu.train.losses import cross_entropy
    from tests.reference_loader import reference_loss_module

    net, cfg, variables = reference_pair
    L = reference_loss_module()

    torch.manual_seed(21)
    x = torch.randn(1, 4, 76, 76, 8)
    mask = (torch.rand(1, 1, 40, 40, 8) > 0.6).float()
    pwl = torch.rand(1, 1, 40, 40, 8)

    # torch side: eval-mode BN (running stats), grads wrt conv1 weight
    net.zero_grad()
    out = net(x)
    loss_t = L.cross_entropy(out, mask, pwl, method="pixel")
    loss_t.backward()
    ref_grad = net.down_steps[0].conv1.weight.grad.detach().numpy()
    ref_out_grad = net.out_conv.weight.grad.detach().numpy()

    # jax side
    from hcunet_tpu.models.unet import UNet

    model = UNet(cfg)
    xj = to_channels_last(x)
    maskj = to_channels_last(mask)
    pwlj = to_channels_last(pwl)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xj, train=False,
        )
        return cross_entropy(out, maskj, pwlj, method="pixel")

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    g = np.asarray(grads["down0"]["ConvBNRelu_0"]["kernel"])
    # ours [kx,ky,kz,Cin/g,Cout] vs torch [Cout,Cin/g,kx,ky,kz]
    g_t = np.transpose(ref_grad, (2, 3, 4, 1, 0))
    np.testing.assert_allclose(g, g_t, atol=2e-5, rtol=1e-3)

    g_out = np.asarray(grads["out_kernel"])
    np.testing.assert_allclose(
        g_out, np.transpose(ref_out_grad, (2, 3, 4, 1, 0)), atol=2e-5, rtol=1e-3
    )


def test_readme_2d_quickstart_trains():
    """BASELINE config #1: the README-quickstart 2D U-Net (which the torch
    reference cannot even construct) initializes, runs, and takes a
    gradient step."""
    import jax
    import jax.numpy as jnp
    import optax

    from hcunet_tpu.models.unet import init_unet
    from hcunet_tpu.train.losses import cross_entropy

    cfg = UNetConfig.readme_2d()
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), (188, 188))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 188, 188, 4))
    out = model.apply(variables, x, train=False)
    assert out.ndim == 4 and out.shape[-1] == 1

    mask = (jax.random.uniform(jax.random.PRNGKey(2), out.shape) > 0.5).astype(
        jnp.float32
    )

    def loss_fn(p):
        o, upd = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return cross_entropy(o, mask, None)

    g = jax.grad(loss_fn)(variables["params"])
    tx = optax.adam(1e-3)
    state = tx.init(variables["params"])
    upd, _ = tx.update(g, state)
    new = optax.apply_updates(variables["params"], upd)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a: bool(jnp.isfinite(a).all()), new)
    )


def test_matched_sgd_training_trajectory():
    """Train the ported model and the torch reference from identical weights
    with plain SGD on identical data for several steps; parameters must stay
    numerically matched — forward, loss, and gradient parity compounding
    through an optimizer (the dice-parity gate of BASELINE.md, provable
    without the stripped reference checkpoints)."""
    import jax
    import jax.numpy as jnp
    import optax

    from hcunet_tpu.models.unet import UNet
    from hcunet_tpu.train.losses import cross_entropy
    from tests.reference_loader import reference_loss_module, reference_unet_module

    U = reference_unet_module()
    L = reference_loss_module()
    torch.manual_seed(33)
    net = U.Unet_Constructor(
        image_dimensions=3, in_channels=4, out_channels=1,
        feature_sizes=[8, 16],
        kernel={"conv1": (3, 3, 2), "conv2": (3, 3, 1)},
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), dilation=1, groups=1,
    )
    net.eval()  # eval-mode BN on both sides: isolates optimizer dynamics
    cfg = UNetConfig(
        feature_sizes=(8, 16), kernel1=(3, 3, 2), kernel2=(3, 3, 1),
        upsample_kernel=(4, 4, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), groups=1, reference_skip_bug=True,
    )
    variables = unet_variables_from_torch_state_dict(net.state_dict(), cfg)

    torch.manual_seed(34)
    x = torch.randn(1, 4, 40, 40, 8)
    mask = (torch.rand(1, 1, 32, 32, 8) > 0.6).float()
    pwl = torch.rand(1, 1, 32, 32, 8)

    lr = 0.05
    opt = torch.optim.SGD(net.parameters(), lr=lr)
    torch_losses = []
    for _ in range(5):
        opt.zero_grad()
        loss = L.cross_entropy(net(x), mask, pwl, method="pixel")
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    model = UNet(cfg)
    xj = to_channels_last(x)
    maskj = to_channels_last(mask)
    pwlj = to_channels_last(pwl)
    params = variables["params"]
    stats = variables["batch_stats"]
    tx = optax.sgd(lr)
    opt_state = tx.init(params)

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": stats}, xj, train=False)
        return cross_entropy(out, maskj, pwlj, method="pixel")

    jax_losses = []
    for _ in range(5):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-4)
    # parameters themselves stay matched after 5 coupled steps
    w_torch = net.down_steps[0].conv1.weight.detach().numpy()
    w_jax = np.asarray(params["down0"]["ConvBNRelu_0"]["kernel"])
    np.testing.assert_allclose(
        w_jax, np.transpose(w_torch, (2, 3, 4, 1, 0)), atol=1e-5, rtol=1e-4
    )
