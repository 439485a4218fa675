"""Loss parity vs the reference ``hcat/loss.py`` (torch oracle)."""

import numpy as np
import pytest
import torch

from hcunet_tpu.train import losses
from tests.reference_loader import reference_loss_module


@pytest.fixture(scope="module")
def ref():
    return reference_loss_module()


def _pair(shape_pred=(1, 1, 20, 22, 7), shape_tgt=(1, 1, 24, 26, 9), seed=0):
    g = torch.Generator().manual_seed(seed)
    pred = torch.randn(shape_pred, generator=g)
    mask = (torch.rand(shape_tgt, generator=g) > 0.6).float()
    pwl = torch.rand(shape_tgt, generator=g) * 10
    return pred, mask, pwl


def _cl(x: torch.Tensor) -> np.ndarray:
    """[B,C,...] -> [B,...,C]"""
    nd = x.ndim
    return np.transpose(x.numpy(), (0,) + tuple(range(2, nd)) + (1,))


@pytest.mark.parametrize("method", ["pixel", "worst_z", "sigmoid"])
def test_cross_entropy_parity(ref, method):
    pred, mask, pwl = _pair()
    want = ref.cross_entropy(pred, mask, pwl, method=method).item()
    got = float(losses.cross_entropy(_cl(pred), _cl(mask), _cl(pwl), method=method))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_cross_entropy_none_pwl(ref):
    pred, mask, _ = _pair(seed=3)
    want = ref.cross_entropy(pred, mask, None, method="pixel").item()
    got = float(losses.cross_entropy(_cl(pred), _cl(mask), None, method="pixel"))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_cross_entropy_2d(ref):
    g = torch.Generator().manual_seed(1)
    pred = torch.randn(1, 1, 20, 22, generator=g)
    mask = (torch.rand(1, 1, 24, 26, generator=g) > 0.5).float()
    want = ref.cross_entropy(pred, mask, None, method="pixel").item()
    got = float(losses.cross_entropy(_cl(pred), _cl(mask), None, method="pixel"))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_cross_entropy_random_runs():
    """`random` draws differ (different RNGs) — check it runs, is finite,
    and is in the same ballpark as the unweighted mean BCE."""
    import jax

    pred, mask, _ = _pair(seed=5)
    out = losses.cross_entropy(
        _cl(pred), _cl(mask), None, method="random",
        num_random_pixels=200, key=jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(out))
    with pytest.raises(ValueError):
        losses.cross_entropy(_cl(pred), _cl(mask), None, method="random")
    with pytest.raises(ValueError):
        losses.cross_entropy(_cl(pred), _cl(mask), None, method="bogus")


def test_dice_parity(ref):
    pred, mask, _ = _pair(seed=7)
    want = ref.dice(pred, mask).item()
    got = float(losses.dice(_cl(pred), _cl(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_l1_mse_parity(ref):
    pred, mask, _ = _pair(seed=9)
    np.testing.assert_allclose(
        float(losses.l1_loss(_cl(pred), _cl(mask))),
        ref.L1Loss(pred, mask).item(),
        rtol=2e-5,
    )
    np.testing.assert_allclose(
        float(losses.mse_loss(_cl(pred), _cl(mask))),
        ref.MSELoss(pred, mask).item(),
        rtol=2e-5,
    )


def test_losses_are_jittable_and_differentiable():
    import jax
    import jax.numpy as jnp

    pred = jnp.zeros((1, 8, 8, 4, 1))
    mask = jnp.ones((1, 10, 10, 5, 1))
    pwl = jnp.ones((1, 10, 10, 5, 1))

    def total(p):
        return losses.cross_entropy(p, mask, pwl) + losses.dice(p, mask)

    g = jax.jit(jax.grad(total))(pred)
    assert g.shape == pred.shape
    assert bool(jnp.all(jnp.isfinite(g)))
