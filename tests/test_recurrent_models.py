"""Recurrent-model tests: shape laws + numerical parity vs torch reference.

The reference hardcodes ``.cuda()`` in both recurrent forwards
(``r_unet.py:141,152,223``) so it cannot run on CPU torch unmodified; the
oracle monkeypatches ``Tensor.cuda`` to identity.
"""

import numpy as np
import pytest
import torch

from hcunet_tpu.config import RDCNetConfig, RUNetConfig
from hcunet_tpu.models.rdcnet import RDCNet
from hcunet_tpu.models.runet import RecursiveUNet
from hcunet_tpu.utils.port_torch import (
    rdcnet_variables_from_torch_state_dict,
    runet_variables_from_torch_state_dict,
)
from tests.reference_loader import reference_runet_module


@pytest.fixture(autouse=True)
def cpu_cuda_shim(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


def _cl(x: torch.Tensor) -> np.ndarray:
    nd = x.ndim
    return np.transpose(x.detach().numpy(), (0,) + tuple(range(2, nd)) + (1,))


def test_rdcnet_parity():
    R = reference_runet_module()
    torch.manual_seed(0)
    net = R.RDCNet(in_channels=4, out_channels=5).eval()
    variables = rdcnet_variables_from_torch_state_dict(net.state_dict())

    torch.manual_seed(1)
    x = torch.randn(1, 4, 32, 32, 8)
    with torch.no_grad():
        want = net(x)
    model = RDCNet(RDCNetConfig())
    got = model.apply(variables, _cl(x), train=False)
    assert got.shape == want.shape[:1] + want.shape[2:] + want.shape[1:2]
    np.testing.assert_allclose(np.asarray(got), _cl(want), atol=1e-4, rtol=1e-4)


def test_rdcnet_shape_invariance():
    """The reference's only real unit test (tests/stacked_dialation_test.py):
    output spatial dims equal input for several sizes."""
    import jax

    model = RDCNet(RDCNetConfig())
    v = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 8, 4), np.float32))
    for xy in (30, 32):
        for z in (8, 10):
            out = model.apply(v, np.zeros((1, xy, xy, z, 4), np.float32))
            assert out.shape == (1, xy, xy, z, 5), (xy, z, out.shape)


def test_runet_parity():
    R = reference_runet_module()
    torch.manual_seed(2)
    net = R.RecursiveUnet().eval()
    variables = runet_variables_from_torch_state_dict(net.state_dict())

    torch.manual_seed(3)
    x = torch.randn(1, 4, 32, 32, 8)
    with torch.no_grad():
        want = net(x)
    model = RecursiveUNet(RUNetConfig(), reference_skip_bug=True)
    got = model.apply(variables, _cl(x), train=False)
    np.testing.assert_allclose(np.asarray(got), _cl(want), atol=1e-3, rtol=1e-3)


def test_runet_fixed_skips_run():
    import jax

    model = RecursiveUNet(RUNetConfig(timesteps=2))
    v = model.init(jax.random.PRNGKey(0), np.zeros((1, 16, 16, 6, 4), np.float32))
    out = model.apply(v, np.zeros((1, 16, 16, 6, 4), np.float32))
    assert out.shape == (1, 16, 16, 6, 5)
