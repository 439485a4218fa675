"""Reflection-padding parity vs the reference's reverse-slice construction."""

import numpy as np
import pytest
import torch

from hcunet_tpu.core.padding import pad_to_shape, reflection_pad, reflection_pad_np


def ref_pad(image: torch.Tensor, pad_size):
    """Oracle re-execution of ``hcat/utils.py:33-74`` semantics:
    prepend image[pad-1::-1], append image[-1:-pad-1:-1] per spatial axis of
    a [B, C, X, Y, Z] tensor."""
    out = image.numpy()
    for axis, p in zip((2, 3, 4), pad_size):
        left = np.flip(np.take(out, range(0, p), axis=axis), axis=axis)
        right = np.flip(np.take(out, range(out.shape[axis] - p, out.shape[axis]), axis=axis), axis=axis)
        out = np.concatenate([left, out, right], axis=axis)
    return torch.as_tensor(out)


@pytest.mark.parametrize("pad", [(2, 2, 2), (4, 6, 2), (0, 0, 0), (8, 8, 4)])
def test_reflection_pad_matches_reference(pad):
    x = torch.arange(1 * 2 * 9 * 11 * 7, dtype=torch.float32).reshape(1, 2, 9, 11, 7)
    want = ref_pad(x, pad)  # [B, C, X, Y, Z]
    # ours is channels-last [B, X, Y, Z, C]
    x_cl = np.transpose(x.numpy(), (0, 2, 3, 4, 1))
    got = np.asarray(reflection_pad(x_cl, pad))
    got_cf = np.transpose(got, (0, 4, 1, 2, 3))
    np.testing.assert_array_equal(got_cf, want.numpy())


def test_reflection_pad_np_matches_jax():
    x = np.random.default_rng(0).normal(size=(1, 9, 11, 7, 2)).astype(np.float32)
    np.testing.assert_array_equal(reflection_pad_np(x, (3, 2, 1)), np.asarray(reflection_pad(x, (3, 2, 1))))


def test_reflection_pad_validates():
    x = np.zeros((1, 4, 4, 4, 1), np.float32)
    with pytest.raises(ValueError):
        reflection_pad(x, (5, 0, 0))
    with pytest.raises(ValueError):
        reflection_pad(x, (1, 1))


def test_pad_to_shape():
    x = np.random.default_rng(1).normal(size=(1, 10, 11, 3, 2)).astype(np.float32)
    out = pad_to_shape(x, (16, 16, 4))
    assert out.shape == (1, 16, 16, 4, 2)
    np.testing.assert_array_equal(np.asarray(out)[:, :10, :11, :3], x)
