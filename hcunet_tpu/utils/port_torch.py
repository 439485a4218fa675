"""Port PyTorch reference checkpoints into hcunet_tpu variables.

The reference ships ``.unet``/``.runet`` files that are ``torch.save`` dicts
with a ``state_dict`` (``hcat/unet.py:145-196``).  These helpers map that
state_dict — or any live torch module's — onto our flax variable trees so
that (a) trained reference checkpoints can be served by this framework and
(b) the test suite can assert numerical parity on identical weights
(BASELINE.md config #4; the stripped-checkpoint caveat of SURVEY.md §0 means
parity is proven on identically-seeded weights instead).

Layout conventions:
* torch ``Conv{2,3}d.weight``  [Cout, Cin/g, *k]  →  ours [*k, Cin/g, Cout]
* torch ``ConvTranspose.weight`` [Cin, Cout, *k]  →  ours [*k, Cin, Cout]
* BatchNorm weight/bias/running_mean/running_var → scale/bias/mean/var
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from hcunet_tpu.config import UNetConfig


def _np(t) -> np.ndarray:
    try:  # torch tensor — copy: .numpy() aliases live torch storage, so an
        # in-place optimizer step on the source module would silently mutate
        # already-ported weights.
        return t.detach().cpu().numpy().copy()
    except AttributeError:
        return np.asarray(t)


def conv_weight_to_jax(w) -> np.ndarray:
    """[Cout, Cin/g, *k] -> [*k, Cin/g, Cout]."""
    w = _np(w)
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def conv_transpose_weight_to_jax(w) -> np.ndarray:
    """[Cin, Cout, *k] -> [*k, Cin, Cout]."""
    w = _np(w)
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))


def _convbnrelu(sd: Mapping, conv: str, bn: str) -> tuple[Dict, Dict]:
    params = {
        "kernel": conv_weight_to_jax(sd[f"{conv}.weight"]),
        "bias": _np(sd[f"{conv}.bias"]),
        "BatchNorm_0": {
            "scale": _np(sd[f"{bn}.weight"]),
            "bias": _np(sd[f"{bn}.bias"]),
        },
    }
    stats = {
        "BatchNorm_0": {
            "mean": _np(sd[f"{bn}.running_mean"]),
            "var": _np(sd[f"{bn}.running_var"]),
        }
    }
    return params, stats


def unet_variables_from_torch_state_dict(
    sd: Mapping, config: UNetConfig
) -> Dict:
    """Build the flax variable tree for :class:`hcunet_tpu.models.unet.UNet`
    from a reference ``Unet_Constructor`` state_dict."""
    n = len(config.feature_sizes)
    params: Dict = {}
    stats: Dict = {}
    for i in range(n):
        block_p: Dict = {}
        block_s: Dict = {}
        for j, (conv, bn) in enumerate(
            [("conv1", "batch1"), ("conv2", "batch2")]
        ):
            p, s = _convbnrelu(sd, f"down_steps.{i}.{conv}", f"down_steps.{i}.{bn}")
            block_p[f"ConvBNRelu_{j}"] = p
            block_s[f"ConvBNRelu_{j}"] = s
        params[f"down{i}"] = block_p
        stats[f"down{i}"] = block_s
    for i in range(n - 1):
        block_p = {
            "up_kernel": conv_transpose_weight_to_jax(sd[f"up_steps.{i}.up_conv.weight"]),
            "up_bias": _np(sd[f"up_steps.{i}.up_conv.bias"]),
        }
        block_s = {}
        for j, (conv, bn) in enumerate(
            [("conv1", "batch1"), ("conv2", "batch2")]
        ):
            p, s = _convbnrelu(sd, f"up_steps.{i}.{conv}", f"up_steps.{i}.{bn}")
            block_p[f"ConvBNRelu_{j}"] = p
            block_s[f"ConvBNRelu_{j}"] = s
        params[f"up{i}"] = block_p
        stats[f"up{i}"] = block_s
    params["out_kernel"] = conv_weight_to_jax(sd["out_conv.weight"])
    params["out_bias"] = _np(sd["out_conv.bias"])
    return {"params": params, "batch_stats": stats}


def unet_state_dict_from_variables(variables: Mapping, config: UNetConfig):
    """Inverse of :func:`unet_variables_from_torch_state_dict`: emit a torch
    state_dict for the reference ``Unet_Constructor`` from flax variables —
    lets weights trained in this framework run under the reference for
    parity/dice comparisons (reference checkpoints are stripped, SURVEY §0).
    """
    import torch

    params = variables["params"]
    stats = variables["batch_stats"]
    n = len(config.feature_sizes)
    nd = config.image_dimensions
    sd = {}

    def _t(a):
        return torch.as_tensor(np.asarray(a, np.float32).copy())

    def put_convbn(prefix_conv, prefix_bn, p, s):
        w = np.asarray(p["kernel"])  # [*k, Cin/g, Cout]
        sd[f"{prefix_conv}.weight"] = _t(
            np.transpose(w, (nd + 1, nd) + tuple(range(nd)))
        )
        sd[f"{prefix_conv}.bias"] = _t(p["bias"])
        sd[f"{prefix_bn}.weight"] = _t(p["BatchNorm_0"]["scale"])
        sd[f"{prefix_bn}.bias"] = _t(p["BatchNorm_0"]["bias"])
        sd[f"{prefix_bn}.running_mean"] = _t(s["BatchNorm_0"]["mean"])
        sd[f"{prefix_bn}.running_var"] = _t(s["BatchNorm_0"]["var"])
        sd[f"{prefix_bn}.num_batches_tracked"] = torch.tensor(0)

    for i in range(n):
        for j, (conv, bn) in enumerate([("conv1", "batch1"), ("conv2", "batch2")]):
            put_convbn(
                f"down_steps.{i}.{conv}", f"down_steps.{i}.{bn}",
                params[f"down{i}"][f"ConvBNRelu_{j}"],
                stats[f"down{i}"][f"ConvBNRelu_{j}"],
            )
    for i in range(n - 1):
        w_up = np.asarray(params[f"up{i}"]["up_kernel"])  # [*k, Cin, Cout]
        sd[f"up_steps.{i}.up_conv.weight"] = _t(
            np.transpose(w_up, (nd, nd + 1) + tuple(range(nd)))
        )
        sd[f"up_steps.{i}.up_conv.bias"] = _t(params[f"up{i}"]["up_bias"])
        for j, (conv, bn) in enumerate([("conv1", "batch1"), ("conv2", "batch2")]):
            put_convbn(
                f"up_steps.{i}.{conv}", f"up_steps.{i}.{bn}",
                params[f"up{i}"][f"ConvBNRelu_{j}"],
                stats[f"up{i}"][f"ConvBNRelu_{j}"],
            )
    w_out = np.asarray(params["out_kernel"])
    sd["out_conv.weight"] = _t(np.transpose(w_out, (nd + 1, nd) + tuple(range(nd))))
    sd["out_conv.bias"] = _t(params["out_bias"])
    return sd


def _same_convbn(sd: Mapping, conv: str, bn: str) -> tuple[Dict, Dict]:
    """SameConvBNRelu params/stats from a torch conv+bn pair."""
    return _convbnrelu(sd, conv, bn)


def _rup(sd: Mapping, prefix: str) -> tuple[Dict, Dict]:
    p0, s0 = _same_convbn(sd, f"{prefix}.conv1", f"{prefix}.batch1")
    p1, s1 = _same_convbn(sd, f"{prefix}.conv2", f"{prefix}.batch2")
    params = {
        "up_kernel": conv_transpose_weight_to_jax(sd[f"{prefix}.up_conv.weight"]),
        "up_bias": _np(sd[f"{prefix}.up_conv.bias"]),
        "SameConvBNRelu_0": p0,
        "SameConvBNRelu_1": p1,
    }
    stats = {"SameConvBNRelu_0": s0, "SameConvBNRelu_1": s1}
    return params, stats


def _rdown(sd: Mapping, prefix: str) -> tuple[Dict, Dict]:
    p0, s0 = _same_convbn(sd, f"{prefix}.conv1", f"{prefix}.batch1")
    p1, s1 = _same_convbn(sd, f"{prefix}.conv2", f"{prefix}.batch2")
    return (
        {"SameConvBNRelu_0": p0, "SameConvBNRelu_1": p1},
        {"SameConvBNRelu_0": s0, "SameConvBNRelu_1": s1},
    )


def runet_variables_from_torch_state_dict(sd: Mapping) -> Dict:
    """Port a reference ``RecursiveUnet`` state_dict
    (``hcat/r_unet.py:38-160``) onto
    :class:`hcunet_tpu.models.runet.RecursiveUNet` variables.

    The recurrence body is an ``nn.scan``-wrapped submodule named ``step``,
    so every parameter lives one level below it."""
    params: Dict = {}
    stats: Dict = {}
    params["down1"], stats["down1"] = _rdown(sd, "down1")
    for gate in ("fz", "fh"):
        pa, sa = _rdown(sd, f"down2_{gate}")
        pb, sb = _rdown(sd, f"down3_{gate}")
        pu, su = _rup(sd, f"up1_{gate}")
        params[gate] = {"down_a": pa, "down_b": pb, "up": pu}
        stats[gate] = {"down_a": sa, "down_b": sb, "up": su}
    params["up2"], stats["up2"] = _rup(sd, "up2")
    params["out_kernel"] = conv_weight_to_jax(sd["out_conv.weight"])
    params["out_bias"] = _np(sd["out_conv.bias"])
    return {"params": {"step": params}, "batch_stats": {"step": stats}}


def rdcnet_variables_from_torch_state_dict(sd: Mapping) -> Dict:
    """Port a reference ``RDCNet`` state_dict (``hcat/r_unet.py:207-227``)
    onto :class:`hcunet_tpu.models.rdcnet.RDCNet` variables."""
    sdil = {}
    for d in range(1, 6):
        sdil[f"conv{d}_kernel"] = conv_weight_to_jax(
            sd[f"RDCblock.grouped_conv.conv{d}.weight"]
        )
        sdil[f"conv{d}_bias"] = _np(sd[f"RDCblock.grouped_conv.conv{d}.bias"])
    sdil["merge_kernel"] = conv_weight_to_jax(sd["RDCblock.grouped_conv.out_conv.weight"])
    sdil["merge_bias"] = _np(sd["RDCblock.grouped_conv.out_conv.bias"])
    params = {
        "in_kernel": conv_weight_to_jax(sd["strided_conv.weight"]),
        "in_bias": _np(sd["strided_conv.bias"]),
        # the recurrence body is an ``nn.scan``-wrapped submodule named
        # ``step`` (shared weights across timesteps), like RecursiveUNet
        "step": {
            "rdc_block": {
                "squeeze_kernel": conv_weight_to_jax(sd["RDCblock.conv.weight"]),
                "squeeze_bias": _np(sd["RDCblock.conv.bias"]),
                "StackedDilation_0": sdil,
            },
        },
        "out_kernel": conv_weight_to_jax(sd["out_conv.weight"]),
        "out_bias": _np(sd["out_conv.bias"]),
        "up_kernel": conv_transpose_weight_to_jax(sd["transposed_conv.weight"]),
        "up_bias": _np(sd["transposed_conv.bias"]),
    }
    return {"params": params}


def rdcnet_state_dict_from_variables(variables: Mapping):
    """Inverse of :func:`rdcnet_variables_from_torch_state_dict`: emit a
    torch state_dict for the reference ``RDCNet`` (``hcat/r_unet.py:207-227``)
    from flax variables — lets weights trained in this framework run under
    the reference composition for the trained recurrent end-to-end gate
    (``tests/r_unet_test.py:19-91`` recipe; reference checkpoints are
    stripped, SURVEY §0)."""
    import torch

    params = variables["params"]

    def _t(a):
        return torch.as_tensor(np.asarray(a, np.float32).copy())

    def conv_to_torch(w):  # [*k, Cin, Cout] -> [Cout, Cin, *k]
        w = np.asarray(w)
        nd = w.ndim - 2
        return _t(np.transpose(w, (nd + 1, nd) + tuple(range(nd))))

    def tconv_to_torch(w):  # [*k, Cin, Cout] -> [Cin, Cout, *k]
        w = np.asarray(w)
        nd = w.ndim - 2
        return _t(np.transpose(w, (nd, nd + 1) + tuple(range(nd))))

    blk = params["step"]["rdc_block"]
    sdil = blk["StackedDilation_0"]
    sd = {
        "strided_conv.weight": conv_to_torch(params["in_kernel"]),
        "strided_conv.bias": _t(params["in_bias"]),
        "RDCblock.conv.weight": conv_to_torch(blk["squeeze_kernel"]),
        "RDCblock.conv.bias": _t(blk["squeeze_bias"]),
        "RDCblock.grouped_conv.out_conv.weight": conv_to_torch(
            sdil["merge_kernel"]
        ),
        "RDCblock.grouped_conv.out_conv.bias": _t(sdil["merge_bias"]),
        "out_conv.weight": conv_to_torch(params["out_kernel"]),
        "out_conv.bias": _t(params["out_bias"]),
        "transposed_conv.weight": tconv_to_torch(params["up_kernel"]),
        "transposed_conv.bias": _t(params["up_bias"]),
    }
    for d in range(1, 6):
        sd[f"RDCblock.grouped_conv.conv{d}.weight"] = conv_to_torch(
            sdil[f"conv{d}_kernel"]
        )
        sd[f"RDCblock.grouped_conv.conv{d}.bias"] = _t(sdil[f"conv{d}_bias"])
    return sd


def load_reference_unet_file(path: str):
    """Load a reference ``.unet`` checkpoint file →
    ``(UNetConfig, variables, hyperparameters)``.

    Accepts the torch.save dict layout of ``hcat/unet.py:145-165``:
    ``{'state_dict', 'model_specifications', 'hyperparameters', ...}``;
    the returned hyperparameters mirror what the reference's ``load``
    hands back (``hcat/unet.py:195``).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    spec = blob["model_specifications"]
    kernel = spec["kernel"]
    if isinstance(kernel, dict):
        k1, k2 = tuple(kernel["conv1"]), tuple(kernel["conv2"])
    else:
        k1 = k2 = tuple(kernel)
    dil = spec["dilation"]
    if isinstance(dil, dict):
        dil = dil["conv1"]
    grp = spec["groups"]
    if isinstance(grp, dict):
        grp = grp["conv1"]
    up_stride = spec["upsample_stride"]
    if isinstance(up_stride, int):
        up_stride = (up_stride,) * spec["image_dimensions"]
    cfg = UNetConfig(
        image_dimensions=spec["image_dimensions"],
        in_channels=spec["in_channels"],
        out_channels=spec["out_channels"],
        feature_sizes=tuple(spec["feature_sizes"]),
        kernel1=k1,
        kernel2=k2,
        upsample_kernel=tuple(spec["upsample_kernel"]),
        max_pool_kernel=tuple(spec["max_pool_kernel"]),
        upsample_stride=tuple(up_stride),
        dilation=dil if isinstance(dil, int) else 1,
        groups=grp if isinstance(grp, int) else 1,
        # Weights in a real ``.unet`` were trained under the reference's
        # swapped-args crop (``unet.py:311,318-340``: ``y = crop(x, y)``
        # replaces the skip with a copy of the upsampled tensor), so the
        # behavior-matching flag must ride along for the port to be
        # output-faithful.
        reference_skip_bug=True,
    )
    variables = unet_variables_from_torch_state_dict(blob["state_dict"], cfg)
    return cfg, variables, blob.get("hyperparameters")
