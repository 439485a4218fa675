"""Per-op timing of the packed serving forward (production config, batch-6
tile).  Prints each packed conv / pool / T-conv standalone so optimization
lands where the milliseconds are.  Usage: python -u scripts/probe_serving_ops.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hcunet_tpu.config import UNetConfig
from hcunet_tpu.infer import compile as C
from hcunet_tpu.models.unet import init_unet

B, S, Z = 6, 496, 23
DT = jnp.bfloat16


def bench(fn, *args, iters=10):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


total = 0.0


def t(name, fn, *args):
    global total
    dt = bench(fn, *args)
    total += dt
    print(f"{name:34s} {dt*1e3:8.1f} ms")


key = jax.random.PRNGKey(0)
cfg = UNetConfig.production_3d()
model, variables = init_unet(cfg, jax.random.PRNGKey(0), (140, 140, 10), dtype=DT)
params = jax.tree.map(np.asarray, variables["params"])
stats = jax.tree.map(np.asarray, variables["batch_stats"])

zb_plan = C.default_zb_plan(cfg.feature_sizes)
print("zb plan:", zb_plan, " devices:", jax.devices())


def rand_packed(x_sp, y_sp, z_len, c, zb):
    nb = -(-z_len // zb)
    data = jax.random.normal(key, (B, x_sp, y_sp, nb, c * zb), DT)
    return C._Packed(data, zb, c, z_len)


def run_conv(x, level, i, zb, groups=2):
    w, b = C._folded_conv_params(
        params[f"down{level}"][f"ConvBNRelu_{i}"],
        stats[f"down{level}"][f"ConvBNRelu_{i}"],
        groups,
    )
    wp, kzb, nbl = C.pack_conv_weights(w, zb)
    bias = C._tile_bias(b, zb)
    kz = w.shape[2]
    cout = w.shape[-1]
    return lambda d: C.conv_packed(
        C._Packed(d, zb, x.c, x.z_len), wp, kzb, nbl, kz=kz, cout=cout,
        bias=bias, relu=True, dtype=DT,
    ).data


def run_upconv(x, i, zb):
    p = params[f"up{i}"]
    w_up = np.asarray(p["up_kernel"], np.float32)
    b_up = np.asarray(p["up_bias"], np.float32)
    w_upf = np.ascontiguousarray(w_up[::-1, ::-1, ::-1])
    wp, kzb, nbl = C.pack_conv_weights(w_upf, zb, z_shift=-(cfg.upsample_kernel[2] - 1))
    bias = C._tile_bias(b_up, zb)
    return lambda d: C.conv_packed(
        C._Packed(d, zb, x.c, x.z_len), wp, kzb, nbl,
        kz=cfg.upsample_kernel[2], cout=w_up.shape[-1], bias=bias,
        lhs_dilation=(2, 2),
        pad_xy=(cfg.upsample_kernel[0] - 1, cfg.upsample_kernel[1] - 1),
        z_grow=cfg.upsample_kernel[2] - 1, dtype=DT,
    ).data


def run_up_block_conv(x, i, j, zb, groups=2):
    w, b = C._folded_conv_params(
        params[f"up{i}"][f"ConvBNRelu_{j}"], stats[f"up{i}"][f"ConvBNRelu_{j}"],
        groups,
    )
    wp, kzb, nbl = C.pack_conv_weights(w, zb)
    bias = C._tile_bias(b, zb)
    return lambda d: C.conv_packed(
        C._Packed(d, zb, x.c, x.z_len), wp, kzb, nbl, kz=w.shape[2],
        cout=w.shape[-1], bias=bias, relu=True, dtype=DT,
    ).data


# encoder
x = rand_packed(S, S, Z, 4, zb_plan[0])
t("L0 conv1 packed", run_conv(x, 0, 0, zb_plan[0]), x.data)
x = rand_packed(S - 2, S - 2, Z - 1, 16, zb_plan[0])
t("L0 conv2 packed", run_conv(x, 0, 1, zb_plan[0]), x.data)
t("L0 pool packed", lambda d: C.pool_packed(C._Packed(d, x.zb, x.c, x.z_len)).data, x.data)
S1 = (S - 4) // 2
x = rand_packed(S1, S1, Z - 1, 16, zb_plan[1])
t("L1 conv1 packed", run_conv(x, 1, 0, zb_plan[1]), x.data)
x = rand_packed(S1 - 2, S1 - 2, Z - 2, 32, zb_plan[1])
t("L1 conv2 packed", run_conv(x, 1, 1, zb_plan[1]), x.data)
S2 = (S1 - 4) // 2
x = rand_packed(S2, S2, Z - 3, 32, zb_plan[2])
t("L2 conv1 packed", run_conv(x, 2, 0, zb_plan[2]), x.data)
x = rand_packed(S2 - 2, S2 - 2, Z - 4, 64, zb_plan[2])
t("L2 conv2 packed", run_conv(x, 2, 1, zb_plan[2]), x.data)
S3 = (S2 - 4) // 2
x = rand_packed(S3, S3, Z - 5, 64, zb_plan[3])
t("L3 conv1 packed", run_conv(x, 3, 0, zb_plan[3]), x.data)
x = rand_packed(S3 - 2, S3 - 2, Z - 6, 128, zb_plan[3])
t("L3 conv2 packed", run_conv(x, 3, 1, zb_plan[3]), x.data)

# decoder (sizes approximate the real walk; what matters is the op cost)
x = rand_packed(S3 - 4, S3 - 4, Z - 7, 128, zb_plan[2])
t("up2 T-conv packed", run_upconv(x, 0, zb_plan[2]), x.data)
x = rand_packed(2 * (S3 - 4), 2 * (S3 - 4), Z - 6, 128, zb_plan[2])
t("up2 conv1 packed (Cin 128)", run_up_block_conv(x, 0, 0, zb_plan[2]), x.data)
x = rand_packed(2 * (S3 - 4) - 2, 2 * (S3 - 4) - 2, Z - 7, 64, zb_plan[2])
t("up2 conv2 packed", run_up_block_conv(x, 0, 1, zb_plan[2]), x.data)

x = rand_packed(S2 - 10, S2 - 10, Z - 8, 64, zb_plan[1])
t("up1 T-conv packed", run_upconv(x, 1, zb_plan[1]), x.data)
x = rand_packed(2 * (S2 - 10), 2 * (S2 - 10), Z - 7, 64, zb_plan[1])
t("up1 conv1 packed (Cin 64)", run_up_block_conv(x, 1, 0, zb_plan[1]), x.data)
x = rand_packed(2 * (S2 - 10) - 2, 2 * (S2 - 10) - 2, Z - 8, 32, zb_plan[1])
t("up1 conv2 packed", run_up_block_conv(x, 1, 1, zb_plan[1]), x.data)

x = rand_packed(S1 - 22, S1 - 22, Z - 9, 32, zb_plan[0])
t("up0 T-conv packed", run_upconv(x, 2, zb_plan[0]), x.data)
x = rand_packed(2 * (S1 - 22), 2 * (S1 - 22), Z - 8, 32, zb_plan[0])
t("up0 conv1 packed (Cin 32)", run_up_block_conv(x, 2, 0, zb_plan[0]), x.data)
x = rand_packed(2 * (S1 - 22) - 2, 2 * (S1 - 22) - 2, Z - 9, 16, zb_plan[0])
t("up0 conv2 packed", run_up_block_conv(x, 2, 1, zb_plan[0]), x.data)

print(f"{'TOTAL (standalone sum)':34s} {total*1e3:8.1f} ms")
