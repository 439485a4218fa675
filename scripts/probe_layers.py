"""Per-layer time budget of the production U-Net tile program.

Times every conv / pool / transpose-conv of the batch-6 (496,496,23) tile
forward standalone (steady-state, amortized dispatch), so optimization
effort lands where the milliseconds are.  Also times the full model apply
for the fusion-gap comparison.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

DT = jnp.bfloat16
B = 6


def dimnums(nd):
    lhs = "N" + "".join(chr(ord("0") + i) for i in range(nd)) + "C"
    rhs = "".join(chr(ord("0") + i) for i in range(nd)) + "IO"
    return lax.conv_dimension_numbers((1,) * (nd + 2), (1,) * (nd + 2), (lhs, rhs, lhs))


def bench(fn, *args, iters=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1,) * (x.ndim - 2), "VALID",
        dimension_numbers=dimnums(x.ndim - 2), preferred_element_type=DT,
    )


def convT(x, w):
    nd = x.ndim - 2
    kernel = w.shape[:nd]
    stride = (2, 2, 1)
    pads = [(int(k - 1), int(k - 1)) for k in kernel]
    return lax.conv_general_dilated(
        x, jnp.flip(w, axis=tuple(range(nd))), (1,) * nd, pads,
        lhs_dilation=stride, dimension_numbers=dimnums(nd),
        preferred_element_type=DT,
    )


def pool(x):
    window = (1, 2, 2, 1, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, window, window, "VALID")


key = jax.random.PRNGKey(0)
total = 0.0


def t(name, fn, *args):
    global total
    dt = bench(fn, *args)
    total += dt
    out_shape = jax.eval_shape(fn, *args).shape
    print(f"{name:28s} {dt*1e3:8.1f} ms   -> {out_shape}")
    return out_shape


def rand(shape):
    return jax.random.normal(key, shape, DT)


print(f"devices: {jax.devices()}")
# ---- encoder (tile 496,496,23; halos shrink inside)
s = (B, 496, 496, 23, 4)
s = t("L0 conv1 4->16 (3,3,2)", conv, rand(s), rand((3, 3, 2, 4, 16)))
s = t("L0 conv2 16->16 (3,3,1)", conv, rand(s), rand((3, 3, 1, 16, 16)))
sk0 = s
s = t("L0 pool (2,2,1)", pool, rand(s))
s = t("L1 conv1 16->32", conv, rand(s), rand((3, 3, 2, 16, 32)))
s = t("L1 conv2 32->32", conv, rand(s), rand((3, 3, 1, 32, 32)))
sk1 = s
s = t("L1 pool", pool, rand(s))
s = t("L2 conv1 32->64", conv, rand(s), rand((3, 3, 2, 32, 64)))
s = t("L2 conv2 64->64", conv, rand(s), rand((3, 3, 1, 64, 64)))
sk2 = s
s = t("L2 pool", pool, rand(s))
s = t("L3 conv1 64->128", conv, rand(s), rand((3, 3, 2, 64, 128)))
s = t("L3 conv2 128->128", conv, rand(s), rand((3, 3, 1, 128, 128)))
# ---- decoder
s = t("up2 T-conv 128->64 (8,8,2)", convT, rand(s), rand((8, 8, 2, 128, 64)))
s = (B, min(s[1], sk2[1]), min(s[2], sk2[2]), min(s[3], sk2[3]), 128)
s = t("up2 conv1 128->64", conv, rand(s), rand((3, 3, 2, 128, 64)))
s = t("up2 conv2 64->64", conv, rand(s), rand((3, 3, 1, 64, 64)))
s = t("up1 T-conv 64->32", convT, rand(s), rand((8, 8, 2, 64, 32)))
s = (B, min(s[1], sk1[1]), min(s[2], sk1[2]), min(s[3], sk1[3]), 64)
s = t("up1 conv1 64->32", conv, rand(s), rand((3, 3, 2, 64, 32)))
s = t("up1 conv2 32->32", conv, rand(s), rand((3, 3, 1, 32, 32)))
s = t("up0 T-conv 32->16", convT, rand(s), rand((8, 8, 2, 32, 16)))
s = (B, min(s[1], sk0[1]), min(s[2], sk0[2]), min(s[3], sk0[3]), 32)
s = t("up0 conv1 32->16", conv, rand(s), rand((3, 3, 2, 32, 16)))
s = t("up0 conv2 16->16", conv, rand(s), rand((3, 3, 1, 16, 16)))
s = t("out 1x1 16->1", conv, rand(s), rand((1, 1, 1, 16, 1)))
print(f"{'TOTAL (standalone sum)':28s} {total*1e3:8.1f} ms")

# ---- full model apply for comparison
from hcunet_tpu.config import UNetConfig
from hcunet_tpu.models.unet import init_unet

cfg = UNetConfig.production_3d()
model, variables = init_unet(cfg, jax.random.PRNGKey(0), (140, 140, 10), dtype=DT)
x = rand((B, 496, 496, 23, 4))
dt = bench(lambda v, xx: model.apply(v, xx, train=False), variables, x, iters=10)
print(f"{'FULL model apply':28s} {dt*1e3:8.1f} ms")
