"""Probe: z-block lane packing for the small-channel 3D convs.

Idea: XLA's TPU conv is MXU-efficient at Cin=Cout=128 (measured ~97 TFLOP/s
on the L3 block) but bandwidth-inflated at the U-Net's real channel counts
(4..32).  Pack ``z_block = 128 // C`` z-planes into the channel dim so every
conv becomes a [3, 3, kzb] conv at 128 packed channels, with block-banded
weights (z-block-diagonal, kz coupling via the zb axis).  FLOPs inflate by
z_block; bytes drop to ~minimal.  Pure XLA — no Pallas.

Usage: python -u scripts/probe_packed.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DT = jnp.bfloat16
B = 6
S = 496
Z = 23


def dimnums(nd):
    lhs = "N" + "".join(chr(ord("0") + i) for i in range(nd)) + "C"
    rhs = "".join(chr(ord("0") + i) for i in range(nd)) + "IO"
    return lax.conv_dimension_numbers((1,) * (nd + 2), (1,) * (nd + 2), (lhs, rhs, lhs))


def conv3d(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=dimnums(3),
        preferred_element_type=jnp.promote_types(x.dtype, DT),
    )


def bench(fn, *args, iters=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def report(name, dt, shape=None):
    print(f"{name:36s} {dt*1e3:8.1f} ms   {shape if shape else ''}")


# ---------------------------------------------------------------------------
# packing helpers
# ---------------------------------------------------------------------------


def pack(x, zb):
    """[B, X, Y, Z, C] -> [B, X, Y, nb, zb*C]; pads Z to a multiple of zb."""
    b, X, Y, z, c = x.shape
    nb = -(-z // zb)
    x = jnp.pad(x, [(0, 0)] * 3 + [(0, nb * zb - z), (0, 0)])
    return x.reshape(b, X, Y, nb, zb * c)


def unpack(x, zb, z_out, c):
    b, X, Y, nb, _ = x.shape
    return x.reshape(b, X, Y, nb * zb, c)[:, :, :, :z_out, :]


def pack_weights_kz(w, zb, z_pad):
    """[kx, ky, kz, Cin, Cout] -> packed [kx, ky, kzb, zb*Cin, zb*Cout].

    Output packed block b, slot zo (orig z = b*zb+zo) needs inputs
    orig z in [b*zb+zo, b*zb+zo+kz-1] which live in blocks b + (zo+dz)//zb.
    kzb = number of distinct relative blocks = 1 + (zb-1+kz-1)//zb.
    """
    kx, ky, kz, cin, cout = w.shape
    kzb = 1 + (zb - 1 + kz - 1) // zb
    wp = np.zeros((kx, ky, kzb, zb * cin, zb * cout), np.float32)
    wn = np.asarray(w, np.float32)
    for zo in range(zb):
        for dz in range(kz):
            zi = zo + dz
            rb, ri = zi // zb, zi % zb
            wp[:, :, rb, ri * cin : (ri + 1) * cin, zo * cout : (zo + 1) * cout] = wn[:, :, dz]
    return jnp.asarray(wp, w.dtype)


def conv_packed_pre(x, wp, zb, z_out, cout):
    """x: [B,X,Y,Z,C]; wp: pre-packed weights -> same result as conv3d."""
    kzb = wp.shape[2]
    xp = pack(x, zb)
    # pad one extra block at the end so VALID over nb keeps all nb blocks
    xp = jnp.pad(xp, [(0, 0), (0, 0), (0, 0), (0, kzb - 1), (0, 0)])
    yp = conv3d(xp, wp)
    return unpack(yp, zb, z_out, cout)


def conv_packed(x, w, zb):
    """x: [B,X,Y,Z,C]; w: [kx,ky,kz,Cin,Cout] -> same result as conv3d via
    z-block packing (output cropped to the valid z extent)."""
    z_out = x.shape[3] - w.shape[2] + 1
    wp = pack_weights_kz(w, zb, 0)
    return conv_packed_pre(x, wp, zb, z_out, w.shape[-1])


key = jax.random.PRNGKey(0)
print(f"devices: {jax.devices()}  batch={B} side={S} z={Z} dtype={DT.__name__}")

# correctness check (f32 on small shapes)
xs = jax.random.normal(key, (1, 16, 16, 11, 4), jnp.float32)
ws = jax.random.normal(key, (3, 3, 2, 4, 16), jnp.float32)
a = conv3d(xs, ws)
bb = conv_packed(xs, ws, 8)
err = float(jnp.abs(a - bb).max())
print("packed conv max err (k=(3,3,2)):", err)
assert err < 1e-3
ws1 = jax.random.normal(key, (3, 3, 1, 4, 16), jnp.float32)
err = float(jnp.abs(conv3d(xs, ws1) - conv_packed(xs, ws1, 8)).max())
print("packed conv max err (k=(3,3,1)):", err)
assert err < 1e-3

# ---- L0 conv1: 4 -> 16, zb = 32? 128//4 = 32 (Z=23 -> 1 block) or 8
x = jax.random.normal(key, (B, S, S, Z, 4), DT)
w1 = jax.random.normal(key, (3, 3, 2, 4, 16), DT) * 0.1
report("L0 conv1 3d (base)", bench(conv3d, x, w1))
for zb in (4, 8):
    wp = pack_weights_kz(w1, zb, 0)
    zo, co = x.shape[3] - w1.shape[2] + 1, w1.shape[-1]
    report(f"L0 conv1 packed zb={zb}", bench(lambda xx, ww: conv_packed_pre(xx, ww, zb, zo, co), x, wp))

# ---- L0 conv2: 16 -> 16
x2 = jax.random.normal(key, (B, S - 2, S - 2, Z - 1, 16), DT)
w2 = jax.random.normal(key, (3, 3, 1, 16, 16), DT) * 0.1
report("L0 conv2 3d (base)", bench(conv3d, x2, w2))
for zb in (4, 8):
    wp = pack_weights_kz(w2, zb, 0)
    zo, co = x2.shape[3] - w2.shape[2] + 1, w2.shape[-1]
    report(f"L0 conv2 packed zb={zb}", bench(lambda xx, ww: conv_packed_pre(xx, ww, zb, zo, co), x2, wp))

# ---- L1 conv1: 16 -> 32 at half res
S1 = (S - 4) // 2
x3 = jax.random.normal(key, (B, S1, S1, Z - 2, 16), DT)
w3 = jax.random.normal(key, (3, 3, 2, 16, 32), DT) * 0.1
report("L1 conv1 3d (base)", bench(conv3d, x3, w3))
for zb in (4, 8):
    wp = pack_weights_kz(w3, zb, 0)
    zo, co = x3.shape[3] - w3.shape[2] + 1, w3.shape[-1]
    report(f"L1 conv1 packed zb={zb}", bench(lambda xx, ww: conv_packed_pre(xx, ww, zb, zo, co), x3, wp))

# ---- L1 conv2: 32 -> 32
x4 = jax.random.normal(key, (B, S1 - 2, S1 - 2, Z - 3, 32), DT)
w4 = jax.random.normal(key, (3, 3, 1, 32, 32), DT) * 0.1
report("L1 conv2 3d (base)", bench(conv3d, x4, w4))
for zb in (2, 4):
    wp = pack_weights_kz(w4, zb, 0)
    zo, co = x4.shape[3] - w4.shape[2] + 1, w4.shape[-1]
    report(f"L1 conv2 packed zb={zb}", bench(lambda xx, ww: conv_packed_pre(xx, ww, zb, zo, co), x4, wp))

# ---- up0 conv1: 32 -> 16 at full res (decoder hot spot)
x5 = jax.random.normal(key, (B, S - 10, S - 10, Z - 3, 32), DT)
w5 = jax.random.normal(key, (3, 3, 2, 32, 16), DT) * 0.1
report("up0 conv1 3d (base)", bench(conv3d, x5, w5))
for zb in (2, 4):
    wp = pack_weights_kz(w5, zb, 0)
    zo, co = x5.shape[3] - w5.shape[2] + 1, w5.shape[-1]
    report(f"up0 conv1 packed zb={zb}", bench(lambda xx, ww: conv_packed_pre(xx, ww, zb, zo, co), x5, wp))

# ---- maxpool formulations
def pool_rw(x):
    window = (1, 2, 2, 1, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, window, window, "VALID")


def pool_slices(x):
    a = jnp.maximum(x[:, 0::2, 0::2], x[:, 1::2, 0::2])
    bq = jnp.maximum(x[:, 0::2, 1::2], x[:, 1::2, 1::2])
    return jnp.maximum(a, bq)


xp = jax.random.normal(key, (B, 492, 492, 22, 16), DT)
report("L0 pool reduce_window", bench(pool_rw, xp))
report("L0 pool strided-slices", bench(pool_slices, xp))
err = float(jnp.abs(pool_rw(xp) - pool_slices(xp)).max())
print("pool formulations equal:", err == 0.0)
