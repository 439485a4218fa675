"""Probe: per-conv HBM bytes + wall time for the production U-Net's hot
convs, comparing the plain XLA 3D conv against a z-folded 2D formulation
(fold Z into the channel/lane dim so Cin is MXU-lane-friendly).

Usage: python scripts/probe_conv_bytes.py [batch] [side] [z]
Runs on the default platform (TPU under axon).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 6
S = int(sys.argv[2]) if len(sys.argv) > 2 else 496
Z = int(sys.argv[3]) if len(sys.argv) > 3 else 23
DT = jnp.bfloat16


def dimnums(nd):
    lhs = "N" + "".join(chr(ord("0") + i) for i in range(nd)) + "C"
    rhs = "".join(chr(ord("0") + i) for i in range(nd)) + "IO"
    return lax.conv_dimension_numbers((1,) * (nd + 2), (1,) * (nd + 2), (lhs, rhs, lhs))


def conv3d(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=dimnums(3),
        preferred_element_type=DT,
    )


def zfold_weights(w, z_in):
    """[kx,ky,kz,Cin,Cout] -> 2D block-banded [kx,ky, z_in*Cin, z_out*Cout]."""
    kx, ky, kz, cin, cout = w.shape
    z_out = z_in - kz + 1
    w2 = jnp.zeros((kx, ky, z_in * cin, z_out * cout), w.dtype)
    for zo in range(z_out):
        for dz in range(kz):
            zi = zo + dz
            w2 = w2.at[:, :, zi * cin : (zi + 1) * cin, zo * cout : (zo + 1) * cout].set(
                w[:, :, dz]
            )
    return w2


def conv_zfold(x, w):
    """x: [B,X,Y,Z,C]; w: [kx,ky,kz,Cin,Cout] -> same as conv3d via 2D conv."""
    b, X, Y, z, c = x.shape
    kz = w.shape[2]
    z_out = z - kz + 1
    cout = w.shape[-1]
    x2 = x.reshape(b, X, Y, z * c)
    w2 = zfold_weights(w, z)
    y2 = lax.conv_general_dilated(
        x2, w2, (1, 1), "VALID", dimension_numbers=dimnums(2),
        preferred_element_type=DT,
    )
    return y2.reshape(b, X - w.shape[0] + 1, Y - w.shape[1] + 1, z_out, cout)


def bench(fn, *args, iters=20):
    """Steady-state per-call device time: enqueue `iters` async dispatches,
    sync once at the end (single scalar readback).  Amortizes the ~30-80 ms
    remote-tunnel dispatch latency that poisons per-call timing."""
    jfn = jax.jit(fn)
    lowered = jfn.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])  # honest sync (scalar readback)
    dt = (time.perf_counter() - t0) / iters
    return dt, ca.get("bytes accessed", float("nan")), ca.get("flops", float("nan"))


def report(name, dt, by, fl):
    print(
        f"{name:34s} {dt*1e3:9.1f} ms  {by/1e9:8.2f} GB  {fl/1e12:7.3f} TFLOP "
        f"{by/dt/1e9:8.0f} GB/s  {fl/dt/1e12:6.1f} TFLOP/s"
    )


key = jax.random.PRNGKey(0)
print(f"devices: {jax.devices()}  batch={B} side={S} z={Z} dtype={DT.__name__}")

# ---- level-0 conv1: Cin=4 -> 16, k (3,3,2)
x = jax.random.normal(key, (B, S, S, Z, 4), DT)
w1 = jax.random.normal(key, (3, 3, 2, 4, 16), DT) * 0.1
report("L0 conv1 3d  (Cin=4)", *bench(conv3d, x, w1))
report("L0 conv1 zfold", *bench(conv_zfold, x, w1))

# ---- level-0 conv2: 16 -> 16, k (3,3,1)
x2 = jax.random.normal(key, (B, S - 2, S - 2, Z - 1, 16), DT)
w2 = jax.random.normal(key, (3, 3, 1, 16, 16), DT) * 0.1
report("L0 conv2 3d  (Cin=16)", *bench(conv3d, x2, w2))
report("L0 conv2 zfold", *bench(conv_zfold, x2, w2))

# ---- level-1 conv1: 16 -> 32 at half res
S1 = (S - 4) // 2
x3 = jax.random.normal(key, (B, S1, S1, Z - 2, 16), DT)
w3 = jax.random.normal(key, (3, 3, 2, 16, 32), DT) * 0.1
report("L1 conv1 3d  (Cin=16)", *bench(conv3d, x3, w3))
report("L1 conv1 zfold", *bench(conv_zfold, x3, w3))

# ---- level-1 conv2: 32 -> 32
x4 = jax.random.normal(key, (B, S1 - 2, S1 - 2, Z - 3, 32), DT)
w4 = jax.random.normal(key, (3, 3, 1, 32, 32), DT) * 0.1
report("L1 conv2 3d  (Cin=32)", *bench(conv3d, x4, w4))
report("L1 conv2 zfold", *bench(conv_zfold, x4, w4))

# correctness spot check (f32, CPU-precision-insensitive)
xs = jax.random.normal(key, (1, 20, 20, 7, 4), jnp.float32)
ws = jax.random.normal(key, (3, 3, 2, 4, 16), jnp.float32)


def c3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=dimnums(3),
        preferred_element_type=jnp.float32,
    )


def cz(x, w):
    b, X, Y, z, c = x.shape
    x2 = x.reshape(b, X, Y, z * c)
    w2 = zfold_weights(w, z).astype(jnp.float32)
    y2 = lax.conv_general_dilated(
        x2, w2, (1, 1), "VALID", dimension_numbers=dimnums(2),
        preferred_element_type=jnp.float32,
    )
    return y2.reshape(b, X - 2, Y - 2, z - 1, 16)


a = c3(xs, ws)
bb = cz(xs, ws)
err = float(jnp.abs(a - bb).max())
print("zfold max err vs 3d conv:", err)
assert err < 1e-3
