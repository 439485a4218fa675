"""Prototype Pallas kernel for the packed serving conv (VERDICT r2 item #3).

The packed program's convs run at ~20% MXU under XLA's TPU 3D conv codegen
(BASELINE.md roofline: representative [6,494²,3,128] k(3,3,2) conv at
22.0 ms vs a 4.3 ms MXU floor).  This probe hand-writes the conv as a
Pallas kernel:

* the packed activation [B, X, Y, nb, L] is viewed as [B, X, Y, nb*L] so
  z-block taps become 128-aligned *lane* slices (no sublane-collapsing
  reshape — the thing that stalled Mosaic in round 1);
* grid (B, out-z-block, X-blocks); Y stays whole per block;
* each (dx, dy, dzb) tap is a [TX, Yo, Lin] x [Lin, Lout] MXU dot
  accumulated in a f32 VMEM scratch; bias + ReLU fused into the epilogue;
* ragged X edges handled by clamping the element start (the last block
  recomputes a few rows — benign identical writes).

Usage: python -u scripts/probe_pallas_conv.py [--small]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DT = jnp.bfloat16


def _kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, kx, ky, kzb, lin, lout,
            tx, yo, relu, rank3):
    t = 0
    for dx in range(kx):
        for dy in range(ky):
            for dzb in range(kzb):
                xs = x_ref[dx:dx + tx, dy:dy + yo, dzb * lin:(dzb + 1) * lin]
                if rank3:
                    d = jax.lax.dot_general(
                        xs, w_ref[t],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if t == 0:
                        acc_ref[...] = d
                    else:
                        acc_ref[...] += d
                else:
                    for i in range(tx):
                        d = jnp.dot(xs[i], w_ref[t],
                                    preferred_element_type=jnp.float32)
                        if t == 0:
                            acc_ref[i] = d
                        else:
                            acc_ref[i] += d
                t += 1
    r = acc_ref[...] + b_ref[0].astype(jnp.float32)
    if relu:
        r = jnp.maximum(r, 0.0)
    o_ref[...] = r.astype(o_ref.dtype)


def _kernel_im2col(x_ref, w_ref, b_ref, o_ref, im_ref, *, kx, ky, kzb, lin,
                   lout, tx, ty, relu):
    """One dot per block: taps written into a lane-concatenated im2col
    scratch (K = T*lin), so the 18-tap accumulation happens inside the
    MXU, not via VMEM round-trips on an f32 scratch.  (A jnp.concatenate
    of the shifted slices hits Mosaic's "offset mismatch on non-concat
    dimension" — the stores normalize each slice's layout instead.)"""
    t = 0
    for dx in range(kx):
        for dy in range(ky):
            for dzb in range(kzb):
                im_ref[:, :, t * lin:(t + 1) * lin] = (
                    x_ref[dx:dx + tx, dy:dy + ty, dzb * lin:(dzb + 1) * lin]
                )
                t += 1
    r = jax.lax.dot_general(
        im_ref[...], w_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    r = r + b_ref[0].astype(jnp.float32)
    if relu:
        r = jnp.maximum(r, 0.0)
    o_ref[...] = r.astype(o_ref.dtype)


def _kernel_gsum(x_ref, w_ref, b_ref, o_ref, im_ref, *, kx, ky, kzb, lin,
                 lout, tx, ty, relu):
    """Rotation-light: lane-concat only the rotation-free taps (dx on the
    3rd-minor dim, dzb on lanes) into the scratch, one dot to
    G[tx, Y, ky*lout] (per-dy contributions), then ky shifted f32 adds.
    12 sublane rotations/block (im2col) -> ky=3."""
    t = 0
    yin = ty + ky - 1
    for dx in range(kx):
        for dzb in range(kzb):
            im_ref[:, :, t * lin:(t + 1) * lin] = (
                x_ref[dx:dx + tx, :, dzb * lin:(dzb + 1) * lin]
            )
            t += 1
    g = jax.lax.dot_general(
        im_ref[...], w_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tx, yin, ky*lout]
    r = g[:, 0:ty, 0:lout]
    for dy in range(1, ky):
        r = r + g[:, dy:dy + ty, dy * lout:(dy + 1) * lout]
    r = r + b_ref[0].astype(jnp.float32)
    if relu:
        r = jnp.maximum(r, 0.0)
    o_ref[...] = r.astype(o_ref.dtype)


def pallas_conv_gsum(x, w, bias, *, kx, ky, kzb, tx=6, relu=False):
    """x: [B, X, Y, nb, Lin]; w: [kx,ky,kzb,Lin,Lout]; -> [B,Xo,Yo,nbo,Lout]."""
    B, X, Y, nb, lin = x.shape
    lout = w.shape[-1]
    xo, yo = X - kx + 1, Y - ky + 1
    nbo = nb - kzb + 1
    assert xo % tx == 0, (xo, tx)
    T2 = kx * kzb
    x4 = x.reshape(B, X, Y, nb * lin)
    # weights: [T2*lin, ky*lout] with row block (dx, dzb) -> per-dy columns
    wt = (
        w.transpose(0, 2, 3, 1, 4)  # [kx, kzb, lin, ky, lout]
        .reshape(T2 * lin, ky * lout)
    )
    b2 = bias.reshape(1, lout)
    txh = tx + kx - 1

    kern = functools.partial(
        _kernel_gsum, kx=kx, ky=ky, kzb=kzb, lin=lin, lout=lout, tx=tx,
        ty=yo, relu=relu,
    )
    out4 = pl.pallas_call(
        kern,
        grid=(B, nbo, xo // tx),
        in_specs=[
            pl.BlockSpec(
                (None, pl.Element(txh), pl.Element(Y), pl.Element(kzb * lin)),
                lambda b, zo, ix: (b, ix * tx, 0, zo * lin),
            ),
            pl.BlockSpec((T2 * lin, ky * lout), lambda b, zo, ix: (0, 0)),
            pl.BlockSpec((1, lout), lambda b, zo, ix: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, pl.Element(tx), pl.Element(yo), pl.Element(lout)),
            lambda b, zo, ix: (b, ix * tx, 0, zo * lout),
        ),
        out_shape=jax.ShapeDtypeStruct((B, xo, yo, nbo * lout), x.dtype),
        scratch_shapes=[pltpu.VMEM((tx, Y, T2 * lin), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x4, wt, b2)
    return out4.reshape(B, xo, yo, nbo, lout)


def pallas_conv_im2col(x, w, bias, *, kx, ky, kzb, tx=6, ty=123, relu=False):
    """x: [B, X, Y, nb, Lin]; w: [kx,ky,kzb,Lin,Lout]; -> [B,Xo,Yo,nbo,Lout]."""
    B, X, Y, nb, lin = x.shape
    lout = w.shape[-1]
    xo, yo = X - kx + 1, Y - ky + 1
    nbo = nb - kzb + 1
    assert xo % tx == 0 and yo % ty == 0, (xo, tx, yo, ty)
    T = kx * ky * kzb
    x4 = x.reshape(B, X, Y, nb * lin)
    wt = w.reshape(T * lin, lout)
    b2 = bias.reshape(1, lout)
    txh, tyh = tx + kx - 1, ty + ky - 1

    assert yo == ty, "full-Y blocks only (Mosaic can't tile yo=4*123 on 8s)"
    kern = functools.partial(
        _kernel_im2col, kx=kx, ky=ky, kzb=kzb, lin=lin, lout=lout, tx=tx,
        ty=ty, relu=relu,
    )
    out4 = pl.pallas_call(
        kern,
        grid=(B, nbo, xo // tx),
        in_specs=[
            pl.BlockSpec(
                (None, pl.Element(txh), pl.Element(tyh), pl.Element(kzb * lin)),
                lambda b, zo, ix: (b, ix * tx, 0, zo * lin),
            ),
            pl.BlockSpec((T * lin, lout), lambda b, zo, ix: (0, 0)),
            pl.BlockSpec((1, lout), lambda b, zo, ix: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, pl.Element(tx), pl.Element(ty), pl.Element(lout)),
            lambda b, zo, ix: (b, ix * tx, 0, zo * lout),
        ),
        out_shape=jax.ShapeDtypeStruct((B, xo, yo, nbo * lout), x.dtype),
        scratch_shapes=[pltpu.VMEM((tx, ty, T * lin), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x4, wt, b2)
    return out4.reshape(B, xo, yo, nbo, lout)


def pallas_conv_packed(x, w, bias, *, kx, ky, kzb, tx=8, relu=False,
                       rank3=True):
    """x: [B, X, Y, nb, Lin]; w: [kx,ky,kzb,Lin,Lout]; -> [B,Xo,Yo,nbo,Lout]."""
    B, X, Y, nb, lin = x.shape
    lout = w.shape[-1]
    xo, yo = X - kx + 1, Y - ky + 1
    nbo = nb - kzb + 1
    assert xo % tx == 0, (xo, tx)
    x4 = x.reshape(B, X, Y, nb * lin)
    wt = w.reshape(kx * ky * kzb, lin, lout)
    b2 = bias.reshape(1, lout)
    nxb = xo // tx
    txh = tx + kx - 1

    kern = functools.partial(
        _kernel, kx=kx, ky=ky, kzb=kzb, lin=lin, lout=lout, tx=tx, yo=yo,
        relu=relu, rank3=rank3,
    )
    out4 = pl.pallas_call(
        kern,
        grid=(B, nbo, nxb),
        in_specs=[
            pl.BlockSpec(
                (None, pl.Element(txh), pl.Element(Y), pl.Element(kzb * lin)),
                lambda b, zo, ix: (b, ix * tx, 0, zo * lin),
            ),
            pl.BlockSpec((kx * ky * kzb, lin, lout), lambda b, zo, ix: (0, 0, 0)),
            pl.BlockSpec((1, lout), lambda b, zo, ix: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, pl.Element(tx), pl.Element(yo), pl.Element(lout)),
            lambda b, zo, ix: (b, ix * tx, 0, zo * lout),
        ),
        out_shape=jax.ShapeDtypeStruct((B, xo, yo, nbo * lout), x.dtype),
        scratch_shapes=[pltpu.VMEM((tx, yo, lout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x4, wt, b2)
    return out4.reshape(B, xo, yo, nbo, lout)


def xla_conv_packed(x, w, bias, *, relu=False):
    lhs = "N012C"
    dn = lax.conv_dimension_numbers(
        (1,) * 5, (1,) * 5, (lhs, "012IO", lhs))
    out = lax.conv_general_dilated(
        x, w, (1, 1, 1), [(0, 0)] * 3, dimension_numbers=dn,
        preferred_element_type=x.dtype,
    ) + bias
    return jax.nn.relu(out) if relu else out


def bench(fn, x, *args, iters=10):
    """Dependency-chained timing inside ONE jit: a lax.scan whose step i
    perturbs the input by ``prev_scalar * 1e-20`` (value-preserving in
    bf16, but un-foldable by XLA), so all ``iters`` executions truly run
    serially on device.  A plain host loop with identical argument buffers
    is elided by the remote axon client (measured 22 ms -> 0.04 ms
    artefact)."""
    eps = jnp.asarray(1e-20, jnp.float32).astype(x.dtype)

    @jax.jit
    def many(x_arg, *rest):
        def step(prev, _):
            out = fn(x_arg + prev * eps, *rest)
            return out[(0,) * out.ndim].astype(x_arg.dtype), ()

        last, _ = jax.lax.scan(
            step, jnp.zeros((), x_arg.dtype), None, length=iters
        )
        return last

    t0 = time.perf_counter()
    jax.block_until_ready(many(x, *args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(many(x, *args))
    return (time.perf_counter() - t0) / iters, tc


def run_case(name, shape, wshape, tx=8, relu=True, iters=10, rank3=True,
             variant="im2col", ty=123):
    key = jax.random.PRNGKey(0)
    B, X, Y, nb, lin = shape
    kx, ky, kzb, _, lout = wshape
    x = jax.random.normal(key, shape, DT)
    w = (jax.random.normal(key, wshape, jnp.float32) / np.sqrt(lin * kx * ky)).astype(DT)
    bias = jax.random.normal(key, (lout,), DT)

    dt_x, _ = bench(functools.partial(xla_conv_packed, relu=relu), x, w, bias,
                    iters=iters)
    ref = jax.jit(functools.partial(xla_conv_packed, relu=relu))(x, w, bias)

    if variant == "im2col":
        pc = functools.partial(pallas_conv_im2col, kx=kx, ky=ky, kzb=kzb,
                               tx=tx, ty=ty, relu=relu)
    elif variant == "gsum":
        pc = functools.partial(pallas_conv_gsum, kx=kx, ky=ky, kzb=kzb,
                               tx=tx, relu=relu)
    else:
        pc = functools.partial(pallas_conv_packed, kx=kx, ky=ky, kzb=kzb,
                               tx=tx, relu=relu, rank3=rank3)
    dt_p, tc = bench(pc, x, w, bias, iters=iters)
    got = jax.jit(pc)(x, w, bias)

    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    fl = B * (X - kx + 1) * (Y - ky + 1) * (nb - kzb + 1) * kx * ky * kzb \
        * lin * lout * 2
    print(f"{name:28s} xla {dt_x*1e3:7.2f} ms ({fl/dt_x/394e12*100:4.1f}% MXU)"
          f"  pallas {dt_p*1e3:7.2f} ms ({fl/dt_p/394e12*100:4.1f}% MXU)"
          f"  speedup {dt_x/dt_p:4.2f}x  maxerr {err:.3e}  compile {tc:.1f}s",
          flush=True)


def main():
    from hcunet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    small = "--small" in sys.argv
    if small:
        run_case("small smoke", (2, 40, 40, 3, 128), (3, 3, 2, 128, 128),
                 tx=8, iters=3)
        return
    tx = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--tx=")),
                  0))
    var = next((a.split("=")[1] for a in sys.argv if a.startswith("--var=")),
               "im2col")
    cases = {
        "1": lambda: run_case("L0 conv1-ish 494^2 k332", (6, 494, 494, 3, 128),
                              (3, 3, 2, 128, 128), tx=tx or 6, ty=492,
                              variant=var),
        "2": lambda: run_case("L0 conv2 492^2 k331", (6, 492, 492, 3, 128),
                              (3, 3, 1, 128, 128), tx=tx or 10, ty=490,
                              variant=var),
        "3": lambda: run_case("dec conv 484^2 Lin256", (6, 484, 484, 3, 256),
                              (3, 3, 2, 256, 128), tx=tx or 6, ty=482,
                              variant=var),
    }
    want = [a for a in sys.argv if a in cases] or list(cases)
    for c in want:
        cases[c]()


if __name__ == "__main__":
    main()
