"""Control for the Pallas-conv analysis: the pure Mosaic dot ceiling.

Runs JUST the gsum kernel's dot ([tx, Y, K] @ [K, N] per block, same grid,
same block shapes, no tap stores / no shifted adds) so the conv probes'
deficit can be attributed: if this hits high MXU%, the conv floor is the
VPU tap-materialization; if this also sits at ~16%, Mosaic's dot pipeline
itself is the ceiling.  Usage: python -u scripts/probe_pallas_dot.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DT = jnp.bfloat16


def _kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def pallas_dot(x, w, tx):
    B, X, Y, K = x.shape
    N = w.shape[-1]
    out = pl.pallas_call(
        _kernel,
        grid=(B, X // tx),
        in_specs=[
            pl.BlockSpec((None, tx, Y, K), lambda b, ix: (b, ix, 0, 0)),
            pl.BlockSpec((K, N), lambda b, ix: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, tx, Y, N), lambda b, ix: (b, ix, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, X, Y, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, w)
    return out


def bench(fn, x, *args, iters=10):
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


def main():
    from hcunet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    for (B, X, Y, K, N, tx) in [
        (12, 492, 494, 768, 384, 12),  # gsum case-1 dot at full scale
        (6, 492, 494, 2304, 128, 6),   # im2col case-1 dot at full scale
    ]:
        x = jax.random.normal(key, (B, X, Y, K), DT)
        w = jax.random.normal(key, (K, N), DT)
        dt, tc = bench(functools.partial(pallas_dot, tx=tx), x, w)
        fl = B * X * Y * K * N * 2
        print(
            f"[{B},{X},{Y},{K}]@[{K},{N}] tx={tx}: {dt*1e3:7.2f} ms "
            f"({fl/dt/394e12*100:4.1f}% MXU)  compile {tc:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
