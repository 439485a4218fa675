"""Measure a hand-written Pallas min-plus EDT kernel vs the product's jnp
formulation on the TPU (VERDICT r4 #5 — wire or retire the Pallas kernel).

VERDICT (v5e, 2026-08-20): the Pallas kernel runs the per-slice EDT at
**0.64×** XLA at the 412²×12 watershed-tile geometry and **0.47×** at
1212²×8, bit-exact — same conclusion as the round-3 conv/dot probes
(Pallas lands at 0.6–0.8× XLA on this toolchain).  The kernel was RETIRED
from the product (``hcunet_tpu/ops/distance.py`` keeps the jnp
formulation as the TPU path); the full kernel lives here so the
measurement stays reproducible.

Timed with a dependency-chained ``lax.scan`` because the remote axon
client elides repeat executions with identical argument buffers
(BASELINE.md round-3 methodology).

Usage: python scripts/probe_edt_device.py [--hw 412] [--z 12] [--reps 10]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# --- the retired Pallas kernel (kept verbatim for reproducibility) ----------
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 8
BLOCK_J = 128


def _edt_pass_kernel(d_ref, out_ref):
    """out[r, j] = min_k d[r, k] + (j-k)^2, one [BLOCK_R, BLOCK_J] tile."""
    j0 = pl.program_id(1) * BLOCK_J
    n = d_ref.shape[1]
    n_ktiles = n // BLOCK_J

    jj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_J, BLOCK_J), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_J, BLOCK_J), 1)
    base = (j0 + jj - kk).astype(jnp.float32)  # [j, k]

    def body(kt, acc):
        k0 = pl.multiple_of(kt * BLOCK_J, BLOCK_J)
        dk = d_ref[:, pl.ds(k0, BLOCK_J)]
        delta = base - (kt * BLOCK_J).astype(jnp.float32)
        cost = dk[:, None, :] + (delta * delta)[None, :, :]
        return jnp.minimum(acc, jnp.min(cost, axis=-1))

    init = jnp.full((BLOCK_R, BLOCK_J), jnp.float32(1e12))
    out_ref[:, :] = jax.lax.fori_loop(0, n_ktiles, body, init)


@functools.partial(jax.jit, static_argnames=("interpret",))
def edt_axis_pass_rows(d2, interpret: bool = False):
    R, N = d2.shape
    pr = (-R) % BLOCK_R
    pj = (-N) % BLOCK_J
    padded = jnp.pad(d2, ((0, pr), (0, pj)), constant_values=1e12)
    Rp, Np = padded.shape
    out = pl.pallas_call(
        _edt_pass_kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, Np), jnp.float32),
        grid=(Rp // BLOCK_R, Np // BLOCK_J),
        in_specs=[
            pl.BlockSpec((BLOCK_R, Np), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, BLOCK_J), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded.astype(jnp.float32))
    return out[:R, :N]


def edt_pallas(binary, axes=None, interpret: bool = False):
    axes = tuple(range(binary.ndim)) if axes is None else tuple(axes)
    dist2 = jnp.where(jnp.asarray(binary) != 0, 1e12, 0.0).astype(jnp.float32)
    for ax in axes:
        moved = jnp.moveaxis(dist2, ax, -1)
        flat = moved.reshape(-1, moved.shape[-1])
        flat = edt_axis_pass_rows(flat, interpret=interpret)
        dist2 = jnp.moveaxis(flat.reshape(moved.shape), -1, ax)
    return jnp.sqrt(jnp.minimum(dist2, 1e12))


# --- the probe ---------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=412)
    ap.add_argument("--z", type=int, default=12)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from hcunet_tpu.ops.distance import edt
    from hcunet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    shape = (args.hw, args.hw, args.z)
    rng = np.random.default_rng(0)
    binary = (rng.random(shape) > 0.4).astype(np.float32)
    binary[0, 0, :] = 0  # at least one background pixel per slice
    x = jax.device_put(jnp.asarray(binary))

    def chain(fn, n):
        @jax.jit
        def run(x0):
            def body(c, _):
                out = fn(c)
                # data-dependent carry so XLA cannot elide iterations; the
                # tiny drift is irrelevant — min-plus cost is shape-bound
                return c + out.sum() * 1e-30, out.sum()

            _, sums = jax.lax.scan(body, x0, None, length=n)
            return sums

        return run

    results = {}
    for name, fn in (
        ("jnp", lambda c: edt(c, axes=(0, 1))),
        ("pallas", lambda c: edt_pallas(c, axes=(0, 1))),
    ):
        run = chain(fn, args.reps)
        float(run(x).sum())  # compile + warm
        t0 = time.perf_counter()
        float(run(x).sum())
        dt = (time.perf_counter() - t0) / args.reps
        results[name] = dt
        print(f"{name}: {dt * 1e3:.2f} ms per {shape} per-slice EDT", flush=True)

    a = np.asarray(edt(x, axes=(0, 1)))
    b = np.asarray(edt_pallas(x, axes=(0, 1)))
    print(f"max |jnp - pallas| = {float(np.abs(a - b).max()):.2e}")
    print(
        f"speedup pallas vs jnp: {results['jnp'] / results['pallas']:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
