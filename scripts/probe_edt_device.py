"""Measure the Pallas min-plus EDT kernel vs the jnp fallback on the TPU
(VERDICT r4 #5 — wire or retire ``ops/pallas/edt.py``).

Times the per-z-slice 2D EDT at the instance-watershed tile geometry
(412² × 12, the host-RAM-keyed tile of ``infer/instance.py``) and at the
full production chunk slab, both formulations parity-checked against each
other.  Timed with a dependency-chained ``lax.scan`` because the remote
axon client elides repeat executions with identical argument buffers
(BASELINE.md round-3 methodology).

Usage: python scripts/probe_edt_device.py [--hw 412] [--z 12] [--reps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=412)
    ap.add_argument("--z", type=int, default=12)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hcunet_tpu.ops.distance import edt
    from hcunet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    shape = (args.hw, args.hw, args.z)
    rng = np.random.default_rng(0)
    binary = (rng.random(shape) > 0.4).astype(np.float32)
    binary[0, 0, :] = 0  # at least one background pixel per slice
    x = jax.device_put(jnp.asarray(binary))

    def chain(fn, n):
        # dependency-chain n applications so the remote client can't elide
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
    for name, use_pallas in (("jnp", False), ("pallas", True)):
        fn = lambda c, up=use_pallas: edt(c, axes=(0, 1), use_pallas=up)
        run = chain(fn, args.reps)
        s = run(x)
        float(s.sum())  # compile + warm
        t0 = time.perf_counter()
        float(run(x).sum())
        dt = (time.perf_counter() - t0) / args.reps
        results[name] = dt
        print(f"{name}: {dt * 1e3:.2f} ms per {shape} per-slice EDT", flush=True)

    # parity
    a = np.asarray(edt(x, axes=(0, 1), use_pallas=False))
    b = np.asarray(edt(x, axes=(0, 1), use_pallas=True))
    err = float(np.abs(a - b).max())
    print(f"max |jnp - pallas| = {err:.2e}")
    print(
        f"speedup pallas vs jnp: {results['jnp'] / results['pallas']:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
