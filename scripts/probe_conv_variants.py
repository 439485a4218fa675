"""Conv-formulation experiments behind the BASELINE.md roofline claims.

Times alternative formulations of the packed serving conv on the TPU:

* the production packed 3D conv (nb z-blocks as the minor spatial dim);
* the same conv with nb as the MAJOR spatial dim;
* 2D-batch-fold (nb folded into batch, z-taps as shifted adds);
* pure 2D convs at 256/384 lanes (what full-z packing would run).

Measured on v5e (2026-08-17): 22.0 / 32.4 / 35.5 ms and 27.4 / 46.8 ms —
every variant lands at 16-25% MXU, i.e. the ceiling is XLA's conv codegen
on this chip, not the formulation.  Usage: python -u scripts/probe_conv_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

DT = jnp.bfloat16
B = 6


def bench(fn, *args, iters=10):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def dn(nd):
    lhs = "N" + "".join(str(i) for i in range(nd)) + "C"
    rhs = "".join(str(i) for i in range(nd)) + "IO"
    return lax.conv_dimension_numbers((1,) * (nd + 2), (1,) * (nd + 2), (lhs, rhs, lhs))


def main():
    key = jax.random.PRNGKey(0)
    # L0 conv2-shaped packed conv: [B, 494, 494, nb3, 128] k(3,3,2)
    x = jax.random.normal(key, (B, 494, 494, 3, 128), DT)
    w = jax.random.normal(key, (3, 3, 2, 128, 128), DT)

    def conv_nb_minor(x):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), [(0, 0)] * 3, dimension_numbers=dn(3),
            preferred_element_type=DT,
        )

    dt = bench(conv_nb_minor, x)
    fl = B * 492 * 492 * 2 * 9 * 2 * 128 * 128 * 2
    print(f"packed 3D, nb minor : {dt*1e3:6.1f} ms ({fl/dt/394e12*100:.0f}% MXU)")

    xf = jnp.transpose(x, (0, 3, 1, 2, 4))
    wf = jnp.transpose(w, (2, 0, 1, 3, 4))

    def conv_nb_major(x):
        return lax.conv_general_dilated(
            x, wf, (1, 1, 1), [(0, 0)] * 3, dimension_numbers=dn(3),
            preferred_element_type=DT,
        )

    print(f"packed 3D, nb major : {bench(conv_nb_major, xf)*1e3:6.1f} ms")

    xb = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(B * 3, 494, 494, 128)
    w2a, w2b = w[:, :, 0], w[:, :, 1]

    def conv_2dfold(xb):
        a = lax.conv_general_dilated(
            xb, w2a, (1, 1), [(0, 0)] * 2, dimension_numbers=dn(2),
            preferred_element_type=DT,
        ).reshape(B, 3, 492, 492, 128)
        b = lax.conv_general_dilated(
            xb, w2b, (1, 1), [(0, 0)] * 2, dimension_numbers=dn(2),
            preferred_element_type=DT,
        ).reshape(B, 3, 492, 492, 128)
        return a[:, :2] + b[:, 1:]

    print(f"2D batch-fold       : {bench(conv_2dfold, xb)*1e3:6.1f} ms")

    for L in (256, 384):
        x2 = jax.random.normal(key, (B, 494, 494, L), DT)
        w2 = jax.random.normal(key, (3, 3, L, L), DT)

        def conv2d(x2, w2=w2):
            return lax.conv_general_dilated(
                x2, w2, (1, 1), [(0, 0)] * 2, dimension_numbers=dn(2),
                preferred_element_type=DT,
            )

        dt = bench(conv2d, x2)
        fl = B * 492 * 492 * 9 * L * L * 2
        print(f"pure 2D, {L} lanes  : {dt*1e3:6.1f} ms ({fl/dt/394e12*100:.0f}% MXU)")


if __name__ == "__main__":
    main()
