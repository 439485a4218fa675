"""Measure RDCNet inference: plain nn.scan vs packed serving
(infer/compile_recurrent.compile_rdcnet_apply) on the 256^2 x 10 recurrent
workload (BASELINE.md: plain bf16 = 3.94 MVx/s on v5e; torch-CPU = 0.0516).

VERDICT r3 #5: pack the StackedDilation family (dilated z-taps as strided
block/slot offsets on the same c-major lane scheme).

Usage: python scripts/probe_rdcnet_packed.py [--plain-only|--packed-only]
         [--batch=N] [--z=N] [--xy=N] [--zb=a;b;c]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from hcunet_tpu.config import RDCNetConfig  # noqa: E402
from hcunet_tpu.infer.compile_recurrent import compile_rdcnet_apply  # noqa: E402
from hcunet_tpu.models.rdcnet import RDCNet  # noqa: E402
from hcunet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    B, Z, XY = 1, 10, 256
    zbs = [None]
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            B = int(a.split("=", 1)[1])
        elif a.startswith("--z="):
            Z = int(a.split("=", 1)[1])
        elif a.startswith("--xy="):
            XY = int(a.split("=", 1)[1])
        elif a.startswith("--zb="):
            zbs = [int(v) for v in a.split("=", 1)[1].split(";")]
    cfg = RDCNetConfig(timesteps=10)
    model = RDCNet(cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (B, XY, XY, Z, cfg.in_channels), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(1), x[:, :32, :32])
    mvx = B * XY * XY * Z / 1e6

    def bench(fn, label):
        t0 = time.perf_counter()
        float(jnp.sum(fn(x)))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(fn(x)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(
            f"{label} (B={B}, {XY}^2 x {Z}): {dt * 1e3:.1f} ms = "
            f"{mvx / dt:.2f} MVx/s (compile {compile_s:.1f}s)"
        )

    if "--packed-only" not in sys.argv:
        plain = jax.jit(lambda v, t: model.apply(v, t, train=False))
        bench(lambda t: plain(variables, t), "plain nn.scan bf16")

    if "--plain-only" not in sys.argv:
        split = 1
        for a in sys.argv[1:]:
            if a == "--split":
                split = 2
            elif a.startswith("--split="):
                split = int(a.split("=", 1)[1])
        for zb in zbs:
            packed = jax.jit(
                compile_rdcnet_apply(
                    model, variables, dtype=jnp.bfloat16, zb=zb,
                    split_x=split,
                )
            )
            label = f"packed serving bf16 zb={zb}" + (
                " split-x" if split == 2 else ""
            )
            bench(packed, label)


if __name__ == "__main__":
    main()
