"""Measure RecursiveUNet inference: plain nn.scan vs packed serving
(infer/compile_recurrent.py) on the 256^2 x 10 recurrent workload
(BASELINE.md: plain bf16 = 0.7 MVx/s on v5e; torch-CPU = 0.0118).

Usage: python scripts/probe_recurrent_packed.py [--plain-only|--packed-only]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from hcunet_tpu.config import RUNetConfig  # noqa: E402
from hcunet_tpu.infer.compile_recurrent import compile_recurrent_apply  # noqa: E402
from hcunet_tpu.models.runet import RecursiveUNet  # noqa: E402
from hcunet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

X = Y = 256
Z = 10
cfg = RUNetConfig(timesteps=10)


def bench(fn, x, label):
    t0 = time.perf_counter()
    float(jnp.sum(fn(x)))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(x)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mvx = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3] / 1e6
    print(
        f"{label}: {dt * 1e3:.1f} ms/vol = {mvx / dt:.2f} MVx/s "
        f"(compile {compile_s:.1f}s)"
    )
    return mvx / dt


def main():
    global X, Y, Z
    B = 1
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            B = int(a.split("=", 1)[1])
        elif a.startswith("--z="):
            Z = int(a.split("=", 1)[1])
        elif a.startswith("--xy="):
            X = Y = int(a.split("=", 1)[1])
    model = RecursiveUNet(cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (B, X, Y, Z, cfg.in_channels), jnp.float32
    )
    variables = model.init(
        jax.random.PRNGKey(1), x[:, :32, :32], train=False
    )

    if "--packed-only" not in sys.argv:
        plain = jax.jit(
            lambda v, t: model.apply(v, t, train=False)
        )
        bench(lambda t: plain(variables, t), x, "plain nn.scan bf16")

    if "--plain-only" not in sys.argv:
        plans = [None]
        split = 1
        for a in sys.argv[1:]:
            if a == "--split":
                split = 2
            elif a.startswith("--split="):
                split = int(a.split("=", 1)[1])
            elif a.startswith("--plan="):
                plans = [
                    tuple(int(v) for v in p.split(","))
                    for p in a.split("=", 1)[1].split(";")
                ]
        for plan in plans:
            packed = jax.jit(
                compile_recurrent_apply(
                    model, variables, dtype=jnp.bfloat16, zb_plan=plan,
                    split_x=split,
                )
            )
            label = f"packed serving bf16 plan={plan}" + (
                " split-x" if split == 2 else ""
            )
            bench(packed, x, label)


if __name__ == "__main__":
    main()
