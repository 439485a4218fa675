"""Compare the plain model.apply against the packed serving compiler on the
production tile-batch workload.  Usage: python -u scripts/probe_serving.py
[zb0 zb1 zb2 zb3]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hcunet_tpu.config import UNetConfig
from hcunet_tpu.infer.compile import compile_serving_apply
from hcunet_tpu.models.unet import init_unet

B, S, Z = 6, 496, 23
DT = jnp.bfloat16


def bench(fn, *args, iters=10):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    print(f"  (compile+first: {time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


cfg = UNetConfig.production_3d()
model, variables = init_unet(cfg, jax.random.PRNGKey(0), (140, 140, 10), dtype=DT)
x = jax.random.uniform(jax.random.PRNGKey(1), (B, S, S, Z, 4), DT)

zb_plan = [int(a) for a in sys.argv[1:5]] or None
if zb_plan is None:
    # baseline comparison only on the default run (plain apply costs a
    # ~2-min compile on this hardware)
    plain = jax.tree_util.Partial(
        lambda v, t: model.apply(v, t, train=False), variables
    )
    dt = bench(lambda t: plain(t), x)
    print(f"plain model.apply         {dt*1e3:8.1f} ms")

served = compile_serving_apply(model, variables, dtype=DT, zb_plan=zb_plan)
dt2 = bench(served, x)
print(f"packed serving apply      {dt2*1e3:8.1f} ms   (zb_plan={zb_plan})")
