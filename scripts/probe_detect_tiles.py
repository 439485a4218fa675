"""Sweep detection tile geometry on the TPU (VERDICT r1 weak #7: DET_EVAL
500 was inherited from the reference's CPU table, never tuned for TPU).

Times Detector.detect on batched z-planes for several tile sides.
Usage: python -u scripts/probe_detect_tiles.py [z_batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hcunet_tpu.config import DetectorConfig
from hcunet_tpu.models.detection import Detector

Z = int(sys.argv[1]) if len(sys.argv) > 1 else 8

det = Detector(DetectorConfig(), dtype=jnp.bfloat16)

for side in (352, 448, 512, 548, 640, 768):
    variables = det.init(jax.random.PRNGKey(0), (side, side))
    x = jax.random.uniform(jax.random.PRNGKey(1), (Z, side, side, 3), jnp.float32)
    t0 = time.perf_counter()
    out = det.detect(variables, x)
    jax.block_until_ready(out)
    float(jnp.asarray(out["scores"]).ravel()[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = det.detect(variables, x)
    float(jnp.asarray(out["scores"]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    mpx = Z * side * side / 1e6
    print(
        f"side {side}: compile+first {tc:.1f}s, steady {dt * 1e3:7.1f} ms "
        f"for {Z} planes -> {mpx / dt:6.1f} MPx/s",
        flush=True,
    )
