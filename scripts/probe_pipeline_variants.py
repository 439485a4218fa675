"""Pipeline-stage budget probe behind the round-3 analyze() optimization.

Runs the bench scene (1536²×12, 2×2 chunks) through analyze() under
different knob settings on the real TPU and prints wall time + stage
seconds + the *unaccounted* residual (wall - sum(stages)), which round 2
never measured — the H2D upload and the compressed .npz chunk spills run
outside every stage timer.

Usage: python -u scripts/probe_pipeline_variants.py [--quick]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hcunet_tpu.benchmarks import _blob_scene, _fit_unet_to_scene
from hcunet_tpu.config import PipelineConfig, UNetConfig, auto_tile_config
from hcunet_tpu.infer.compile import compile_serving_apply
from hcunet_tpu.infer.pipeline import analyze
from hcunet_tpu.models.detection import Detector
from hcunet_tpu.models.unet import init_unet
from hcunet_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    shape = (1536, 1536, 12)
    vol, truth = _blob_scene(*shape, n_cells=160)

    ucfg = UNetConfig.production_3d()
    model, variables = init_unet(
        ucfg, jax.random.PRNGKey(0), input_spatial=(140, 140, 10),
        dtype=jnp.bfloat16,
    )
    variables = _fit_unet_to_scene(model, variables, vol, truth)
    unet_apply = jax.tree_util.Partial(
        compile_serving_apply(model, variables, dtype=jnp.bfloat16)
    )
    det = Detector(dtype=jnp.bfloat16)
    det_vars = det.init(jax.random.PRNGKey(1), (shape[0] // 2, shape[1] // 2))

    import dataclasses

    base = PipelineConfig(numchunks=3, unet=ucfg, tiles=auto_tile_config(ucfg))

    variants = [
        ("default (overlap auto)", dict(cfg=base, overlap=None)),
        ("overlap forced on", dict(cfg=base, overlap=True)),
        (
            "device watershed + overlap",
            dict(
                cfg=dataclasses.replace(
                    base,
                    watershed=dataclasses.replace(base.watershed, backend="device"),
                ),
                overlap=True,
            ),
        ),
    ]

    mvx = shape[0] * shape[1] * shape[2] / 1e6
    results = {}
    for name, kw in variants:
        best = None
        for rep in range(3):
            work = tempfile.mkdtemp(prefix="hcunet_probe_")
            try:
                t0 = time.perf_counter()
                res = analyze(
                    volume=vol, unet_apply=unet_apply, detector=det,
                    detector_variables=det_vars, work_dir=work,
                    fit_cochlea=False, **kw,
                )
                dt = time.perf_counter() - t0
            finally:
                shutil.rmtree(work, ignore_errors=True)
            acc = sum(res.stage_seconds.values())
            line = (
                f"{name:30s} rep{rep}: wall {dt:6.2f}s  {mvx/dt:5.3f} MVx/s  "
                f"stages {dict((k, round(v, 2)) for k, v in res.stage_seconds.items())}"
                f"  unaccounted {dt - acc:5.2f}s  cells {len(res.cells)}"
            )
            print(line, flush=True)
            if best is None or dt < best:
                best = dt
        results[name] = best

    print()
    for name, dt in results.items():
        print(f"{name:30s} best {dt:6.2f}s  {mvx/dt:5.3f} MVx/s")


if __name__ == "__main__":
    main()
