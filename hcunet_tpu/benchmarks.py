"""Headline benchmark: tiled 3D U-Net whole-volume inference throughput.

Mirrors the reference's hot loop #1 (``hcat/segment.py:21-136``) on the same
workload the baseline was measured on: a synthetic (600, 600, 15) 4-channel
volume through the production 3D anisotropic U-Net with the reference's
CPU-fallback tile geometry (EVAL [300,300,15], PAD (128,128,10)).

Baseline (BASELINE.md): the PyTorch reference on this machine's CPU does
5.4 MVx in 557.4 s = 0.00969 MVx/s (measured by
``scripts/measure_torch_baseline.py``; the reference publishes no numbers).

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
By default BOTH the tiled headline AND the end-to-end ``analyze()`` pipeline
metric are emitted (two lines), so both figures are driver-verified.
``--pipeline`` emits only the pipeline line, ``--headline`` only the tiled
line.

The pipeline bench is the full ``analyze()`` — detection + segmentation +
instance watershed + analytics (``hcat/main.py:20-236``) on a synthetic
multi-chunk cell scene, against a torch-CPU estimate composed from the
measured stage baselines (unet 0.00969 MVx/s + detection 127.1 s per
512² z-slice; the reference's watershed time is excluded, favoring it).

Backend resilience (VERDICT r3 #4): the remote axon TPU tunnel flakes, and
``jax.devices()`` can HANG >300 s when it is down — so before touching the
backend in-process, a subprocess probe (killable on timeout) checks it,
retrying with backoff.  On persistent unavailability the bench emits one
classified JSON line per requested metric
(``{"metric": ..., "error": "backend_unavailable"}``) and exits 0, so a
tunnel outage is recorded as a classified result instead of a traceback.
"""

import json
import os
import subprocess
import sys
import time

TORCH_CPU_BASELINE_MVX_S = 5.4 / 557.39  # scripts/measure_torch_baseline.py
TORCH_CPU_DET_S_PER_PX = 127.12 / 512**2  # scripts/measure_detection_baseline.py

_BACKEND_ERR_MARKS = (
    "UNAVAILABLE", "DEADLINE_EXCEEDED", "Unable to initialize backend",
    "failed to connect", "Socket closed", "Connection reset",
)


def _is_backend_error(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return any(m.lower() in msg.lower() for m in _BACKEND_ERR_MARKS)


def _probe_backend_once(timeout_s: float) -> bool:
    """Check the accelerator backend in a KILLABLE subprocess (an in-process
    ``jax.devices()`` hangs indefinitely when the tunnel is down)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); import sys; sys.exit(0 if d else 1)"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def backend_available(attempts: int = 3, timeout_s: float = 150.0) -> bool:
    """Probe with backoff: ~3 tries over a few minutes rides out a transient
    tunnel flake; a hard outage fails fast enough for the driver."""
    for i in range(attempts):
        if _probe_backend_once(timeout_s):
            return True
        if i < attempts - 1:
            delay = 30.0 * (i + 1)
            print(
                f"# backend probe {i + 1}/{attempts} failed; "
                f"retrying in {delay:.0f}s",
                file=sys.stderr, flush=True,
            )
            time.sleep(delay)
    return False


def _emit_unavailable(metric: str, detail: str = "") -> None:
    line = {"metric": metric, "error": "backend_unavailable"}
    if detail:
        line["detail"] = detail[:300]
    print(json.dumps(line), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from hcunet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hcunet_tpu.config import TileConfig, UNetConfig
    from hcunet_tpu.infer.tiling import predict_segmentation_mask
    from hcunet_tpu.models.unet import init_unet

    # Whole-cochlea scale (the reference's production images are multi-GVx;
    # 2304^2 x 15 = 79.6 MVx amortizes the remote-dispatch latency).
    shape = (2304, 2304, 15)
    cfg = UNetConfig.production_3d()
    model, variables = init_unet(
        cfg, jax.random.PRNGKey(0), input_spatial=(140, 140, 10),
        dtype=jnp.bfloat16,
    )
    if "--plain" in sys.argv:
        apply_fn = jax.tree_util.Partial(
            lambda v, t: model.apply(v, t, train=False), variables
        )
    else:
        # production serving path: BN-folded, z-block lane-packed forward
        # (infer/compile.py) — numerically parity-tested vs model.apply
        from hcunet_tpu.infer.compile import compile_serving_apply

        apply_fn = jax.tree_util.Partial(
            compile_serving_apply(model, variables, dtype=jnp.bfloat16)
        )
    # Geometry from the HBM auto-tuner (derives the halo from the network's
    # measured shrink and sizes batch/tile to HBM); on a 16 GB v5e it picks
    # eval (384,384,15), pad (56,56,4), batch 6 — see BASELINE.md.
    from hcunet_tpu.config import auto_tile_config

    tile_cfg = auto_tile_config(cfg)

    key = jax.random.PRNGKey(1)
    vol = jax.random.uniform(key, (1, *shape, 4), jnp.float32)
    vol = jax.device_put(vol)

    def run():
        out = predict_segmentation_mask(
            apply_fn, vol, cfg, tile_cfg, use_probability_map=True
        )
        # On the remote-attached TPU, block_until_ready returns at dispatch;
        # a scalar device->host transfer is the only honest sync.
        return float(out.sum())

    run()  # compile + warm up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mvx = shape[0] * shape[1] * shape[2] / 1e6
    value = mvx / dt
    print(
        json.dumps(
            {
                "metric": "tiled_unet3d_inference",
                "value": round(value, 3),
                "unit": "MVx/s",
                "vs_baseline": round(value / TORCH_CPU_BASELINE_MVX_S, 1),
            }
        )
    )


def _blob_scene(X, Y, Z, n_cells, seed=0):
    """Deterministic 4-channel volume of gaussian-blob cells (+ truth map)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    prob = np.zeros((X, Y, Z), np.float32)
    r = 18
    zz = (np.arange(Z) - Z // 2).astype(np.float32) ** 2 / 12.0
    for _ in range(n_cells):
        x0 = int(rng.uniform(r, X - r))
        y0 = int(rng.uniform(r, Y - r))
        xs, ys = slice(x0 - r, x0 + r), slice(y0 - r, y0 + r)
        gx = (np.arange(x0 - r, x0 + r) - x0).astype(np.float32) ** 2
        gy = (np.arange(y0 - r, y0 + r) - y0).astype(np.float32) ** 2
        g = np.exp(
            -(gx[:, None, None] + gy[None, :, None]) / 90.0 - zz[None, None, :]
        )
        prob[xs, ys] = np.maximum(prob[xs, ys], g)
    vol = np.stack(
        [prob * s for s in (0.9, 1.0, 0.95, 0.9)], axis=-1
    ) + rng.normal(0, 0.01, (X, Y, Z, 4)).astype(np.float32)
    # uint16, like the production confocal TIFFs — the pipeline ships
    # integer stacks across the device tunnel at native width
    vol16 = (vol.clip(0, 1) * 65535.0 + 0.5).astype(np.uint16)
    return vol16, prob


def _fit_unet_to_scene(model, variables, vol, truth, steps=40):
    """A few train steps so the probability landscape is production-like.

    A random-weight net emits near-flat noise — the watershed's worst case
    (10x its realistic cost) — which would make the pipeline number
    meaningless.  Real deployments run trained checkpoints.

    The fitted weights are cached on disk keyed by (scene, steps, seed) so
    repeated bench runs time the IDENTICAL model — run-to-run variance then
    reflects the pipeline alone, not the fit (VERDICT r2 weak #7)."""
    import hashlib

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from hcunet_tpu.train.losses import cross_entropy
    from hcunet_tpu.utils.cache import enable_compilation_cache

    cache_root = enable_compilation_cache()
    fit_cache = None
    if cache_root is not None:
        from hcunet_tpu.config import config_to_dict

        # key includes the model config and a sample of the INIT variables:
        # a config/init change with unchanged tensor shapes must invalidate
        # the cached fit, not silently reuse another model's weights
        h = hashlib.sha1(
            np.ascontiguousarray(vol[::97].ravel()[::397]).tobytes()
            + str((vol.shape, steps)).encode()
            + str(config_to_dict(model.config)).encode()
        )
        for leaf in jax.tree_util.tree_leaves(variables):
            h.update(np.asarray(leaf, np.float32).ravel()[::53].tobytes())
        key = h.hexdigest()[:16]
        fit_cache = os.path.join(
            os.path.dirname(cache_root), f"bench_fit_{key}.msgpack"
        )
        if os.path.exists(fit_cache):
            with open(fit_cache, "rb") as f:
                return serialization.from_bytes(
                    jax.tree.map(np.asarray, variables), f.read()
                )

    from hcunet_tpu.data.transforms import integer_unit_scale

    volf = (
        vol.astype(np.float32) / integer_unit_scale(vol.dtype)
        if np.issubdtype(vol.dtype, np.integer) else vol
    )
    x = jnp.asarray(((volf[:256, :256] - 0.5) / 0.5)[None], jnp.float32)
    y = jnp.asarray((truth[:256, :256] > 0.3)[None, ..., None].astype(np.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy(out, y, method="pixel"), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    for _ in range(steps):
        params, batch_stats, opt_state, _loss = step(
            params, batch_stats, opt_state
        )
    fitted = {"params": params, "batch_stats": batch_stats}
    if fit_cache is not None:
        with open(fit_cache, "wb") as f:
            f.write(serialization.to_bytes(jax.tree.map(np.asarray, fitted)))
    return fitted


TORCH_CPU_RUNET_MVX_S = 0.0118  # scripts/measure_recurrent_baseline.py


def recurrent_main():
    """Recurrent-family serving metric: RecursiveUNet (10 timesteps) at
    B=1 on 256²x10 through the packed compiler with split-X halo-exchange
    batching — the reference's single-volume r_unet usage pattern
    (``hcat/r_unet.py:135-160``)."""
    import jax
    import jax.numpy as jnp

    from hcunet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hcunet_tpu.config import RUNetConfig
    from hcunet_tpu.infer.compile_recurrent import compile_recurrent_apply
    from hcunet_tpu.models.runet import RecursiveUNet

    cfg = RUNetConfig(timesteps=10)
    model = RecursiveUNet(cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (1, 256, 256, 10, cfg.in_channels), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(1), x[:, :32, :32], train=False)
    apply_fn = jax.jit(
        compile_recurrent_apply(
            model, variables, dtype=jnp.bfloat16, split_x=4
        )
    )

    float(jnp.sum(apply_fn(x)))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(apply_fn(x)))
        times.append(time.perf_counter() - t0)
    value = 256 * 256 * 10 / 1e6 / min(times)
    print(
        json.dumps(
            {
                "metric": "recurrent_packed_serving",
                "value": round(value, 3),
                "unit": "MVx/s",
                "vs_baseline": round(value / TORCH_CPU_RUNET_MVX_S, 1),
            }
        )
    )


def pipeline_main():
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from hcunet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hcunet_tpu.config import PipelineConfig, UNetConfig, auto_tile_config
    from hcunet_tpu.infer.compile import compile_serving_apply
    from hcunet_tpu.infer.pipeline import analyze
    from hcunet_tpu.models.detection import Detector
    from hcunet_tpu.models.unet import init_unet

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

    # 2 B/voxel device→host transfer is the measured throughput lever
    # (BASELINE.md r3/r4); the library default is exact float32, the bench
    # opts into the production-throughput configuration explicitly.
    # uint16 fixed-point has the same bytes as round 3's bf16 but ~260×
    # finer quantization (max error prob_scale/131070).
    pcfg = PipelineConfig(
        numchunks=3, unet=ucfg, tiles=auto_tile_config(ucfg),
        prob_transfer_dtype="uint16",
    )

    def run():
        work = tempfile.mkdtemp(prefix="hcunet_bench_")
        try:
            t0 = time.perf_counter()
            res = analyze(
                volume=vol, unet_apply=unet_apply, detector=det,
                detector_variables=det_vars, cfg=pcfg, work_dir=work,
                fit_cochlea=False,
            )
            return time.perf_counter() - t0, res.stage_seconds, res.stage_bytes
        finally:
            shutil.rmtree(work, ignore_errors=True)

    run()  # compile + warm
    # best-of-3 like the other metrics: the remote tunnel's bandwidth
    # jitters run-to-run by ±25% (BASELINE.md link characterization), so a
    # single timed rep confounds code changes with link weather
    dt, stages, xfer = min((run() for _ in range(3)), key=lambda r: r[0])
    vox = shape[0] * shape[1] * shape[2]
    mvx = vox / 1e6
    # composed torch-CPU reference estimate for the same volume (unet tiling
    # + per-z-plane detection; its watershed is excluded in its favor)
    ref_s = mvx / TORCH_CPU_BASELINE_MVX_S + (
        shape[0] * shape[1] * shape[2] * TORCH_CPU_DET_S_PER_PX
    )
    value = mvx / dt
    print(
        json.dumps(
            {
                "metric": "analyze_pipeline_end_to_end",
                "value": round(value, 3),
                "unit": "MVx/s",
                "vs_baseline": round(value / (mvx / ref_s), 1),
                "stage_seconds": {k: round(v, 2) for k, v in stages.items()},
                "transfer_mb": {
                    k: round(v / 1e6, 1) for k, v in (xfer or {}).items()
                },
            }
        )
    )


def run(argv=None) -> int:
    """Entry point used by bench.py and ``hcunet bench``.

    Emits one JSON line per requested metric; backend outages produce
    classified ``backend_unavailable`` lines and exit 0 (VERDICT r3 #4)."""
    argv = sys.argv[1:] if argv is None else list(argv)
    # selector flags compose: ``--headline --recurrent`` emits both metrics
    # (review r4 #7 — the old elif chain silently dropped all but the first)
    selectors = (
        ("--headline", "tiled_unet3d_inference", main),
        ("--plain", "tiled_unet3d_inference", main),
        ("--pipeline", "analyze_pipeline_end_to_end", pipeline_main),
        ("--recurrent", "recurrent_packed_serving", recurrent_main),
    )
    jobs = []
    for flag, metric, fn in selectors:
        if flag in argv and all(m != metric for m, _ in jobs):
            jobs.append((metric, fn))
    if not jobs:
        jobs = [
            ("tiled_unet3d_inference", main),
            ("analyze_pipeline_end_to_end", pipeline_main),
            ("recurrent_packed_serving", recurrent_main),
        ]
    if not backend_available():
        for metric, _fn in jobs:
            _emit_unavailable(metric, "probe: jax.devices() unreachable")
        return 0
    dead = None
    for metric, fn in jobs:
        if dead is not None:
            # the in-process jax client stays wedged after an UNAVAILABLE
            # (device ops hang >300s on this rig) — classify the remaining
            # metrics instead of touching the dead backend (review r4 #3)
            _emit_unavailable(metric, dead)
            continue
        try:
            fn()
        except Exception as e:  # classify tunnel deaths mid-run; re-raise bugs
            if _is_backend_error(e):
                _emit_unavailable(metric, f"{type(e).__name__}: {e}")
                dead = f"backend died during an earlier metric ({metric})"
            else:
                raise
    return 0


if __name__ == "__main__":
    sys.exit(run())
