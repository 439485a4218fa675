"""Production-scale proof: multi-gigavoxel analyze() + crash-resume.

VERDICT r2 next-step #7 — the reference's production driver loops whole
cochleae at numchunks=6 (``/root/reference/loop_main.py:18-72``).  This
runs a 6144²x20 uint16 synthetic cochlea (755 MVx, ~6 GB raw) through
``analyze()`` on the real TPU with the production chunking, records wall
time / throughput / peak host RSS, then demonstrates journal resumability
by SIGKILLing a fresh run mid-flight and re-running it to completion in
the same work_dir (chunks already spilled must be skipped).

Usage:
  python -u scripts/run_production_scale.py            # orchestrator
  python -u scripts/run_production_scale.py --worker DIR   # one analyze run
"""

import os
import re
import resource
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = tuple(
    int(v) for v in os.environ.get("HCUNET_PROD_SHAPE", "6144,6144,20").split(",")
)
N_CELLS = int(os.environ.get("HCUNET_PROD_CELLS", "2500"))
NUMCHUNKS = int(os.environ.get("HCUNET_PROD_CHUNKS", "6"))
# wall-time fallback for the mid-flight SIGKILL; the primary trigger is
# KILL_AFTER_CHUNKS completed chunks + a short delay into the next one
# (a blind wall timer can fire while the first chunk is still compiling,
# killing a run with zero chunks done — no resume to prove)
KILL_AFTER = float(os.environ.get("HCUNET_PROD_KILL_AFTER", "3600"))
KILL_AFTER_CHUNKS = int(os.environ.get("HCUNET_PROD_KILL_CHUNKS", "3"))
KILL_CHUNK_DELAY = float(os.environ.get("HCUNET_PROD_KILL_DELAY", "20"))


def _scene_cached(shape, n_cells):
    """The 6144^2 scene costs ~15 min to synthesize on a 1-cpu host; cache
    the arrays on disk so phase 2 / reruns skip it."""
    import numpy as np

    tag = f"{shape[0]}x{shape[1]}x{shape[2]}_{n_cells}"
    path = f"/tmp/hcunet_scene_{tag}.npz"
    if os.path.exists(path):
        t0 = time.perf_counter()
        with np.load(path) as z:
            vol, truth = z["vol"], z["truth"]
        print(f"scene loaded from cache in {time.perf_counter() - t0:.0f}s",
              flush=True)
        return vol, truth
    from hcunet_tpu.benchmarks import _blob_scene

    t0 = time.perf_counter()
    vol, truth = _blob_scene(*shape, n_cells=n_cells)
    print(f"scene built in {time.perf_counter() - t0:.0f}s "
          f"({vol.nbytes / 1e9:.1f} GB {vol.dtype})", flush=True)
    try:
        np.savez(path, vol=vol, truth=truth)
    except OSError:
        pass
    return vol, truth


def worker(work_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from hcunet_tpu.benchmarks import _fit_unet_to_scene
    from hcunet_tpu.config import PipelineConfig, UNetConfig, auto_tile_config
    from hcunet_tpu.infer.compile import compile_serving_apply
    from hcunet_tpu.infer.pipeline import analyze
    from hcunet_tpu.models.detection import Detector
    from hcunet_tpu.models.unet import init_unet
    from hcunet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    vol, truth = _scene_cached(SHAPE, N_CELLS)

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
    det_vars = det.init(jax.random.PRNGKey(1), (512, 512))
    cfg = PipelineConfig(
        numchunks=NUMCHUNKS, unet=ucfg, tiles=auto_tile_config(ucfg),
        # the d2h link is the production run's binding constraint (the
        # tunnel serializes h2d+d2h at 41.5/17.3 MB/s — BASELINE.md);
        # uint16 fixed-point halves prob_d2h at ≤7.6e-5 max error
        prob_transfer_dtype=os.environ.get("HCUNET_PROB_DTYPE", "uint16"),
    )
    print("starting analyze", flush=True)
    # HCUNET_PROD_OVERLAP=0 runs the host tails SEQUENTIALLY — the
    # cleanly-attributable stage-seconds mode (VERDICT r4 #8); unset keeps
    # the production default (overlapped tail workers)
    overlap_env = os.environ.get("HCUNET_PROD_OVERLAP")
    t0 = time.perf_counter()
    res = analyze(
        volume=vol, unet_apply=unet_apply, detector=det,
        detector_variables=det_vars, cfg=cfg, work_dir=work_dir,
        fit_cochlea=True,
        overlap=None if overlap_env is None else int(overlap_env),
    )
    dt = time.perf_counter() - t0
    mvx = SHAPE[0] * SHAPE[1] * SHAPE[2] / 1e6
    print(
        f"ANALYZE_DONE wall={dt:.1f}s mvx_s={mvx / dt:.3f} "
        f"cells={len(res.cells)} labels={int(res.unique_mask.max())} "
        f"stages={ {k: round(v, 1) for k, v in (res.stage_seconds or {}).items()} }",
        flush=True,
    )


def run_child(work_dir, kill_after=None):
    import threading

    cmd = [sys.executable, "-u", os.path.abspath(__file__), "--worker", work_dir]
    t0 = time.perf_counter()
    p = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = []
    state = {"killed": False}
    timer = None
    chunk_timer = None
    chunks_done = 0

    def _kill(why):
        print(f"  ** SIGKILL ({why})", flush=True)
        state["killed"] = True
        p.send_signal(signal.SIGKILL)

    # reader loop.  Primary kill trigger: KILL_AFTER_CHUNKS chunks complete,
    # then a short delay so the SIGKILL lands mid-way through the next
    # chunk's work (a genuinely partial journal).  The wall timer (armed at
    # "starting analyze") is only a fallback for hung runs.
    while True:
        line = p.stdout.readline()
        if not line:
            if p.poll() is not None:
                break
            continue
        lines.append(line.rstrip())
        if not re.search(r"WARNING|INFO.*axon", line):
            print("  |", line.rstrip(), flush=True)
        if "starting analyze" in line and kill_after is not None and timer is None:
            timer = threading.Timer(kill_after, _kill, args=("wall-time fallback",))
            timer.start()
        if kill_after is not None and re.search(r"done: \d+ cells", line):
            chunks_done += 1
            if chunks_done == KILL_AFTER_CHUNKS and chunk_timer is None:
                chunk_timer = threading.Timer(
                    KILL_CHUNK_DELAY, _kill,
                    args=(f"{KILL_CHUNK_DELAY:.0f}s after chunk "
                          f"{KILL_AFTER_CHUNKS} completed",),
                )
                chunk_timer.start()
    p.wait()
    for t in (timer, chunk_timer):
        if t is not None:
            t.cancel()
    killed = state["killed"]
    rss_gb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    return dict(
        wall=time.perf_counter() - t0, rc=p.returncode, killed=killed,
        out="\n".join(lines), rss_gb=rss_gb,
    )


def main():
    if "--worker" in sys.argv:
        worker(sys.argv[sys.argv.index("--worker") + 1])
        return
    work = "/tmp/hcunet_production_scale"
    import shutil

    if "--sequential-breakdown" in sys.argv:
        # one clean full run with overlap=0: every stage-seconds entry then
        # PARTITIONS wall time instead of bounding it (VERDICT r4 #8 /
        # what's-weak #4) — publish next to the pipelined numbers
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work, exist_ok=True)
        os.environ["HCUNET_PROD_OVERLAP"] = "0"
        print("=== sequential-mode breakdown run (overlap=0) ===", flush=True)
        r = run_child(work)
        m = re.search(r"ANALYZE_DONE wall=([\d.]+)s mvx_s=([\d.]+)", r["out"])
        assert r["rc"] == 0, "sequential run failed"
        if m:
            print(
                f"RESULT sequential analyze_wall={m.group(1)}s "
                f"mvx_s={m.group(2)}",
                flush=True,
            )
        return

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    print("=== phase 1: fresh run, SIGKILL mid-analyze ===", flush=True)
    r1 = run_child(work, kill_after=KILL_AFTER)
    done1 = len(re.findall(r"done: \d+ cells", r1["out"]))
    print(f"phase1: rc={r1['rc']} killed={r1['killed']} "
          f"chunks_done={done1} rss={r1['rss_gb']:.1f}GB", flush=True)

    print("=== phase 2: resume in same work_dir ===", flush=True)
    r2 = run_child(work)
    skipped = len(re.findall(r"cached — skipping", r2["out"]))
    m = re.search(r"ANALYZE_DONE wall=([\d.]+)s mvx_s=([\d.]+) cells=(\d+)",
                  r2["out"])
    print(
        f"phase2: rc={r2['rc']} resumed_chunks_skipped={skipped} "
        f"(expected ~{done1}) wall={r2['wall']:.0f}s rss={r2['rss_gb']:.1f}GB",
        flush=True,
    )
    if m:
        print(f"RESULT analyze_wall={m.group(1)}s mvx_s={m.group(2)} "
              f"cells={m.group(3)} chunks_skipped_on_resume={skipped}",
              flush=True)
    assert r1["killed"] and r1["rc"] != 0, "phase 1 should have been killed"
    assert r2["rc"] == 0, "resume run failed"
    assert skipped >= max(1, done1 - 1), "journal resume did not skip chunks"
    print("production-scale crash-resume: OK", flush=True)


if __name__ == "__main__":
    main()
