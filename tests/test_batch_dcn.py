"""Two-process DCN execution of the batch driver (VERDICT r4 #3).

SURVEY §2.7 row 1 promises the ``loop_main.py`` role — data parallelism
over whole images — scaled across hosts.  ``apps/batch.py`` derives each
host's shard from the ``jax.distributed`` runtime; until round 5 that path
was only exercised with env-var fakes.  This test launches TWO real
processes, each with ``jax.distributed.initialize`` (CPU backend, the same
runtime a DCN-connected pod uses), runs ``run_batch`` over one shared data
root, and asserts disjoint manifests with full coverage.
"""

import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "dcn_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_batch(tmp_path):
    data_root = tmp_path / "study"
    data_root.mkdir()
    names = [f"im{i}.tif" for i in range(5)]
    for n in names:
        (data_root / n).write_bytes(b"x")  # run_batch only globs paths

    coordinator = f"localhost:{_free_port()}"
    outs = [tmp_path / f"result_{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), coordinator, str(data_root),
             str(outs[i])],
        )
        for i in range(2)
    ]
    for p in procs:
        assert p.wait(timeout=180) == 0

    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    shards = sorted(tuple(r["shard"]) for r in results)
    assert shards == [(0, 2), (1, 2)]  # derived from jax.process_index()

    sets = [set(r["images"]) for r in results]
    assert sets[0].isdisjoint(sets[1])  # disjoint manifests
    assert sets[0] | sets[1] == set(names)  # full coverage
    # the static interleave run_batch documents: images[idx::count]
    by_shard = {tuple(r["shard"]): r["images"] for r in results}
    assert by_shard[(0, 2)] == sorted(names)[0::2]
    assert by_shard[(1, 2)] == sorted(names)[1::2]
    assert all(s == "done" for r in results for s in r["states"])

    # every image analyzed by exactly the host that owns its shard slot
    for i, n in enumerate(sorted(names)):
        out_dir = data_root / f"{os.path.splitext(n)[0]}_cellBycell"
        owner = i % 2
        assert (out_dir / f"analyzed_by_{owner}.txt").exists()
        assert not (out_dir / f"analyzed_by_{1 - owner}.txt").exists()
        with open(out_dir / "analysis_manifest.json") as f:
            assert json.load(f)["state"] == "done"
