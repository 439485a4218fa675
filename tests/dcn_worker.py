"""Worker process for the two-process DCN batch test (not pytest-collected).

Each worker joins a real ``jax.distributed`` runtime (CPU backend), derives
its shard from ``jax.process_index()`` via
:func:`hcunet_tpu.apps.batch.host_shard`, and runs the manifest batch
driver over a SHARED data root — the ``loop_main.py:18-72`` role scaled
over hosts (SURVEY §2.7 row 1).
"""

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]
    data_root = sys.argv[3]
    out_json = sys.argv[4]

    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2

    from hcunet_tpu.apps.batch import host_shard, run_batch

    shard = host_shard()
    assert shard == (jax.process_index(), 2), shard

    def analyze_fn(img_path: str, out_dir: str) -> None:
        with open(os.path.join(out_dir, f"analyzed_by_{pid}.txt"), "w") as f:
            f.write(img_path)

    results = run_batch(data_root, analyze_fn)
    with open(out_json, "w") as f:
        json.dump(
            {
                "shard": list(shard),
                "images": [os.path.basename(r["image"]) for r in results],
                "states": [r["state"] for r in results],
            },
            f,
        )


if __name__ == "__main__":
    main()
