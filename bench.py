"""Headline benchmark — thin wrapper; implementation lives in
hcunet_tpu.benchmarks so the installed `hcunet bench` subcommand works from
any directory.  Emits one JSON line per metric (tiled headline + end-to-end
analyze() pipeline by default; ``--pipeline`` / ``--headline`` select one).
Backend outages emit classified ``backend_unavailable`` lines, exit 0."""

import sys

from hcunet_tpu.benchmarks import run

if __name__ == "__main__":
    sys.exit(run())
