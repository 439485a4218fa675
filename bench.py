"""Headline benchmark — thin wrapper; implementation lives in
hcunet_tpu.benchmarks so the installed `hcunet bench` subcommand works from
any directory.  ``--pipeline`` benchmarks the full analyze() instead."""

import sys

from hcunet_tpu.benchmarks import main, pipeline_main

if __name__ == "__main__":
    if "--pipeline" in sys.argv:
        pipeline_main()
    else:
        main()
