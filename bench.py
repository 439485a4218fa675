"""Headline benchmark — thin wrapper; implementation lives in
hcunet_tpu.benchmarks so the installed `hcunet bench` subcommand works from
any directory."""

from hcunet_tpu.benchmarks import main

if __name__ == "__main__":
    main()
