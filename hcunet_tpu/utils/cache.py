"""Persistent XLA compilation cache.

The remote-attached TPU toolchain compiles slowly (30 s for the packed
serving forward, 84 s for the detector, 200 s+ for large tiles), and the
reference-style workflow is many short processes over one model
(``loop_main.py``).  JAX's persistent compilation cache spans processes:
measured on v5e, a fresh process's serving compile drops 78.8 s → 28.2 s
with a warm cache.

Enabled automatically by the CLI, ``Segmenter`` and the benchmarks; set
``HCUNET_NO_CACHE=1`` to disable, ``HCUNET_CACHE_DIR`` to relocate.
"""

from __future__ import annotations

import os

_enabled_dir: str | None = None
_attempted = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache directory (idempotent).

    Returns the directory that is ACTUALLY enabled (every later call gets
    the same one, regardless of its own arguments — jax's cache dir is
    process-global), or None when disabled via ``HCUNET_NO_CACHE`` or when
    no candidate was writable.
    """
    global _enabled_dir, _attempted
    if os.environ.get("HCUNET_NO_CACHE"):
        return None
    explicit = cache_dir or os.environ.get("HCUNET_CACHE_DIR")
    if _attempted:
        # an explicit dir on a later call is honored (jax allows re-setting
        # the cache dir), not silently swallowed by the first caller's choice
        if explicit and explicit != _enabled_dir:
            try:
                os.makedirs(explicit, exist_ok=True)
                import jax

                jax.config.update("jax_compilation_cache_dir", explicit)
                _enabled_dir = explicit
            except OSError:
                import warnings

                warnings.warn(
                    f"requested compilation cache dir {explicit!r} is not "
                    f"writable; keeping {_enabled_dir!r}"
                )
        return _enabled_dir
    _attempted = True
    # Candidate order: explicit > repo-local .cache (source checkouts) >
    # ~/.cache/hcunet (pip installs, where site-packages may be read-only).
    candidates = [explicit] if explicit else [
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".cache", "jax",
        ),
        os.path.join(
            os.environ.get("XDG_CACHE_HOME")
            or os.path.join(os.path.expanduser("~"), ".cache"),
            "hcunet", "jax",
        ),
    ]
    for cand in candidates:
        try:
            os.makedirs(cand, exist_ok=True)
        except OSError:
            continue
        import jax

        jax.config.update("jax_compilation_cache_dir", cand)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled_dir = cand
        return cand
    # No writable location: run without a persistent cache rather than fail
    # Segmenter/CLI construction as a side effect.
    return None
