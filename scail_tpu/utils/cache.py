"""Persistent XLA compilation cache.

The 1.3B/14B jits take minutes to compile (more through tunneled backends);
the on-disk cache makes re-runs near-instant.  Called by the CLIs, bench,
and the driver entry points; respects an existing user configuration.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = None):
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured via env
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "scail_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
