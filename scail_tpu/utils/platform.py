"""Force a jax platform BEFORE the first backend touch.

This image's sitecustomize pins JAX_PLATFORMS (e.g. to the axon TPU
tunnel), so the environment variable alone is ignored — both the env var
AND jax.config must be set before jax initializes (the same dance
tests/conftest.py and cli/arguments.py do).  The TPU tunnel is also
EXCLUSIVE: a second process targeting it blocks in a sleep-retry loop,
so CPU-side tools (eval extractors in smoke mode, converters) must
actively opt out rather than rely on the env.
"""

from __future__ import annotations

import os


def force_platform(name: str | None) -> None:
    """name: 'cpu' | 'tpu' | None (leave the default)."""
    if not name:
        return
    os.environ["JAX_PLATFORMS"] = name
    import jax

    jax.config.update("jax_platforms", name)
