"""Replica-consistency checks
(reference: sat/training/deepspeed_training.py:218-296 `check_param_sync` /
`sync_params_across_ranks`, sgm/util.py:95-122 `check_value_sync`).

Under JAX SPMD a replicated parameter is one logical array -- per-device
drift cannot arise from the runtime itself.  These checks still guard
against host-side mistakes (manual device_puts, donation bugs, loading
divergent shards) and serve as the observability surface the reference's
trainer exposes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np


def check_value_sync(x, name: str = "tensor", atol: float = 0.0) -> float:
    """Max abs difference between device copies holding the same logical
    index (sgm/util.py:95-122).  Returns the max drift; raises on > atol."""
    by_index: Dict[Tuple, list] = {}
    for shard in x.addressable_shards:
        by_index.setdefault(tuple(map(str, shard.index)), []).append(
            np.asarray(shard.data))
    drift = 0.0
    for copies in by_index.values():
        for other in copies[1:]:
            drift = max(drift, float(np.max(np.abs(copies[0] - other))))
    if drift > atol:
        raise AssertionError(f"{name}: replica drift {drift} > {atol}")
    return drift


def check_param_sync(params, atol: float = 0.0) -> float:
    """Max replica drift over every leaf (deepspeed_training.py:245-296)."""
    drift = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if hasattr(leaf, "addressable_shards"):
            drift = max(drift, check_value_sync(leaf, str(path), atol=atol))
    return drift


def sync_params_across_ranks(params):
    """Force re-replication by round-tripping through the sharding
    (deepspeed_training.py:218-243).  A no-op when already consistent."""
    return jax.tree.map(
        lambda p: jax.device_put(np.asarray(p), p.sharding)
        if hasattr(p, "sharding") else p,
        params,
    )
