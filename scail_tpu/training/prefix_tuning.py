"""Prefix tuning (P-Tuning v2) — reference:
sat/model/finetune/prompt_tuning.py:21-46 PrefixTuningMixin: a learned
per-layer KV prefix of `prefix_len` positions, concatenated onto every
attention's keys/values and always visible in the mask.  The zoo models
(zoo/gpt.py, zoo/llama.py) take the prefix tree as an explicit forward
argument; training freezes the base params and optimizes only the prefix
(the functional analogue of SAT's requires_grad surgery).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def init_prefix_params(key, num_layers: int, num_kv_heads: int,
                       prefix_len: int, head_dim: int):
    """(L, 2, n_kv, P, hd) * 0.01, mirroring prompt_tuning.py:23-26."""
    return 0.01 * jax.random.normal(
        key, (num_layers, 2, num_kv_heads, prefix_len, head_dim), jnp.float32)


def prefix_only_optimizer(tx):
    """Wrap an optax transform so ONLY the prefix leaf trains when the
    param tree is {'base': ..., 'prefix': ...} (base params frozen, the
    reference's disable-all-but-mixin requires_grad pattern)."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        param_labels=lambda tree: jax.tree.map_with_path(
            lambda path, _: "train" if any(
                getattr(p, "key", None) == "prefix" for p in path
            ) else "freeze", tree),
    )
