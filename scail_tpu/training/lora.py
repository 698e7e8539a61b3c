"""LoRA finetuning (reference: sat/model/finetune/lora2.py).

`replace_linear_with_lora` (lora2.py:137-170) becomes a pytree transform:
`add_lora(params, targets, rank)` injects ('lora_a','lora_b','lora_scale')
into matching dense param dicts -- models/common.dense applies the delta
automatically.  `merge_lora` folds the delta into the kernel (LoraMixin
merge, lora2.py:174-260).  For training, `lora_mask` freezes everything but
the LoRA factors (optax.masked), matching the reference's lr_scale=0 scheme
(diffusion_video.py:182-189).
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = (
    r"layers/(qkv|attn_out|cross_q|cross_kv|cross_out|mlp_in|mlp_out)$",
)


def _walk(params, path=()):
    if isinstance(params, dict) and "kernel" in params:
        yield path, params
        return
    if isinstance(params, dict):
        for k, v in params.items():
            yield from _walk(v, path + (k,))


def add_lora(params, key, *, rank: int = 16, alpha: float = None,
             targets: Sequence[str] = DEFAULT_TARGETS):
    """Return a copy of `params` with LoRA factors injected into every dense
    whose '/'-joined path matches a target regex.  A ~ N(0, 0.01), B = 0
    (lora2.py init), scale = alpha/rank (alpha defaults to rank)."""
    pats = [re.compile(p) for p in targets]
    alpha = alpha if alpha is not None else rank
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy

    def visit(node, path):
        if isinstance(node, dict) and "kernel" in node:
            pstr = "/".join(path)
            if any(p.search(pstr) for p in pats):
                k = node["kernel"]
                prefix = k.shape[:-2]  # stacked-layer leading dims
                din, dout = k.shape[-2], k.shape[-1]
                ka = jax.random.fold_in(key, hash(pstr) % (2 ** 31))
                node = dict(node)
                node["lora_a"] = 0.01 * jax.random.normal(
                    ka, (*prefix, din, rank), jnp.float32)
                node["lora_b"] = jnp.zeros((*prefix, rank, dout), jnp.float32)
                # carries the stacked-layer leading dims so lax.scan over
                # layers can slice it like every other layer param
                node["lora_scale"] = jnp.full(prefix, alpha / rank, jnp.float32)
            return node
        if isinstance(node, dict):
            return {k: visit(v, path + (k,)) for k, v in node.items()}
        return node

    return visit(out, ())


def merge_lora(params):
    """Fold deltas into kernels and strip LoRA leaves (lora merge)."""

    def visit(node):
        if isinstance(node, dict) and "lora_a" in node:
            node = dict(node)
            delta = jnp.einsum("...ir,...ro->...io", node["lora_a"], node["lora_b"])
            scale = node["lora_scale"]
            if scale.ndim:
                scale = scale[..., None, None]
            node["kernel"] = node["kernel"] + scale * delta
            for k in ("lora_a", "lora_b", "lora_scale"):
                node.pop(k)
            return node
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        return node

    return visit(params)


def lora_mask(params):
    """Boolean pytree: True only on LoRA leaves (for optax.masked)."""

    def visit(node, name=None):
        if isinstance(node, dict):
            return {k: visit(v, k) for k, v in node.items()}
        return name in ("lora_a", "lora_b")

    return visit(params)
