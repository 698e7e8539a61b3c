"""Local mixture-of-experts MLP (mixtral-style top-k dispatch).

Reference: sat/model/transformer.py:257-297 registers per-expert
Column/RowParallel MLPs; sat/transformer_defaults.py:163-209 routes each
token to its top-k experts with a gather/index_add loop over experts.

TPU-native design: that token-gather loop is hostile to XLA (dynamic
shapes, scatter adds).  Instead every expert is evaluated as one batched
einsum over the stacked expert weights and the per-token routing weights
are folded in through a dense combine tensor — identical math (each
selected expert's full output, bias included, is scaled by its
renormalized routing weight and summed), static shapes, MXU-sized
matmuls.  Experts shard over the 'model' mesh axis (expert parallelism):
each device computes only its expert slices and XLA inserts the psum for
the combine contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scail_tpu.models.common import gelu_tanh


def moe_router(x, gate_kernel, top_k: int = 2):
    """Learned softmax router with top-k renormalization
    (transformer_defaults.py:148-159 / mixtral).

    x: (..., d); gate_kernel: (d, E).  Returns (weights (..., k),
    indices (..., k) int32).
    """
    logits = jnp.einsum("...d,de->...e", x, gate_kernel.astype(x.dtype))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    weights, idx = jax.lax.top_k(probs, top_k)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, idx


def moe_mlp(x, gate, w_in, w_out, *, top_k: int = 2, act=gelu_tanh,
            router=None, w_gate=None):
    """x: (b, s, d) -> (b, s, d).

    gate: {'kernel': (d, E)}
    w_in: {'kernel': (E, d, f), 'bias': (E, f)?}
    w_out: {'kernel': (E, f, d), 'bias': (E, d)?}
    w_gate: optional {'kernel': (E, d, f)} for gated experts
            (is_gated_mlp, transformer.py:286-296 / mixtral w1):
            h = act(x @ w_gate) * (x @ w_in)
    router: optional (weights, idx) override (testing / custom routing
            hook, the reference's `routing_forward` seam).
    """
    E = w_in["kernel"].shape[0]
    if router is None:
        weights, idx = moe_router(x, gate["kernel"], top_k)
    else:
        weights, idx = router
    # (b, s, E) combine tensor: routing weight where selected, else 0
    onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)        # (b, s, k, E)
    combine = jnp.einsum("bsk,bske->bse", weights.astype(jnp.float32), onehot)
    combine = combine.astype(x.dtype)

    h = jnp.einsum("bsd,edf->ebsf", x, w_in["kernel"].astype(x.dtype))
    if "bias" in w_in:
        h = h + w_in["bias"].astype(x.dtype)[:, None, None, :]
    if w_gate is not None:
        g = jnp.einsum("bsd,edf->ebsf", x, w_gate["kernel"].astype(x.dtype))
        h = act(g) * h
    else:
        h = act(h)
    y = jnp.einsum("ebsf,efd->ebsd", h, w_out["kernel"].astype(x.dtype))
    if "bias" in w_out:
        y = y + w_out["bias"].astype(x.dtype)[:, None, None, :]
    return jnp.einsum("ebsd,bse->bsd", y, combine)
