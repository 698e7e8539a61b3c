"""Vocab-parallel cross entropy (reference: sat/mpu/cross_entropy.py —
the Megatron autograd function over vocab-sharded logits).

TPU-native version: logits stay sharded over the vocab dimension on the
'model' mesh axis; the stable log-sum-exp and the target-logit gather are
computed with psum/pmax inside shard_map, so the full (b, s, V) logits
tensor is never materialized on one device.  Differentiable (the
collectives transpose automatically under jax.grad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from scail_tpu.parallel.mesh import MODEL_AXIS


def vocab_parallel_cross_entropy(logits, targets, mesh, axis: str = MODEL_AXIS):
    """logits: (..., V) with V sharded over `axis`; targets: (...) int32
    GLOBAL vocab ids.  Returns per-token negative log-likelihood (...)."""

    def f(logits_local, targets):
        v_local = logits_local.shape[-1]
        rank = jax.lax.axis_index(axis)
        lo = rank * v_local

        # the max shift is gradient-neutral in logsumexp; pmax has no
        # differentiation rule, so detach it explicitly
        m = jax.lax.pmax(
            jax.lax.stop_gradient(jnp.max(logits_local, axis=-1)), axis)
        z = jax.lax.psum(
            jnp.sum(jnp.exp(logits_local - m[..., None]), axis=-1), axis)

        in_shard = (targets >= lo) & (targets < lo + v_local)
        idx = jnp.clip(targets - lo, 0, v_local - 1)
        tl = jnp.take_along_axis(logits_local, idx[..., None], axis=-1)[..., 0]
        tl = jax.lax.psum(jnp.where(in_shard, tl, 0.0), axis)
        return m + jnp.log(z) - tl

    nd = logits.ndim
    in_logits = P(*([None] * (nd - 1) + [axis]))
    in_tgt = P(*([None] * (nd - 1)))
    return shard_map(f, mesh=mesh, in_specs=(in_logits, in_tgt),
                     out_specs=in_tgt)(logits, targets)
