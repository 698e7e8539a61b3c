"""Ring attention: sequence-parallel attention with a ppermute KV ring.

The reference has NO ring attention (SURVEY §2.5: Ulysses + spatial
chunking instead; sat/mpu/initialize.py:143 scopes out anything further).
This is the beyond-reference TPU-native long-sequence alternative the
survey's TPU mapping calls out (§5.7): keep queries resident, rotate the
K/V shards around the 'seq' mesh axis with `lax.ppermute` (rides ICI),
and merge the per-chunk partial attentions with the same online-softmax
recurrence the flash kernel uses across its KV tiles — here across ring
steps, in f32.

Where it beats Ulysses: Ulysses shards HEADS after its all_to_all, so it
cannot scale past n_heads/model_parallel ranks and moves the whole QKV
twice; the ring moves only K/V, one shard per step, overlapping each hop
with the local attention block, and scales to any number of ranks
regardless of head count.  For SCAIL's 40-head DiT on ≤8-way SP, Ulysses
stays the production default (fewer, larger collectives); the ring is the
escape hatch for extreme sequence lengths or head-limited meshes.

Math per ring step (one KV chunk c):
  s      = (q·scale) @ k_cᵀ                      (b, n, sq, skv)  f32
  m_new  = max(m, rowmax(s))
  corr   = exp(m − m_new)
  l      = l·corr + rowsum(exp(s − m_new))
  acc    = acc·corr + exp(s − m_new) @ v_c
final: out = acc / l — identical to dense softmax(q kᵀ) v for any chunk
order, which is why the ring direction is irrelevant for the DiT's
bidirectional attention.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scail_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS


def ring_attention(q, k, v, mesh, *, scale: float = None):
    """q/k/v: logically-global (b, S, n, d) sharded over 'seq' (and heads
    optionally over 'model'); returns (b, S, n, d) with q's sharding.

    Must be called under jit with `mesh`.  Communicates ONLY over the
    'seq' axis: 2 ppermutes (k and v) per ring step, P steps.  Requires
    S % seq_shards == 0; no head-count constraint (unlike Ulysses).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    n_ring = mesh.shape[SEQ_AXIS]
    if n_ring == 1:
        from scail_tpu.ops.attention import attention

        return attention(q, k, v, scale=scale)

    spec = P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    @partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
             out_specs=spec, check_vma=False)
    def region(ql, kl, vl):
        b, sq, n, dd = ql.shape
        qf = ql.astype(jnp.float32) * scale

        def step(_, carry):
            kc, vc, m, l, acc = carry
            s = jnp.einsum("bqnd,bknd->bnqk", qf, kc.astype(jnp.float32))
            m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + p.sum(axis=-1, keepdims=True)
            acc = acc * corr + jnp.einsum(
                "bnqk,bknd->bnqd", p, vc.astype(jnp.float32))
            # rotate the KV shard to the next rank; the hop overlaps the
            # next step's einsums (XLA schedules ppermute async on ICI).
            # The final rotation (step P-1) returns k/v to their origin —
            # one redundant hop, kept so the loop body stays uniform
            # (a lax.cond around a collective would force it sync).
            kc = jax.lax.ppermute(kc, SEQ_AXIS, perm)
            vc = jax.lax.ppermute(vc, SEQ_AXIS, perm)
            return kc, vc, m_new, l, acc

        m0 = jnp.full((b, n, sq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, n, sq, 1), jnp.float32)
        a0 = jnp.zeros((b, n, sq, dd), jnp.float32)
        *_, m, l, acc = jax.lax.fori_loop(
            0, n_ring, step, (kl, vl, m0, l0, a0))
        out = (acc / l).transpose(0, 2, 1, 3)  # (b, sq, n, d)
        return out.astype(ql.dtype)

    return region(q, k, v)
