"""Ulysses sequence-parallel attention
(reference: sat/mpu/ulysses_attn_layer.py:41-110, sat/mpu/all_to_all.py:15-141).

The reference's head<->sequence reshard around full-sequence SDPA maps to a
`shard_map` region with two `lax.all_to_all` collectives over the 'seq'
mesh axis (they ride ICI):

  tokens sharded (b, S/P, n, d)
    --all_to_all(split heads, concat seq)-->  (b, S, n/P, d)
    --full-sequence flash attention (local heads)-->
    --all_to_all(split seq, concat heads)-->  (b, S/P, n, d)

Heads may additionally be sharded over 'model' (tensor parallel); the
region shards over both axes but only communicates over 'seq'.  GQA head
expansion (all_to_all.py:73-77) is unnecessary: SCAIL uses no multi-query
heads.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import PartitionSpec as P

from scail_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS


def ulysses_attention(q, k, v, mesh, *, scale=None, impl: str = "auto",
                      attn_fn=None, platform: str = None):
    """q/k/v: logically-global (b, S, n, d); returns (b, S, n, d).

    Must be called under jit with `mesh`; the all_to_all happens on the
    'seq' axis only.  Requires n % (seq * model) == 0 and S % seq == 0.
    `attn_fn(q, k, v) -> o` overrides the local full-sequence attention
    (e.g. sliding-tile attention after the head scatter -- each shard
    then holds the full sequence for its head subset).
    """
    from scail_tpu.ops.attention import attention

    if attn_fn is None:
        # platform: 'auto' must resolve against the MESH's target (AOT
        # lowering runs with a CPU default backend) — see resolve_impl
        platform = platform or mesh.devices.flat[0].platform
        attn_fn = lambda a, b, c: attention(a, b, c, scale=scale, impl=impl,
                                            platform=platform)
    seq = mesh.shape[SEQ_AXIS]
    if seq == 1:
        return attn_fn(q, k, v)

    n = q.shape[2]
    assert n % (seq * mesh.shape[MODEL_AXIS]) == 0, (
        f"heads {n} not divisible by seq*model shards")

    spec = P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def region(ql, kl, vl):
        # local: (b/dp, S/sp, n/mp, d) -> heads scatter / seq gather
        ql = jax.lax.all_to_all(ql, SEQ_AXIS, split_axis=2, concat_axis=1, tiled=True)
        kl = jax.lax.all_to_all(kl, SEQ_AXIS, split_axis=2, concat_axis=1, tiled=True)
        vl = jax.lax.all_to_all(vl, SEQ_AXIS, split_axis=2, concat_axis=1, tiled=True)
        ol = attn_fn(ql, kl, vl)
        return jax.lax.all_to_all(ol, SEQ_AXIS, split_axis=1, concat_axis=2, tiled=True)

    return region(q, k, v)
