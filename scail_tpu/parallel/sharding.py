"""Parameter/activation sharding rules.

Replaces the reference's hand-written Megatron TP layers
(sat/mpu/layers.py:70-485) and autograd collectives (sat/mpu/mappings.py):
on TPU we annotate parameter and activation shardings and let XLA SPMD
insert the all-gather/reduce-scatter/all-reduce.  Column-parallel ==
output-dim sharded over 'model'; row-parallel == input-dim sharded over
'model' (XLA emits the reduce the RowParallelLinear forward did).
"""

from __future__ import annotations

import os
import re
from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class PathRules:
    """Ordered (regex -> PartitionSpec) rules over '/'-joined pytree paths.

    First match wins; no match => fully replicated.
    """

    def __init__(self, rules: List[Tuple[str, P]]):
        self.rules = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(self, path: str, ndim: int) -> P:
        for pat, spec in self.rules:
            if pat.search(path):
                if len(spec) > ndim:
                    raise ValueError(
                        f"rule {pat.pattern} spec {spec} has more dims than value ({ndim}) at {path}"
                    )
                return spec
        return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def specs_for_tree(tree, rules: PathRules):
    """PartitionSpec pytree matching `tree` via path rules."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: rules.spec_for(_path_str(path), v.ndim), tree
    )


def global_put(tree, shardings):
    """device_put a pytree onto NamedShardings, multi-process safe.

    Under multiple processes, jax.device_put of a host value to a
    non-fully-addressable sharding runs multihost_utils.assert_equal per
    LEAF (dispatch.py _device_put_sharding_impl) — one gloo context +
    allgather per leaf, hundreds of tiny lockstep collectives whose 30 s
    rendezvous deadline flakes on slow hosts.  Our callers guarantee the
    host values are identical on every process (same PRNG init /
    converted checkpoint), so build the global arrays with
    make_array_from_callback instead: zero collectives, each process
    fills only its addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    import numpy as np

    if os.environ.get("SCAIL_CHECK_GLOBAL_PUT", "0") not in ("", "0"):
        # Opt-in debug guard for the precondition above: ONE collective
        # comparing a per-leaf content hash across processes (vs
        # device_put's per-leaf assert_equal storm).  Costs a full pass
        # over host memory -- enable when diagnosing replica divergence
        # (per-host-seeded init, rank-0-only checkpoint load).
        import hashlib

        from jax.experimental import multihost_utils

        fp = np.array(
            [int.from_bytes(
                hashlib.blake2b(np.ascontiguousarray(l).tobytes(),
                                digest_size=4).digest(), "little")
             for l in jax.tree.leaves(tree)], np.uint32)
        multihost_utils.assert_equal(
            fp, "global_put: host values differ across processes")

    def put(v, sh):
        v = np.asarray(v)
        return jax.make_array_from_callback(v.shape, sh, lambda idx: v[idx])

    return jax.tree.map(put, tree, shardings)


def shard_tree(tree, rules: PathRules, mesh: Mesh):
    """Device-put every leaf with its NamedSharding."""
    specs = specs_for_tree(tree, rules)
    return global_put(
        tree, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                           is_leaf=lambda x: isinstance(x, P)))


def with_sharding_constraint(x, spec: P, mesh: Mesh = None):
    """Annotate intermediate activations; no-op outside jit/mesh context."""
    try:
        if mesh is not None:
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
        return jax.lax.with_sharding_constraint(x, spec)
    except (ValueError, RuntimeError):
        return x
