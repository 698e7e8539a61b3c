"""Small shared helpers (reference: sgm/util.py)."""

from __future__ import annotations

# jax imports stay inside the functions that need them: this module is
# on the import path of host-only tooling (data loaders, converters)
# that must not spin up a device client.


def append_dims(x, target_ndim: int):
    """Append singleton dims to `x` until it has `target_ndim` dims
    (reference: sgm/util.py:303)."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


def default(val, d):
    if val is not None:
        return val
    return d() if callable(d) else d


def expand_dims_like(x, y):
    while x.ndim != y.ndim:
        x = x[..., None]
    return x


def count_params(tree) -> int:
    import jax

    return sum(p.size for p in jax.tree.leaves(tree))


def cast_tree(tree, dtype):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p, tree
    )
