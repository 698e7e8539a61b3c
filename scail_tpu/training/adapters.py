"""Adapter fine-tuning + MLP heads (reference: sat/model/finetune/
adapter.py AdapterMixin, mlp_head.py MLPHeadMixin).

Adapters are small bottleneck MLPs inserted after the attention output
and after the MLP output of each layer (output + ff2(gelu(ff1(output))),
adapter.py:35-46), near-zero-initialized so the adapted model starts at
the base model's function.  Functional form: the host model's forward
takes an optional `adapters` tree and applies `apply_adapter` at the two
insertion points (zoo/gpt.py wires this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def init_adapter_params(key, num_layers: int, hidden_size: int,
                        adapter_hidden: int, std: float = 1e-3):
    """(attn + mlp) bottlenecks per layer, trunc-normal-ish tiny init
    (adapter.py:52-61)."""
    ks = jax.random.split(key, 4)

    def lin(k, din, dout):
        return {"kernel": std * jax.random.normal(
            k, (num_layers, din, dout), jnp.float32),
            "bias": jnp.zeros((num_layers, dout), jnp.float32)}

    return {
        "attn": {"down": lin(ks[0], hidden_size, adapter_hidden),
                 "up": lin(ks[1], adapter_hidden, hidden_size)},
        "mlp": {"down": lin(ks[2], hidden_size, adapter_hidden),
                "up": lin(ks[3], adapter_hidden, hidden_size)},
    }


def apply_adapter(p, x):
    """x + up(gelu(down(x))) (adapter.py:35, :44); p holds one layer's
    {'down','up'} (already indexed out of the stacked tree)."""
    h = jax.nn.gelu(x @ p["down"]["kernel"] + p["down"]["bias"])
    return x + (h @ p["up"]["kernel"] + p["up"]["bias"])


def adapters_only_optimizer(tx):
    """Freeze everything except the 'adapters' subtree
    (the requires_grad surgery of the reference finetune flow)."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        param_labels=lambda tree: jax.tree.map_with_path(
            lambda path, _: "train" if any(
                getattr(p, "key", None) == "adapters" for p in path
            ) else "freeze", tree),
    )


def init_mlp_head_params(key, hidden_size: int, *output_sizes: int,
                         std: float = 0.005):
    """Classification head stack (mlp_head.py:19-29)."""
    ks = jax.random.split(key, max(len(output_sizes), 1))
    layers = []
    last = hidden_size
    for k, sz in zip(ks, output_sizes):
        layers.append({"kernel": std * jax.random.normal(k, (last, sz)),
                       "bias": jnp.zeros((sz,), jnp.float32)})
        last = sz
    return layers


def mlp_head(params, x, act=jax.nn.relu):
    """relu-separated linear stack over final hidden states
    (mlp_head.py:31-36)."""
    for i, p in enumerate(params):
        if i > 0:
            x = act(x)
        x = x @ p["kernel"] + p["bias"]
    return x
