"""Mixtral sparse-MoE decoder LM (reference: sat/model/official/
mixtral_model.py over the num_experts transformer substrate,
sat/transformer_defaults.py:163-209 dispatch).

Reuses the LLaMA attention stack (zoo/llama.py semantics) with the
block-sparse MoE MLP from ops/moe.py (softmax -> top-k -> renormalize,
gated-SiLU experts).  HF MixtralForCausalLM weight ingestion; golden
parity in tests/test_zoo_models.py.  Expert weights shard over the
'model' mesh axis (EP) exactly like the DiT's MoE.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.zoo.llama import _rope
from scail_tpu.ops.moe import moe_mlp
from scail_tpu.ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class MixtralConfig:
    vocab_size: int = 32000
    dim: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    inner_hidden_size: int = 14336
    num_experts: int = 8
    top_k: int = 2
    max_len: int = 4096
    rope_theta: float = 1e6
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads


def init_mixtral_params(key, cfg: MixtralConfig):
    L, d, hd = cfg.num_layers, cfg.dim, cfg.head_dim
    kvd = cfg.num_kv_heads * hd
    E, f = cfg.num_experts, cfg.inner_hidden_size
    ks = iter(jax.random.split(key, 20))

    def lin(shape):
        return {"kernel": 0.02 * jax.random.normal(next(ks), shape)}

    return {
        "embed": 0.02 * jax.random.normal(next(ks), (cfg.vocab_size, d)),
        "layers": {
            "ln1": {"scale": jnp.ones((L, d))},
            "q": lin((L, d, d)), "k": lin((L, d, kvd)),
            "v": lin((L, d, kvd)), "o": lin((L, d, d)),
            "ln2": {"scale": jnp.ones((L, d))},
            "moe_gate": lin((L, d, E)),
            "moe_w1": lin((L, E, d, f)),   # gate proj (silu side)
            "moe_w3": lin((L, E, d, f)),   # up proj
            "moe_w2": lin((L, E, f, d)),   # down proj
        },
        "norm": {"scale": jnp.ones((d,))},
        "lm_head": lin((d, cfg.vocab_size)),
    }


def mixtral_forward(params, cfg: MixtralConfig, tokens):
    """tokens: (b, s) -> logits (b, s, vocab)."""
    b, s = tokens.shape
    n, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = n // nkv
    positions = jnp.arange(s)
    x = params["embed"][tokens]
    valid = jnp.arange(s)[None, :] <= positions[:, None]

    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda p: p[li], params["layers"])
        y = rms_norm(x, lp["ln1"]["scale"], eps=cfg.eps)
        q = _rope((y @ lp["q"]["kernel"]).reshape(b, s, n, hd), positions,
                  cfg.rope_theta)
        k = _rope((y @ lp["k"]["kernel"]).reshape(b, s, nkv, hd), positions,
                  cfg.rope_theta)
        v = (y @ lp["v"]["kernel"]).reshape(b, s, nkv, hd)
        kk = jnp.repeat(k, rep, axis=2)
        vv = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, kk,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = jnp.where(valid[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, vv).reshape(b, s, -1)
        x = x + o @ lp["o"]["kernel"]

        y = rms_norm(x, lp["ln2"]["scale"], eps=cfg.eps)
        x = x + moe_mlp(y, lp["moe_gate"], lp["moe_w3"], lp["moe_w2"],
                        top_k=cfg.top_k, act=jax.nn.silu,
                        w_gate=lp["moe_w1"])

    x = rms_norm(x, params["norm"]["scale"], eps=cfg.eps)
    return x @ params["lm_head"]["kernel"]


def mixtral_params_from_hf(sd, cfg: MixtralConfig):
    """HF MixtralForCausalLM state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L, E = cfg.num_layers, cfg.num_experts

    def stack(fmt):
        return {"kernel": np.stack(
            [g(fmt.format(i) + ".weight").T for i in range(L)])}

    def stack_experts(w):
        return {"kernel": np.stack([
            np.stack([g(f"model.layers.{i}.block_sparse_moe.experts.{e}."
                        f"{w}.weight").T for e in range(E)])
            for i in range(L)])}

    return {
        "embed": g("model.embed_tokens.weight"),
        "layers": {
            "ln1": {"scale": np.stack(
                [g(f"model.layers.{i}.input_layernorm.weight")
                 for i in range(L)])},
            "q": stack("model.layers.{}.self_attn.q_proj"),
            "k": stack("model.layers.{}.self_attn.k_proj"),
            "v": stack("model.layers.{}.self_attn.v_proj"),
            "o": stack("model.layers.{}.self_attn.o_proj"),
            "ln2": {"scale": np.stack(
                [g(f"model.layers.{i}.post_attention_layernorm.weight")
                 for i in range(L)])},
            "moe_gate": stack("model.layers.{}.block_sparse_moe.gate"),
            "moe_w1": stack_experts("w1"),
            "moe_w3": stack_experts("w3"),
            "moe_w2": stack_experts("w2"),
        },
        "norm": {"scale": g("model.norm.weight")},
        "lm_head": {"kernel": g("lm_head.weight").T},
    }


def mixtral_param_rules():
    """EP sharding: experts over the 'model' mesh axis."""
    from jax.sharding import PartitionSpec as P

    from scail_tpu.parallel.mesh import MODEL_AXIS
    from scail_tpu.parallel.sharding import PathRules

    return PathRules([
        (r"layers/(moe_w1|moe_w2|moe_w3)/kernel$",
         P(None, MODEL_AXIS, None, None)),
    ])
