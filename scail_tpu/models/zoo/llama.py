"""LLaMA-family decoder LM (reference: sat/model/official/llama_model.py —
RMSNorm pre-norm, rotary attention, gated-SiLU MLP, tied-or-separate LM
head; SAT wires these as mixins over BaseTransformer, here it is one
functional forward with the same KV-cache decode contract as zoo/gpt.py).

Weight ingestion uses the HF `LlamaForCausalLM` naming
(`llama_params_from_hf`), the layout SAT's own from_pretrained name-maps
target; numerics are golden-tested against transformers' LlamaForCausalLM
(tests/test_zoo_models.py).  Supports GQA (num_kv_heads < num_heads).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import normal_init
from scail_tpu.ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    inner_hidden_size: int = 11008
    max_len: int = 2048
    rope_theta: float = 10000.0
    eps: float = 1e-6
    tie_embeddings: bool = False

    @property
    def head_dim(self):
        return self.dim // self.num_heads


def init_llama_params(key, cfg: LlamaConfig):
    L, d, hd = cfg.num_layers, cfg.dim, cfg.head_dim
    kvd = cfg.num_kv_heads * hd
    ks = iter(jax.random.split(key, 16))

    def lin(k, din, dout):
        return {"kernel": 0.02 * jax.random.normal(k, (L, din, dout))}

    p = {
        "embed": normal_init(next(ks), (cfg.vocab_size, d)),
        "layers": {
            "ln1": {"scale": jnp.ones((L, d))},
            "q": lin(next(ks), d, d),
            "k": lin(next(ks), d, kvd),
            "v": lin(next(ks), d, kvd),
            "o": lin(next(ks), d, d),
            "ln2": {"scale": jnp.ones((L, d))},
            "gate": lin(next(ks), d, cfg.inner_hidden_size),
            "up": lin(next(ks), d, cfg.inner_hidden_size),
            "down": lin(next(ks), cfg.inner_hidden_size, d),
        },
        "norm": {"scale": jnp.ones((d,))},
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = {"kernel": 0.02 * jax.random.normal(
            next(ks), (d, cfg.vocab_size))}
    return p


def _rope(x, positions, theta):
    """HF-llama rotary: half-rotation, non-interleaved.
    x: (b, s, n, hd); positions: (s,)."""
    hd = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    ang = positions[:, None].astype(jnp.float32) * inv[None]      # (s, hd/2)
    cos = jnp.concatenate([jnp.cos(ang)] * 2, -1)[None, :, None]  # (1,s,1,hd)
    sin = jnp.concatenate([jnp.sin(ang)] * 2, -1)[None, :, None]
    x1, x2 = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


class LlamaKVCache(NamedTuple):
    k: jnp.ndarray  # (L, b, max_len, n_kv, hd)
    v: jnp.ndarray
    length: jnp.ndarray


def init_llama_cache(cfg: LlamaConfig, batch: int) -> LlamaKVCache:
    shape = (cfg.num_layers, batch, cfg.max_len, cfg.num_kv_heads, cfg.head_dim)
    return LlamaKVCache(jnp.zeros(shape), jnp.zeros(shape),
                        jnp.zeros([], jnp.int32))


def llama_forward(params, cfg: LlamaConfig, tokens,
                  cache: Optional[LlamaKVCache] = None,
                  prefix=None) -> Tuple[jnp.ndarray, Optional[LlamaKVCache]]:
    """tokens: (b, s) -> logits (b, s, vocab).  `prefix` is an optional
    (L, 2, n_kv, P, hd) learned KV-prefix (PrefixTuningMixin semantics,
    sat/model/finetune/prompt_tuning.py:21-45)."""
    b, s = tokens.shape
    n, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = n // nkv
    pos0 = cache.length if cache is not None else 0
    positions = pos0 + jnp.arange(s)
    x = params["embed"][tokens]

    new_k, new_v = [], []
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda p: p[li], params["layers"])
        y = rms_norm(x, lp["ln1"]["scale"], eps=cfg.eps)
        q = (y @ lp["q"]["kernel"]).reshape(b, s, n, hd)
        k = (y @ lp["k"]["kernel"]).reshape(b, s, nkv, hd)
        v = (y @ lp["v"]["kernel"]).reshape(b, s, nkv, hd)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        if cache is not None:
            ck = jax.lax.dynamic_update_slice(cache.k[li], k, (0, pos0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cache.v[li], v, (0, pos0, 0, 0))
            new_k.append(ck)
            new_v.append(cv)
            kk, vv = ck, cv
            valid = jnp.arange(cfg.max_len)[None, :] <= positions[:, None]
        else:
            kk, vv = k, v
            valid = jnp.arange(s)[None, :] <= positions[:, None]

        if prefix is not None:
            pk, pv = prefix[li, 0], prefix[li, 1]       # (n_kv, P, hd)
            P = pk.shape[1]
            pk = jnp.broadcast_to(pk.transpose(1, 0, 2)[None], (b, P, nkv, hd))
            pv = jnp.broadcast_to(pv.transpose(1, 0, 2)[None], (b, P, nkv, hd))
            kk = jnp.concatenate([kk, pk.astype(kk.dtype)], axis=1)
            vv = jnp.concatenate([vv, pv.astype(vv.dtype)], axis=1)
            valid = jnp.concatenate(
                [valid, jnp.ones((s, P), bool)], axis=1)

        kk = jnp.repeat(kk, rep, axis=2)  # GQA head expansion
        vv = jnp.repeat(vv, rep, axis=2)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, kk,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = jnp.where(valid[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, vv).reshape(b, s, -1)
        x = x + o @ lp["o"]["kernel"]
        y = rms_norm(x, lp["ln2"]["scale"], eps=cfg.eps)
        ff = jax.nn.silu(y @ lp["gate"]["kernel"]) * (y @ lp["up"]["kernel"])
        x = x + ff @ lp["down"]["kernel"]

    x = rms_norm(x, params["norm"]["scale"], eps=cfg.eps)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]["kernel"]
    logits = x @ head
    out_cache = None
    if cache is not None:
        out_cache = LlamaKVCache(jnp.stack(new_k), jnp.stack(new_v),
                                 cache.length + s)
    return logits, out_cache


def llama_params_from_hf(sd, cfg: LlamaConfig):
    """HF LlamaForCausalLM state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers

    def stack(fmt):
        return {"kernel": np.stack(
            [g(fmt.format(i) + ".weight").T for i in range(L)])}

    p = {
        "embed": g("model.embed_tokens.weight"),
        "layers": {
            "ln1": {"scale": np.stack(
                [g(f"model.layers.{i}.input_layernorm.weight") for i in range(L)])},
            "q": stack("model.layers.{}.self_attn.q_proj"),
            "k": stack("model.layers.{}.self_attn.k_proj"),
            "v": stack("model.layers.{}.self_attn.v_proj"),
            "o": stack("model.layers.{}.self_attn.o_proj"),
            "ln2": {"scale": np.stack(
                [g(f"model.layers.{i}.post_attention_layernorm.weight")
                 for i in range(L)])},
            "gate": stack("model.layers.{}.mlp.gate_proj"),
            "up": stack("model.layers.{}.mlp.up_proj"),
            "down": stack("model.layers.{}.mlp.down_proj"),
        },
        "norm": {"scale": g("model.norm.weight")},
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = {"kernel": g("lm_head.weight").T}
    return p
