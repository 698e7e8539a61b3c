"""Decoder-only transformer LM with KV-cached autoregressive decoding.

TPU-native equivalent of SAT's GPT2-style models
(sat/model/official/gpt2_model.py) + `CachedAutoregressiveMixin`
(sat/model/cached_autoregressive_model.py:19-90): the full-sequence forward
is used for training/prefill; incremental decode carries a fixed-shape KV
cache through a `lax.scan` (static shapes, no dynamic growth).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from scail_tpu.models.common import dense, dense_init, gelu_tanh, normal_init
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 50257
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    max_len: int = 1024
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads


def init_gpt_params(key, cfg: GPTConfig):
    L, d = cfg.num_layers, cfg.dim
    ks = iter(jax.random.split(key, 12))
    ln = lambda: {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))}
    return {
        "wte": normal_init(next(ks), (cfg.vocab_size, d)),
        "wpe": normal_init(next(ks), (cfg.max_len, d)),
        "layers": {
            "ln1": ln(),
            "qkv": dense_init(next(ks), d, 3 * d, prefix_shape=(L,)),
            "proj": dense_init(next(ks), d, d, prefix_shape=(L,)),
            "ln2": ln(),
            "fc1": dense_init(next(ks), d, 4 * d, prefix_shape=(L,)),
            "fc2": dense_init(next(ks), 4 * d, d, prefix_shape=(L,)),
        },
        "ln_f": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, b, max_len, n, hd)
    v: jnp.ndarray
    length: jnp.ndarray  # scalar int32


def init_kv_cache(cfg: GPTConfig, batch: int) -> KVCache:
    shape = (cfg.num_layers, batch, cfg.max_len, cfg.num_heads, cfg.head_dim)
    return KVCache(jnp.zeros(shape), jnp.zeros(shape), jnp.zeros([], jnp.int32))


def _heads(x, n):
    return x.reshape(*x.shape[:-1], n, -1)


def gpt_forward(params, cfg: GPTConfig, tokens,
                cache: Optional[KVCache] = None,
                prefix=None, adapters=None) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """tokens: (b, s).  Causal full/prefill forward when cache is None;
    incremental decode (s == chunk, appended at cache.length) otherwise.
    `prefix`: optional (L, 2, n, P, hd) learned KV prefix, always visible
    (PrefixTuningMixin, sat/model/finetune/prompt_tuning.py:21-46).
    `adapters`: optional bottleneck-adapter tree (training/adapters.py;
    AdapterMixin, sat/model/finetune/adapter.py:24-48)."""
    b, s = tokens.shape
    n, hd = cfg.num_heads, cfg.head_dim
    pos0 = cache.length if cache is not None else 0
    positions = pos0 + jnp.arange(s)
    x = params["wte"][tokens] + params["wpe"][positions][None]

    new_k, new_v = [], []
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda p: p[li], params["layers"])
        y = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps=cfg.eps)
        qkv = dense(lp["qkv"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = _heads(q, n), _heads(k, n), _heads(v, n)

        if cache is not None:
            ck = jax.lax.dynamic_update_slice(
                cache.k[li], k, (0, pos0, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cache.v[li], v, (0, pos0, 0, 0))
            new_k.append(ck)
            new_v.append(cv)
            kk, vv = ck, cv
            kv_pos = jnp.arange(cfg.max_len)
            valid = kv_pos[None, :] <= positions[:, None]  # causal+length mask
        else:
            kk, vv = k, v
            kv_pos = jnp.arange(s)
            valid = kv_pos[None, :] <= positions[:, None]

        if prefix is not None:
            pk, pv = prefix[li, 0], prefix[li, 1]       # (n, P, hd)
            P = pk.shape[1]
            pk = jnp.broadcast_to(pk.transpose(1, 0, 2)[None], (b, P, n, hd))
            pv = jnp.broadcast_to(pv.transpose(1, 0, 2)[None], (b, P, n, hd))
            kk = jnp.concatenate([kk, pk.astype(kk.dtype)], axis=1)
            vv = jnp.concatenate([vv, pv.astype(vv.dtype)], axis=1)
            valid = jnp.concatenate([valid, jnp.ones((s, P), bool)], axis=1)

        logits = jnp.einsum("bqnd,bknd->bnqk", q, kk,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = jnp.where(valid[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, vv).reshape(b, s, -1)
        attn_out = dense(lp["proj"], o)
        if adapters is not None:
            from scail_tpu.training.adapters import apply_adapter

            attn_out = apply_adapter(
                jax.tree.map(lambda p: p[li], adapters["attn"]), attn_out)
        x = x + attn_out
        y = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps=cfg.eps)
        mlp_out = dense(lp["fc2"], gelu_tanh(dense(lp["fc1"], y)))
        if adapters is not None:
            from scail_tpu.training.adapters import apply_adapter

            mlp_out = apply_adapter(
                jax.tree.map(lambda p: p[li], adapters["mlp"]), mlp_out)
        x = x + mlp_out

    x = layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"], eps=cfg.eps)
    logits = x @ params["wte"].T  # tied embeddings
    out_cache = None
    if cache is not None:
        out_cache = KVCache(jnp.stack(new_k), jnp.stack(new_v), cache.length + s)
    return logits, out_cache


def generate(params, cfg: GPTConfig, prompt, max_new: int, key,
             temperature: float = 1.0, top_k: int = 0):
    """KV-cached greedy/sampled generation: prefill once, then a lax.scan of
    single-token decode steps (CachedAutoregressiveMixin semantics)."""
    from scail_tpu.generation import BaseStrategy

    b, s0 = prompt.shape
    strategy = BaseStrategy(temperature=temperature, top_k=top_k)
    cache = init_kv_cache(cfg, b)
    logits, cache = gpt_forward(params, cfg, prompt, cache)
    k0, key = jax.random.split(key)
    tok = strategy.forward(logits[:, -1], k0)

    def step(carry, k):
        tok, cache = carry
        logits, cache = gpt_forward(params, cfg, tok[:, None], cache)
        nxt = strategy.forward(logits[:, -1], k)
        return (nxt, cache), tok

    (last, _), toks = jax.lax.scan(
        step, (tok, cache), jax.random.split(key, max_new - 1))
    seq = jnp.concatenate([toks.transpose(1, 0), last[:, None]], axis=1)
    return jnp.concatenate([prompt, seq], axis=1)
