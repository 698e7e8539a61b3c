"""T5 encoder-decoder (reference: sat/model/official/t5_model.py — the one
`EncoderDecoderModel` user in the SAT zoo: relative-attention buckets,
RMS layer norm, gated-GELU MLP, tied-or-untied LM head).

Functional JAX forward; weight ingestion uses the HF `T5ForConditional-
Generation` naming (`t5_params_from_hf`); golden-tested against
transformers' T5 in tests/test_zoo_models.py.  Like HF/SAT, the relative
attention bias lives in the FIRST block of each stack and is shared.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_tanh
from scail_tpu.ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    dim: int = 512
    dim_kv: int = 64              # per-head
    num_heads: int = 6
    inner_hidden_size: int = 1024
    num_layers: int = 8           # encoder layers
    num_decoder_layers: int = 8
    num_buckets: int = 32
    max_distance: int = 128
    eps: float = 1e-6
    gated_mlp: bool = True        # v1.1 gated-gelu; False -> relu
    tie_word_embeddings: bool = False


def _rel_buckets(lq, lk, num_buckets, max_dist, bidirectional):
    """HF T5 _relative_position_bucket."""
    ctx = np.arange(lq)[:, None]
    mem = np.arange(lk)[None, :]
    rel = mem - ctx
    buckets = np.zeros((lq, lk), np.int64)
    nb = num_buckets
    if bidirectional:
        nb //= 2
        buckets += (rel > 0).astype(np.int64) * nb
        rel = np.abs(rel)
    else:
        rel = -np.minimum(rel, 0)
    max_exact = nb // 2
    is_small = rel < max_exact
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(rel, 1) / max_exact)
            / np.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return jnp.asarray(buckets.astype(np.int32))


def _attn(p, q_in, kv_in, nh, dkv, pos_bias=None, mask_bias=None):
    """T5 attention: NO 1/sqrt(d) scaling."""
    b, sq = q_in.shape[:2]
    sk = kv_in.shape[1]
    q = (q_in @ p["q"]["kernel"]).reshape(b, sq, nh, dkv)
    k = (kv_in @ p["k"]["kernel"]).reshape(b, sk, nh, dkv)
    v = (kv_in @ p["v"]["kernel"]).reshape(b, sk, nh, dkv)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    if pos_bias is not None:
        logits = logits + pos_bias
    if mask_bias is not None:
        logits = logits + mask_bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, sq, nh * dkv)
    return o @ p["o"]["kernel"]


def _mlp(p, x, cfg, eps):
    y = rms_norm(x, p["ln_mlp"]["scale"], eps=eps)
    if cfg.gated_mlp:
        h = gelu_tanh(y @ p["wi0"]["kernel"]) * (y @ p["wi1"]["kernel"])
    else:
        h = jax.nn.relu(y @ p["wi"]["kernel"])
    return x + h @ p["wo"]["kernel"]


def t5_encode(params, cfg: T5Config, ids, mask):
    nh, dkv = cfg.num_heads, cfg.dim_kv
    b, S = ids.shape
    x = params["shared"][ids]
    buckets = _rel_buckets(S, S, cfg.num_buckets, cfg.max_distance, True)
    pos_bias = params["encoder"]["rel_bias"][buckets].transpose(2, 0, 1)[None]
    mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    for li in range(cfg.num_layers):
        p = jax.tree.map(lambda t: t[li], params["encoder"]["layers"])
        y = rms_norm(x, p["ln_attn"]["scale"], eps=cfg.eps)
        x = x + _attn(p["attn"], y, y, nh, dkv, pos_bias, mask_bias)
        x = _mlp(p, x, cfg, cfg.eps)
    return rms_norm(x, params["encoder"]["final_ln"]["scale"], eps=cfg.eps)


def t5_decode(params, cfg: T5Config, dec_ids, enc_states, enc_mask):
    nh, dkv = cfg.num_heads, cfg.dim_kv
    b, S = dec_ids.shape
    x = params["shared"][dec_ids]
    buckets = _rel_buckets(S, S, cfg.num_buckets, cfg.max_distance, False)
    pos_bias = params["decoder"]["rel_bias"][buckets].transpose(2, 0, 1)[None]
    causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]
    xmask = jnp.where(enc_mask[:, None, None, :] > 0, 0.0, -1e9)
    for li in range(cfg.num_decoder_layers):
        p = jax.tree.map(lambda t: t[li], params["decoder"]["layers"])
        y = rms_norm(x, p["ln_attn"]["scale"], eps=cfg.eps)
        x = x + _attn(p["attn"], y, y, nh, dkv, pos_bias, causal)
        y = rms_norm(x, p["ln_cross"]["scale"], eps=cfg.eps)
        x = x + _attn(p["cross"], y, enc_states, nh, dkv, None, xmask)
        x = _mlp(p, x, cfg, cfg.eps)
    x = rms_norm(x, params["decoder"]["final_ln"]["scale"], eps=cfg.eps)
    if cfg.tie_word_embeddings:
        x = x * (cfg.dim ** -0.5)
        return x @ params["shared"].T
    return x @ params["lm_head"]["kernel"]


def t5_forward(params, cfg: T5Config, ids, mask, dec_ids):
    enc = t5_encode(params, cfg, ids, mask)
    return t5_decode(params, cfg, dec_ids, enc, mask)


# ---------------------------------------------------------------------------
# KV-cached incremental decode (zoo/llama.py contract; the reference's
# CachedAutoregressiveMixin applied to the T5 decoder).  Cross-attention
# K/V are computed once from the encoder states at cache init.
# ---------------------------------------------------------------------------
class T5KVCache(NamedTuple):
    k: jnp.ndarray    # (Ld, b, max_len, nh, dkv) self-attn keys
    v: jnp.ndarray
    ck: jnp.ndarray   # (Ld, b, S_enc, nh, dkv) cross-attn keys (fixed)
    cv: jnp.ndarray
    length: jnp.ndarray


def init_t5_cache(params, cfg: T5Config, enc_states, max_len: int) -> T5KVCache:
    b, S = enc_states.shape[:2]
    nh, dkv = cfg.num_heads, cfg.dim_kv
    Ld = cfg.num_decoder_layers
    ck, cv = [], []
    for li in range(Ld):
        p = jax.tree.map(lambda t: t[li], params["decoder"]["layers"])
        ck.append((enc_states @ p["cross"]["k"]["kernel"]).reshape(b, S, nh, dkv))
        cv.append((enc_states @ p["cross"]["v"]["kernel"]).reshape(b, S, nh, dkv))
    shape = (Ld, b, max_len, nh, dkv)
    return T5KVCache(jnp.zeros(shape, enc_states.dtype),
                     jnp.zeros(shape, enc_states.dtype),
                     jnp.stack(ck), jnp.stack(cv), jnp.zeros([], jnp.int32))


def _attn_with_kv(p, q_in, k, v, nh, dkv, pos_bias, mask_bias):
    b, sq = q_in.shape[:2]
    q = (q_in @ p["q"]["kernel"]).reshape(b, sq, nh, dkv)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    if pos_bias is not None:
        logits = logits + pos_bias
    if mask_bias is not None:
        logits = logits + mask_bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, sq, nh * dkv)
    return o @ p["o"]["kernel"]


def t5_decode_cached(params, cfg: T5Config, dec_ids, cache: T5KVCache,
                     enc_mask):
    """Incremental decoder step(s): dec_ids (b, s) appended at cache.length.
    Returns (logits (b, s, vocab), updated cache); logits match t5_decode
    on the same prefix exactly (tests/test_zoo_models.py)."""
    nh, dkv = cfg.num_heads, cfg.dim_kv
    b, s = dec_ids.shape
    max_len = cache.k.shape[2]
    pos0 = cache.length
    x = params["shared"][dec_ids]

    # decoder rel-pos bias rows for queries pos0..pos0+s-1 over all key slots
    buckets = _rel_buckets(max_len, max_len, cfg.num_buckets,
                           cfg.max_distance, False)
    bias_full = params["decoder"]["rel_bias"][buckets]      # (L, L, nh)
    pos_bias = jax.lax.dynamic_slice_in_dim(bias_full, pos0, s, 0)
    pos_bias = pos_bias.transpose(2, 0, 1)[None]            # (1, nh, s, L)
    positions = pos0 + jnp.arange(s)
    causal = jnp.where(
        jnp.arange(max_len)[None, :] <= positions[:, None], 0.0, -1e9
    )[None, None]
    xmask = jnp.where(enc_mask[:, None, None, :] > 0, 0.0, -1e9)

    new_k, new_v = [], []
    for li in range(cfg.num_decoder_layers):
        p = jax.tree.map(lambda t: t[li], params["decoder"]["layers"])
        y = rms_norm(x, p["ln_attn"]["scale"], eps=cfg.eps)
        k = (y @ p["attn"]["k"]["kernel"]).reshape(b, s, nh, dkv)
        v = (y @ p["attn"]["v"]["kernel"]).reshape(b, s, nh, dkv)
        ck_ = jax.lax.dynamic_update_slice(cache.k[li], k, (0, pos0, 0, 0))
        cv_ = jax.lax.dynamic_update_slice(cache.v[li], v, (0, pos0, 0, 0))
        new_k.append(ck_)
        new_v.append(cv_)
        x = x + _attn_with_kv(p["attn"], y, ck_, cv_, nh, dkv, pos_bias, causal)
        y = rms_norm(x, p["ln_cross"]["scale"], eps=cfg.eps)
        x = x + _attn_with_kv(p["cross"], y, cache.ck[li], cache.cv[li],
                              nh, dkv, None, xmask)
        x = _mlp(p, x, cfg, cfg.eps)
    x = rms_norm(x, params["decoder"]["final_ln"]["scale"], eps=cfg.eps)
    if cfg.tie_word_embeddings:
        logits = (x * (cfg.dim ** -0.5)) @ params["shared"].T
    else:
        logits = x @ params["lm_head"]["kernel"]
    out = T5KVCache(jnp.stack(new_k), jnp.stack(new_v), cache.ck, cache.cv,
                    cache.length + s)
    return logits, out


# ---------------------------------------------------------------------------
def init_t5_params(key, cfg: T5Config):
    ks = iter(jax.random.split(key, 24))
    nh, dkv, d, f = cfg.num_heads, cfg.dim_kv, cfg.dim, cfg.inner_hidden_size
    inner = nh * dkv

    def lin(L, din, dout):
        return {"kernel": 0.02 * jax.random.normal(next(ks), (L, din, dout))}

    def stack_layers(L, decoder):
        p = {
            "ln_attn": {"scale": jnp.ones((L, d))},
            "attn": {"q": lin(L, d, inner), "k": lin(L, d, inner),
                     "v": lin(L, d, inner), "o": lin(L, inner, d)},
            "ln_mlp": {"scale": jnp.ones((L, d))},
            "wo": lin(L, f, d),
        }
        if cfg.gated_mlp:
            p["wi0"], p["wi1"] = lin(L, d, f), lin(L, d, f)
        else:
            p["wi"] = lin(L, d, f)
        if decoder:
            p["ln_cross"] = {"scale": jnp.ones((L, d))}
            p["cross"] = {"q": lin(L, d, inner), "k": lin(L, d, inner),
                          "v": lin(L, d, inner), "o": lin(L, inner, d)}
        return p

    params = {
        "shared": 1.0 * jax.random.normal(next(ks), (cfg.vocab_size, d)),
        "encoder": {
            "layers": stack_layers(cfg.num_layers, False),
            "rel_bias": 0.1 * jax.random.normal(next(ks), (cfg.num_buckets, nh)),
            "final_ln": {"scale": jnp.ones((d,))},
        },
        "decoder": {
            "layers": stack_layers(cfg.num_decoder_layers, True),
            "rel_bias": 0.1 * jax.random.normal(next(ks), (cfg.num_buckets, nh)),
            "final_ln": {"scale": jnp.ones((d,))},
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": 0.02 * jax.random.normal(
            next(ks), (d, cfg.vocab_size))}
    return params


def t5_params_from_hf(sd, cfg: T5Config):
    """HF T5ForConditionalGeneration state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])

    def stack_layers(stack, L, decoder):
        def lin(sub, name):
            return {"kernel": np.stack(
                [g(f"{stack}.block.{i}.layer.{sub}.{name}.weight").T
                 for i in range(L)])}

        def ln(sub):
            return {"scale": np.stack(
                [g(f"{stack}.block.{i}.layer.{sub}.layer_norm.weight")
                 for i in range(L)])}

        mlp_sub = 2 if decoder else 1
        p = {
            "ln_attn": ln(0),
            "attn": {n: lin(0, f"SelfAttention.{n}") for n in "qkvo"},
            "ln_mlp": ln(mlp_sub),
            "wo": lin(mlp_sub, "DenseReluDense.wo"),
        }
        if cfg.gated_mlp:
            p["wi0"] = lin(mlp_sub, "DenseReluDense.wi_0")
            p["wi1"] = lin(mlp_sub, "DenseReluDense.wi_1")
        else:
            p["wi"] = lin(mlp_sub, "DenseReluDense.wi")
        if decoder:
            p["ln_cross"] = ln(1)
            p["cross"] = {n: lin(1, f"EncDecAttention.{n}") for n in "qkvo"}
        return p

    params = {
        "shared": g("shared.weight"),
        "encoder": {
            "layers": stack_layers("encoder", cfg.num_layers, False),
            "rel_bias": g("encoder.block.0.layer.0.SelfAttention."
                          "relative_attention_bias.weight"),
            "final_ln": {"scale": g("encoder.final_layer_norm.weight")},
        },
        "decoder": {
            "layers": stack_layers("decoder", cfg.num_decoder_layers, True),
            "rel_bias": g("decoder.block.0.layer.0.SelfAttention."
                          "relative_attention_bias.weight"),
            "final_ln": {"scale": g("decoder.final_layer_norm.weight")},
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": g("lm_head.weight").T}
    return params


def t5_greedy_decode(params, cfg: T5Config, ids, mask, max_new_tokens: int,
                     start_token_id: int = 0, eos_token_id=None):
    """Greedy decoding for the encoder-decoder surface
    (sat/generation semantics over T5).  Returns (b, <=max_new) tokens
    after the start token.  Encoder runs once; the decoder advances one
    KV-cached step per token (t5_decode_cached)."""
    import numpy as np_

    enc = t5_encode(params, cfg, ids, mask)
    b = ids.shape[0]
    cache = init_t5_cache(params, cfg, enc, max_new_tokens + 1)
    dec = np_.full((b, 1), start_token_id, np_.int32)
    done = np_.zeros((b,), bool)
    step = jnp.asarray(dec)
    for _ in range(max_new_tokens):
        logits, cache = t5_decode_cached(params, cfg, step, cache, mask)
        nxt = np_.asarray(jnp.argmax(logits[:, -1], axis=-1)).astype(np_.int32)
        if eos_token_id is not None:
            nxt = np_.where(done, eos_token_id, nxt)
            done |= nxt == eos_token_id
        dec = np_.concatenate([dec, nxt[:, None]], axis=1)
        step = jnp.asarray(nxt[:, None])
        if eos_token_id is not None and done.all():
            break
    return dec[:, 1:]
