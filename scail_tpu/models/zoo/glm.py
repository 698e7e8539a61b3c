"""GLM/ChatGLM-family decoder LM (reference: sat/model/official/
chatglm4_model.py — RMSNorm pre-norm, GQA with qkv bias, partial
interleaved rotary on the first half of the head dim
(ChatGLM4AttnMixin, chatglm4_model.py:15-60 with FastRotaryEmbedding
over rotary_dim//2), SwiGLU MLP with fused gate+up projection
(SwiGLUMixin, chatglm4_model.py:116-141)).

Weight ingestion uses the HF `GlmForCausalLM` naming
(`glm_params_from_hf`); numerics are golden-tested against
transformers' GlmForCausalLM (tests/test_zoo_models.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import normal_init
from scail_tpu.ops.norms import rms_norm
from scail_tpu.ops.rotary import apply_rotary


@dataclasses.dataclass(frozen=True)
class GlmConfig:
    vocab_size: int = 151552
    dim: int = 4096
    num_layers: int = 40
    num_heads: int = 32
    num_kv_heads: int = 2
    head_dim: int = 128
    inner_hidden_size: int = 13696
    max_len: int = 2048
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.5
    eps: float = 1.5625e-07
    tie_embeddings: bool = False

    @property
    def rotary_dim(self):
        return int(self.head_dim * self.partial_rotary_factor)


def init_glm_params(key, cfg: GlmConfig):
    L, d, hd = cfg.num_layers, cfg.dim, cfg.head_dim
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    ks = iter(jax.random.split(key, 16))

    def lin(k, din, dout, bias=False):
        p = {"kernel": 0.02 * jax.random.normal(k, (L, din, dout))}
        if bias:
            p["bias"] = jnp.zeros((L, dout))
        return p

    p = {
        "embed": normal_init(next(ks), (cfg.vocab_size, d)),
        "layers": {
            "ln1": {"scale": jnp.ones((L, d))},
            "q": lin(next(ks), d, qd, bias=True),
            "k": lin(next(ks), d, kvd, bias=True),
            "v": lin(next(ks), d, kvd, bias=True),
            "o": lin(next(ks), qd, d),
            "ln2": {"scale": jnp.ones((L, d))},
            "gate_up": lin(next(ks), d, 2 * cfg.inner_hidden_size),
            "down": lin(next(ks), cfg.inner_hidden_size, d),
        },
        "norm": {"scale": jnp.ones((d,))},
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = {"kernel": 0.02 * jax.random.normal(
            next(ks), (d, cfg.vocab_size))}
    return p


def _glm_rope(x, positions, cfg: GlmConfig):
    """Partial interleaved rotary: first rotary_dim dims rotated pairwise,
    the rest pass through (HF Glm apply_rotary_pos_emb semantics ==
    reference FastRotaryEmbedding, chatglm4_model.py:15-60)."""
    rd = cfg.rotary_dim
    inv = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))       # (rd/2,)
    ang = positions[:, None].astype(jnp.float32) * inv[None]  # (s, rd/2)
    cos = jnp.repeat(jnp.cos(ang), 2, axis=-1)[None, :, None]  # (1,s,1,rd)
    sin = jnp.repeat(jnp.sin(ang), 2, axis=-1)[None, :, None]
    x_rot, x_pass = x[..., :rd], x[..., rd:]
    x_rot = apply_rotary(x_rot, cos, sin, interleaved=True)
    return jnp.concatenate([x_rot, x_pass], axis=-1)


class GlmKVCache(NamedTuple):
    k: jnp.ndarray  # (L, b, max_len, n_kv, hd)
    v: jnp.ndarray
    length: jnp.ndarray


def init_glm_cache(cfg: GlmConfig, batch: int) -> GlmKVCache:
    shape = (cfg.num_layers, batch, cfg.max_len, cfg.num_kv_heads, cfg.head_dim)
    return GlmKVCache(jnp.zeros(shape), jnp.zeros(shape),
                      jnp.zeros([], jnp.int32))


def glm_forward(params, cfg: GlmConfig, tokens,
                cache: Optional[GlmKVCache] = None,
                inputs_embeds=None,
                ) -> Tuple[jnp.ndarray, Optional[GlmKVCache]]:
    """tokens: (b, s) -> logits (b, s, vocab); causal LM with optional
    KV-cached incremental decode (zoo/gpt.py contract).  `inputs_embeds`
    (b, s, d) overrides the token embedding (multimodal splicing,
    zoo/glm4v.py)."""
    b, s = tokens.shape
    n, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = n // nkv
    pos0 = cache.length if cache is not None else 0
    positions = pos0 + jnp.arange(s)
    x = params["embed"][tokens] if inputs_embeds is None else inputs_embeds

    new_k, new_v = [], []
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda p: p[li], params["layers"])
        y = rms_norm(x, lp["ln1"]["scale"], eps=cfg.eps)
        q = (y @ lp["q"]["kernel"] + lp["q"]["bias"]).reshape(b, s, n, hd)
        k = (y @ lp["k"]["kernel"] + lp["k"]["bias"]).reshape(b, s, nkv, hd)
        v = (y @ lp["v"]["kernel"] + lp["v"]["bias"]).reshape(b, s, nkv, hd)
        q = _glm_rope(q, positions, cfg)
        k = _glm_rope(k, positions, cfg)

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

        kk = jnp.repeat(kk, rep, axis=2)
        vv = jnp.repeat(vv, rep, axis=2)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, kk,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = jnp.where(valid[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, vv).reshape(b, s, -1)
        x = x + o @ lp["o"]["kernel"]
        y = rms_norm(x, lp["ln2"]["scale"], eps=cfg.eps)
        gate_up = y @ lp["gate_up"]["kernel"]
        gate, up = jnp.split(gate_up, 2, axis=-1)
        x = x + (up * jax.nn.silu(gate)) @ lp["down"]["kernel"]

    x = rms_norm(x, params["norm"]["scale"], eps=cfg.eps)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]["kernel"]
    logits = x @ head
    out_cache = None
    if cache is not None:
        out_cache = GlmKVCache(jnp.stack(new_k), jnp.stack(new_v),
                               cache.length + s)
    return logits, out_cache


def glm_params_from_hf(sd, cfg: GlmConfig):
    """HF GlmForCausalLM state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers

    def stack(fmt, bias=False):
        p = {"kernel": np.stack(
            [g(fmt.format(i) + ".weight").T for i in range(L)])}
        if bias:
            p["bias"] = np.stack(
                [g(fmt.format(i) + ".bias") for i in range(L)])
        return p

    p = {
        "embed": g("model.embed_tokens.weight"),
        "layers": {
            "ln1": {"scale": np.stack(
                [g(f"model.layers.{i}.input_layernorm.weight") for i in range(L)])},
            "q": stack("model.layers.{}.self_attn.q_proj", bias=True),
            "k": stack("model.layers.{}.self_attn.k_proj", bias=True),
            "v": stack("model.layers.{}.self_attn.v_proj", bias=True),
            "o": stack("model.layers.{}.self_attn.o_proj"),
            "ln2": {"scale": np.stack(
                [g(f"model.layers.{i}.post_attention_layernorm.weight")
                 for i in range(L)])},
            "gate_up": stack("model.layers.{}.mlp.gate_up_proj"),
            "down": stack("model.layers.{}.mlp.down_proj"),
        },
        "norm": {"scale": g("model.norm.weight")},
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = {"kernel": g("lm_head.weight").T}
    return p
