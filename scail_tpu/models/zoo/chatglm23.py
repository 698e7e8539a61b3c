"""ChatGLM2 / ChatGLM3 decoder LMs (reference: sat/model/official/
chatglm2_model.py and chatglm3_model.py).

Shared architecture (the two differ only in rotary base and SwiGLU
operand order):

  * pre-norm RMSNorm blocks (ChatGLM2Model passes layernorm=RMSNorm,
    chatglm2_model.py:144)
  * fused strided qkv with multi-query/grouped kv heads
    (sat/model/transformer.py:60-79: stride [n_q, n_kv, n_kv]), qkv
    bias on, dense/MLP bias off (ChatGLM2-6B layout; the `use_bias or
    qkv_bias` wiring at transformer.py:72)
  * partial interleaved rotary over the FIRST HALF of the head dim:
    ChatGLM2AttnMixin builds FastRotaryEmbedding(rotary_dim // 2,
    interleaved=True) (chatglm2_model.py:14-19), i.e. pair j of the
    first hd/2 dims rotates by theta^(-2j/(hd/2)); positions gathered
    per token from position_ids (triton_rotary_embeddings.py:229-267).
    ChatGLM3 scales the base: 10000 * base_scale (chatglm3_model.py:19).
  * SwiGLU MLP with a SEPARATE gate projection added by SwiGLUMixin
    ("mixins.mlp.w2").  Operand order differs between the versions:
      v2: silu(dense_h_to_4h(x)) * w2(x)   (chatglm2_model.py:131-138)
      v3: silu(w2(x)) * dense_h_to_4h(x)   (chatglm3_model.py:135-142)
  * untied biasless lm_head (ChatGLMFinalMixin, chatglm_model.py:22-34)
    after the final RMSNorm.

Golden-tested against the reference's own torch modules via
tests/refmods.py with the triton rotary replaced by its documented
torch equivalent (tests/test_zoo_models_ref.py).
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
class ChatGLM2Config:
    vocab_size: int = 65024
    dim: int = 4096
    num_heads: int = 32
    num_kv_heads: int = 2          # ChatGLM2/3-6B multi-query groups
    num_layers: int = 28
    inner_hidden_size: int = 13696
    max_len: int = 2048
    eps: float = 1e-5
    base_scale: float = 1.0        # v3 configs scale the rotary base
    swap_swiglu: bool = False      # False = v2 order, True = v3 order
    qkv_bias: bool = True
    use_bias: bool = False

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    @property
    def rotary_dim(self):
        return self.head_dim // 2


def chatglm3_config(**kw) -> ChatGLM2Config:
    """ChatGLM3 = the v2 substrate with swapped SwiGLU operands and an
    optional base_scale on the rotary (chatglm3_model.py:146-155)."""
    kw.setdefault("swap_swiglu", True)
    return ChatGLM2Config(**kw)


def init_chatglm2_params(key, cfg: ChatGLM2Config):
    L, d, hd = cfg.num_layers, cfg.dim, cfg.head_dim
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * hd
    ks = iter(jax.random.split(key, 12))

    def lin(k, din, dout, bias):
        p = {"kernel": 0.02 * jax.random.normal(k, (L, din, dout))}
        if bias:
            p["bias"] = jnp.zeros((L, dout))
        return p

    return {
        "tok": normal_init(next(ks), (cfg.vocab_size, d)),
        "layers": {
            "ln1": {"scale": jnp.ones((L, d))},
            "qkv": lin(next(ks), d, qkv_out, cfg.use_bias or cfg.qkv_bias),
            "dense": lin(next(ks), cfg.num_heads * hd, d, cfg.use_bias),
            "ln2": {"scale": jnp.ones((L, d))},
            "fc1": lin(next(ks), d, cfg.inner_hidden_size, cfg.use_bias),
            "gate": lin(next(ks), d, cfg.inner_hidden_size, cfg.use_bias),
            "fc2": lin(next(ks), cfg.inner_hidden_size, d, cfg.use_bias),
        },
        "final_ln": {"scale": jnp.ones((d,))},
        "lm_head": {"kernel": 0.02 * jax.random.normal(
            next(ks), (d, cfg.vocab_size))},
    }


def _rope_partial_interleaved(x, positions, cfg: ChatGLM2Config):
    """positions: (b, s).  Rotate the first rotary_dim dims of each head
    pairwise (GPT-J interleaved), frequencies theta^(-2j/rotary_dim)
    with theta = 10000 * base_scale; the back half passes through."""
    rd = cfg.rotary_dim
    theta = 10000.0 * cfg.base_scale
    inv = 1.0 / (theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    ang = positions[..., None].astype(jnp.float32) * inv      # (b, s, rd/2)
    cos = jnp.repeat(jnp.cos(ang), 2, axis=-1)[:, :, None]    # (b, s, 1, rd)
    sin = jnp.repeat(jnp.sin(ang), 2, axis=-1)[:, :, None]
    x_rot, x_pass = x[..., :rd], x[..., rd:]
    x_rot = apply_rotary(x_rot, cos, sin, interleaved=True)
    return jnp.concatenate([x_rot, x_pass], axis=-1)


class ChatGLM2KVCache(NamedTuple):
    k: jnp.ndarray  # (L, b, max_len, n_kv, hd)
    v: jnp.ndarray
    length: jnp.ndarray


def init_chatglm2_cache(cfg: ChatGLM2Config, batch: int) -> ChatGLM2KVCache:
    shape = (cfg.num_layers, batch, cfg.max_len, cfg.num_kv_heads,
             cfg.head_dim)
    return ChatGLM2KVCache(jnp.zeros(shape), jnp.zeros(shape),
                           jnp.zeros([], jnp.int32))


def chatglm2_forward(params, cfg: ChatGLM2Config, tokens,
                     position_ids=None, mask=None,
                     cache: Optional[ChatGLM2KVCache] = None,
                     ) -> Tuple[jnp.ndarray, Optional[ChatGLM2KVCache]]:
    """tokens (b, s) -> logits (b, s, vocab).  position_ids (b, s)
    defaults to arange (ChatGLM2Model.get_position_ids); mask is an
    optional (b, s, s) 0/1 padding mask multiplied into the causal
    structure (get_masks, chatglm2_model.py:158-174); `cache` enables
    KV-cached incremental decode (past_key_values path)."""
    b, s = tokens.shape
    n, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    pos0 = cache.length if cache is not None else 0
    if position_ids is None:
        position_ids = pos0 + jnp.arange(s)[None].repeat(b, 0)
    x = params["tok"][tokens]

    new_k, new_v = [], []
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda p: p[li], params["layers"])
        y = rms_norm(x, lp["ln1"]["scale"], eps=cfg.eps)
        qkv = y @ lp["qkv"]["kernel"]
        if "bias" in lp["qkv"]:
            qkv = qkv + lp["qkv"]["bias"]
        q = qkv[..., : n * hd].reshape(b, s, n, hd)
        k = qkv[..., n * hd: (n + nkv) * hd].reshape(b, s, nkv, hd)
        v = qkv[..., (n + nkv) * hd:].reshape(b, s, nkv, hd)
        q = _rope_partial_interleaved(q, position_ids, cfg)
        k = _rope_partial_interleaved(k, position_ids, cfg)

        if cache is not None:
            ck = jax.lax.dynamic_update_slice(cache.k[li], k, (0, pos0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cache.v[li], v, (0, pos0, 0, 0))
            new_k.append(ck)
            new_v.append(cv)
            kk, vv = ck, cv
            valid = (jnp.arange(cfg.max_len)[None, :]
                     <= (pos0 + jnp.arange(s))[:, None])[None]
        else:
            kk, vv = k, v
            valid = (jnp.arange(s)[None, :] <= jnp.arange(s)[:, None])[None]
            if mask is not None:
                valid = valid & (mask > 0)

        kk = jnp.repeat(kk, n // nkv, axis=2)
        vv = jnp.repeat(vv, n // nkv, axis=2)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, kk,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = jnp.where(valid[:, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, vv).reshape(b, s, -1)
        attn = o @ lp["dense"]["kernel"]
        if "bias" in lp["dense"]:
            attn = attn + lp["dense"]["bias"]
        x = x + attn

        y = rms_norm(x, lp["ln2"]["scale"], eps=cfg.eps)
        x1 = y @ lp["fc1"]["kernel"]
        x2 = y @ lp["gate"]["kernel"]
        if "bias" in lp["fc1"]:
            x1 = x1 + lp["fc1"]["bias"]
            x2 = x2 + lp["gate"]["bias"]
        h = jax.nn.silu(x2) * x1 if cfg.swap_swiglu else jax.nn.silu(x1) * x2
        h = h @ lp["fc2"]["kernel"]
        if "bias" in lp["fc2"]:
            h = h + lp["fc2"]["bias"]
        x = x + h

    x = rms_norm(x, params["final_ln"]["scale"], eps=cfg.eps)
    logits = x @ params["lm_head"]["kernel"]
    out_cache = None
    if cache is not None:
        out_cache = ChatGLM2KVCache(jnp.stack(new_k), jnp.stack(new_v),
                                    cache.length + s)
    return logits, out_cache


def chatglm2_params_from_sat(sd, cfg: ChatGLM2Config):
    """Reference ChatGLM2Model/ChatGLM3Model (SAT) state dict -> pytree.
    The fused strided qkv stays fused (our split mirrors the stride
    layout); the SwiGLU gate comes from the mixin ("mixins.mlp.w2.{i}")."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers
    t = "transformer.layers.{}"

    def stack_lin(fmt):
        p = {"kernel": np.stack(
            [g(fmt.format(i) + ".weight").T for i in range(L)])}
        if fmt.format(0) + ".bias" in sd:
            p["bias"] = np.stack([g(fmt.format(i) + ".bias")
                                  for i in range(L)])
        return p

    def stack_scale(fmt):
        return {"scale": np.stack([g(fmt.format(i) + ".weight")
                                   for i in range(L)])}

    return {
        "tok": g("transformer.word_embeddings.weight"),
        "layers": {
            "ln1": stack_scale(t + ".input_layernorm"),
            "qkv": stack_lin(t + ".attention.query_key_value"),
            "dense": stack_lin(t + ".attention.dense"),
            "ln2": stack_scale(t + ".post_attention_layernorm"),
            "fc1": stack_lin(t + ".mlp.dense_h_to_4h"),
            "gate": stack_lin("mixins.mlp.w2.{}"),
            "fc2": stack_lin(t + ".mlp.dense_4h_to_h"),
        },
        "final_ln": {"scale": g("transformer.final_layernorm.weight")},
        "lm_head": {"kernel": g("mixins.chatglm-final.lm_head.weight").T},
    }
