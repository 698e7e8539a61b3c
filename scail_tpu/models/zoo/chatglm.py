"""ChatGLM v1 (reference: sat/model/official/chatglm_model.py — post-LN
blocks with deepnorm-style alpha=(2L)^0.5 residual scaling on the
LAYERNORMED input (ChatGLMLayerMixin :108-163), 2D rotary: the head dim
splits in two halves, half 1 rotated by position ids and half 2 by block
position ids, non-interleaved GPT-NeoX tables indexed per token
(ChatGLMAttnMixin :41-106 + rotary_embeddings.apply_rotary_pos_emb_index),
no absolute positions, untied biasless lm_head).

Golden-tested against the reference's own torch module via
tests/refmods.py (tests/test_zoo_models_ref.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact
from scail_tpu.ops.norms import layer_norm
from scail_tpu.ops.rotary import rotate_half


@dataclasses.dataclass(frozen=True)
class ChatGLMConfig:
    vocab_size: int = 130528
    dim: int = 4096
    num_heads: int = 32
    num_layers: int = 28
    inner_hidden_size: int = 16384
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads


def _rope_2d(x, pos_ids, block_ids, hd):
    """x: (b, s, n, hd).  Half 1 rotated by pos_ids, half 2 by block_ids;
    each half uses non-interleaved tables of dim hd/2."""
    half = hd // 2
    inv = 1.0 / (10000.0 ** (jnp.arange(0, half, 2, dtype=jnp.float32) / half))

    def tab(ids):  # (b, s) -> cos/sin (b, s, 1, half)
        ang = ids[..., None].astype(jnp.float32) * inv  # (b, s, half/2)
        emb = jnp.concatenate([ang, ang], axis=-1)
        return jnp.cos(emb)[:, :, None], jnp.sin(emb)[:, :, None]

    x1, x2 = jnp.split(x, 2, axis=-1)
    c1, s1 = tab(pos_ids)
    c2, s2 = tab(block_ids)
    x1 = x1 * c1 + rotate_half(x1, interleaved=False) * s1
    x2 = x2 * c2 + rotate_half(x2, interleaved=False) * s2
    return jnp.concatenate([x1, x2], axis=-1)


def chatglm_forward(params, cfg: ChatGLMConfig, tokens, position_ids,
                    mask=None):
    """tokens: (b, s); position_ids: (b, 2, s) = [positions; block
    positions]; mask: optional (b, s, s) 0/1.  Returns logits."""
    b, s = tokens.shape
    n, hd = cfg.num_heads, cfg.head_dim
    alpha = (2 * cfg.num_layers) ** 0.5
    x = params["tok"][tokens]

    bias = None
    if mask is not None:
        bias = jnp.where(mask[:, None] > 0, 0.0, -10000.0)

    for li in range(cfg.num_layers):
        p = jax.tree.map(lambda t: t[li], params["layers"])
        y = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps=cfg.eps)
        qkv = y @ p["qkv"]["kernel"] + p["qkv"]["bias"]
        q, k, v = [t.reshape(b, s, n, hd) for t in jnp.split(qkv, 3, -1)]
        q = _rope_2d(q, position_ids[:, 0], position_ids[:, 1], hd)
        k = _rope_2d(k, position_ids[:, 0], position_ids[:, 1], hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, -1)
        attn = o @ p["dense"]["kernel"] + p["dense"]["bias"]
        # deepnorm-style post-LN: residual is the LAYERNORMED input * alpha
        x = y * alpha + attn
        y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps=cfg.eps)
        h = gelu_exact(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        h = h @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        x = y * alpha + h

    x = layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"],
                   eps=cfg.eps)
    return x @ params["lm_head"]["kernel"]


def chatglm_params_from_sat(sd, cfg: ChatGLMConfig):
    """Reference ChatGLMModel (SAT) state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers
    t = "transformer.layers.{}"

    def stack_lin(fmt):
        return {"kernel": np.stack([g(fmt.format(i) + ".weight").T for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)])}

    def stack_ln(fmt):
        return {"scale": np.stack([g(fmt.format(i) + ".weight") for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)])}

    return {
        "tok": g("transformer.word_embeddings.weight"),
        "layers": {
            "ln1": stack_ln(t + ".input_layernorm"),
            "qkv": stack_lin(t + ".attention.query_key_value"),
            "dense": stack_lin(t + ".attention.dense"),
            "ln2": stack_ln(t + ".post_attention_layernorm"),
            "fc1": stack_lin(t + ".mlp.dense_h_to_4h"),
            "fc2": stack_lin(t + ".mlp.dense_4h_to_h"),
        },
        "final_ln": {"scale": g("transformer.final_layernorm.weight"),
                     "bias": g("transformer.final_layernorm.bias")},
        "lm_head": {"kernel": g("mixins.chatglm-final.lm_head.weight").T},
    }
