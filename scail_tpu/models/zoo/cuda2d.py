"""CogView cuda2d two-level super-resolution LM (reference:
sat/model/official/cuda2d_model.py).

The reference finetunes a frozen base GPT with an extra token level:
the sequence is [text + level-0 image tokens (layout[1]) | level-1
image tokens (layout[2]-layout[1])].  Per layer it runs

  * dense masked attention over level 0 with the base qkv
    (sparse_attention_2d_light, cuda2d_model.py:168-177; masking is the
    reference's exact `scores * mask - 10000 * (1 - mask)` form)
  * 2D local attention for level 1 with a per-layer qkv added by
    AttentionMixin (cuda2d_model.py:41-70): causal (2k-1, k) window
    over its own l1 x l1 grid plus a non-causal k2 x k2
    cross-resolution window over the last l0^2 level-0 tokens, one
    softmax over the concatenated [cross, self] fields
    (cuda2d_model.py:179-212)
  * outputs re-projected separately (base dense / mixin dense_plus)
    and concatenated along the sequence

Absolute position embeddings come from the base table for the first
layout[1] positions and from PositionEmbeddingMixin's extra table for
the rest (cuda2d_model.py:89-99).  The local-attention primitives live
in scail_tpu/ops/local_attn_2d.py (the CUDA ext rebuilt as
gather-einsum).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import dense, dense_init, gelu_tanh, normal_init
from scail_tpu.ops.local_attn_2d import f_similar, f_weighting
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class Cuda2dConfig:
    vocab_size: int = 50048
    dim: int = 64
    num_heads: int = 4
    num_layers: int = 2
    max_len: int = 1089                  # base position table
    new_sequence_length: int = 5185
    layout: Tuple[int, int, int] = (64, 1088, 5184)
    kernel_size: int = 9
    kernel_size2: int = 7
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    @property
    def l0(self):
        return int(math.isqrt(self.layout[1] - self.layout[0]))

    @property
    def l1(self):
        return int(math.isqrt(self.layout[2] - self.layout[1]))


def init_cuda2d_params(key, cfg: Cuda2dConfig):
    L, d = cfg.num_layers, cfg.dim
    ks = iter(jax.random.split(key, 12))
    ln = lambda: {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))}
    return {
        "tok": normal_init(next(ks), (cfg.vocab_size, d)),
        "pos": normal_init(next(ks), (cfg.max_len, d)),
        "pos_plus": normal_init(
            next(ks), (cfg.new_sequence_length - cfg.max_len, d)),
        "layers": {
            "ln1": ln(),
            "qkv": dense_init(next(ks), d, 3 * d, prefix_shape=(L,)),
            "dense": dense_init(next(ks), d, d, prefix_shape=(L,)),
            "qkv_plus": dense_init(next(ks), d, 3 * d, prefix_shape=(L,)),
            "dense_plus": dense_init(next(ks), d, d, prefix_shape=(L,)),
            "ln2": ln(),
            "fc1": dense_init(next(ks), d, 4 * d, prefix_shape=(L,)),
            "fc2": dense_init(next(ks), 4 * d, d, prefix_shape=(L,)),
        },
        "ln_f": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }


def _to_grid(x, side):
    """(b, s, n, hd) seq-raster -> (b*n, hd, side, side)."""
    b, s, n, hd = x.shape
    return (x.transpose(0, 2, 3, 1)
            .reshape(b * n, hd, side, side))


def sparse_attention_2d(q0, k0, v0, q1, k1, v1, mask, cfg: Cuda2dConfig):
    """The reference's sparse_attention_2d_light (cuda2d_model.py:151-213)
    on (b, s, n, hd) tensors.  Returns (context0 (b, s0, d),
    context1 (b, s1, d))."""
    b, s0, n, hd = q0.shape
    s1 = q1.shape[1]
    l0, l1 = cfg.l0, cfg.l1
    k, k2 = cfg.kernel_size, cfg.kernel_size2
    scale = 1.0 / math.sqrt(hd)

    # level 0: dense attention, exact reference masking arithmetic
    scores0 = jnp.einsum("bqnd,bknd->bnqk", q0 * scale, k0,
                         preferred_element_type=jnp.float32)
    scores0 = scores0 * mask[:, None] - 10000.0 * (1.0 - mask[:, None])
    probs0 = jax.nn.softmax(scores0, axis=-1).astype(v0.dtype)
    ctx0 = jnp.einsum("bnqk,bknd->bqnd", probs0, v0).reshape(b, s0, n * hd)

    # level 1: local self window (causal) + cross-resolution window over
    # the image part of level 0
    q1g = _to_grid(q1 * scale, l1)
    k1g = _to_grid(k1, l1)
    v1g = _to_grid(v1, l1)
    k0g = _to_grid(k0[:, -l0 * l0:], l0)
    v0g = _to_grid(v0[:, -l0 * l0:], l0)

    s_self = f_similar(q1g, k1g, 2 * k - 1, k, causal=True)
    s_cross = f_similar(q1g, k0g, k2, k2, causal=False)
    flat = lambda t: t.reshape(b * n, l1 * l1, t.shape[-1])
    probs1 = jax.nn.softmax(
        jnp.concatenate([flat(s_cross), flat(s_self)], axis=-1), axis=-1)
    p_cross = probs1[..., : s_cross.shape[-1]].reshape(s_cross.shape)
    p_self = probs1[..., s_cross.shape[-1]:].reshape(s_self.shape)
    ctx1 = (f_weighting(v1g, p_self, 2 * k - 1, k, causal=True)
            + f_weighting(v0g, p_cross, k2, k2, causal=False))
    ctx1 = ctx1.reshape(b, n * hd, s1).transpose(0, 2, 1)
    return ctx0, ctx1


def cuda2d_forward(params, cfg: Cuda2dConfig, tokens, position_ids, mask):
    """tokens/position_ids: (b, layout[2]); mask: (b, s0, s0) 0/1 for
    level 0 (text+image causal structure).  Returns hidden states after
    the final LN projected on the tied embedding (b, s, vocab)."""
    b, s = tokens.shape
    s0 = cfg.layout[1]
    n, hd = cfg.num_heads, cfg.head_dim

    pos_emb = jnp.concatenate([
        params["pos"][position_ids[:, :s0]],
        params["pos_plus"][position_ids[:, s0:]],
    ], axis=1)
    x = params["tok"][tokens] + pos_emb

    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda p: p[li], params["layers"])
        y = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps=cfg.eps)
        h0, h1 = y[:, :s0], y[:, s0:]
        qkv0 = dense(lp["qkv"], h0)
        q0, k0, v0 = [t.reshape(b, s0, n, hd)
                      for t in jnp.split(qkv0, 3, -1)]
        qkv1 = dense(lp["qkv_plus"], h1)
        q1, k1, v1 = [t.reshape(b, s - s0, n, hd)
                      for t in jnp.split(qkv1, 3, -1)]
        ctx0, ctx1 = sparse_attention_2d(q0, k0, v0, q1, k1, v1, mask, cfg)
        attn = jnp.concatenate(
            [dense(lp["dense"], ctx0), dense(lp["dense_plus"], ctx1)], axis=1)
        x = x + attn
        y = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps=cfg.eps)
        x = x + dense(lp["fc2"], gelu_tanh(dense(lp["fc1"], y)))

    x = layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"],
                   eps=cfg.eps)
    return x @ params["tok"].T


def cuda2d_params_from_sat(sd, cfg: Cuda2dConfig):
    """Reference Cuda2dModel state dict -> pytree (base transformer +
    'extra_position_embedding'/'attention_plus' mixins)."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers
    t = "transformer.layers.{}"

    def stack_lin(fmt):
        return {"kernel": np.stack(
            [g(fmt.format(i) + ".weight").T for i in range(L)]),
            "bias": np.stack([g(fmt.format(i) + ".bias")
                              for i in range(L)])}

    def stack_ln(fmt):
        return {"scale": np.stack([g(fmt.format(i) + ".weight")
                                   for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias")
                                  for i in range(L)])}

    return {
        "tok": g("transformer.word_embeddings.weight"),
        "pos": g("transformer.position_embeddings.weight"),
        "pos_plus": g(
            "mixins.extra_position_embedding.position_embeddings.weight"),
        "layers": {
            "ln1": stack_ln(t + ".input_layernorm"),
            "qkv": stack_lin(t + ".attention.query_key_value"),
            "dense": stack_lin(t + ".attention.dense"),
            "qkv_plus": stack_lin("mixins.attention_plus.query_key_value.{}"),
            "dense_plus": stack_lin("mixins.attention_plus.dense.{}"),
            "ln2": stack_ln(t + ".post_attention_layernorm"),
            "fc1": stack_lin(t + ".mlp.dense_h_to_4h"),
            "fc2": stack_lin(t + ".mlp.dense_4h_to_h"),
        },
        "ln_f": {"scale": g("transformer.final_layernorm.weight"),
                 "bias": g("transformer.final_layernorm.bias")},
    }
