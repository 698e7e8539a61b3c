"""GLM-130B (reference: sat/model/official/glm130B_model.py — deepnorm
residuals on the layernormed input with alpha=(2L)^0.5
(DeepNormWithGLUMixin :95-148), GEGLU MLP (x1 * gelu(x2), :83-92),
rotary positions (2D pos/block-pos split or full-head 1D,
RotaryEmbeddingMixin :12-80), per-head-fused qkv layout, fp32 softmax
with per-layer scaling (mathematically plain 1/sqrt(hd) — the
(layer_id+1) coefficient cancels through the softmax and exists only
for fp16 range), tied LM head).

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
class GLM130BConfig:
    vocab_size: int = 150528
    dim: int = 12288
    num_heads: int = 96
    num_layers: int = 70
    inner_hidden_size: int = 32768
    position_encoding_2d: bool = True
    glu: bool = True
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads


def _rope_index(x, ids, rot_dim):
    """Non-interleaved GPT-NeoX rotary over the first rot_dim of x's last
    axis, angles indexed by per-token ids (apply_rotary_pos_emb_index)."""
    inv = 1.0 / (10000.0 ** (
        jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    ang = ids[..., None].astype(jnp.float32) * inv      # (b, s, rot/2)
    emb = jnp.concatenate([ang, ang], axis=-1)[:, :, None]  # (b, s, 1, rot)
    return x * jnp.cos(emb) + rotate_half(x, interleaved=False) * jnp.sin(emb)


def glm130b_forward(params, cfg: GLM130BConfig, tokens, position_ids,
                    mask=None):
    """tokens: (b, s); position_ids: (b, 2, s) when position_encoding_2d
    else (b, s); mask: optional (b, s, s) 0/1.  Returns logits tied to
    the word embedding."""
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
        if cfg.position_encoding_2d:
            half = hd // 2
            q = jnp.concatenate(
                [_rope_index(q[..., :half], position_ids[:, 0], half),
                 _rope_index(q[..., half:], position_ids[:, 1], half)], -1)
            k = jnp.concatenate(
                [_rope_index(k[..., :half], position_ids[:, 0], half),
                 _rope_index(k[..., half:], position_ids[:, 1], half)], -1)
        else:
            q = _rope_index(q, position_ids, hd)
            k = _rope_index(k, position_ids, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, -1)
        attn = o @ p["dense"]["kernel"] + p["dense"]["bias"]
        x = y * alpha + attn                                # deepnorm
        y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps=cfg.eps)
        h = y @ p["fc1"]["kernel"] + p["fc1"]["bias"]
        if cfg.glu:
            h1, h2 = jnp.split(h, 2, axis=-1)
            h = h1 * gelu_exact(h2)                         # GEGLU
        else:
            h = gelu_exact(h)
        h = h @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        x = y * alpha + h

    x = layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"],
                   eps=cfg.eps)
    return x @ params["tok"].T


def glm130b_params_from_sat(sd, cfg: GLM130BConfig):
    """Reference GLM130B (SAT) state dict -> pytree.  The fused qkv is in
    per-head [q_h|k_h|v_h] blocks (glm130B_model.py:44-53), unlike the
    contiguous [q|k|v] of the other SAT models."""
    g = lambda k: np.asarray(sd[k])
    L, n, hd, d = cfg.num_layers, cfg.num_heads, cfg.head_dim, cfg.dim
    t = "transformer.layers.{}"

    def qkv_perhead(i):
        w = g(t.format(i) + ".attention.query_key_value.weight")  # (3d, in)
        bsz = g(t.format(i) + ".attention.query_key_value.bias")
        w = w.reshape(n, 3, hd, -1)
        bsz = bsz.reshape(n, 3, hd)
        wk = np.concatenate([w[:, j].reshape(d, -1) for j in range(3)], 0)
        bk = np.concatenate([bsz[:, j].reshape(d) for j in range(3)], 0)
        return wk.T, bk

    ws, bs = zip(*[qkv_perhead(i) for i in range(L)])

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
            "qkv": {"kernel": np.stack(ws), "bias": np.stack(bs)},
            "dense": stack_lin(t + ".attention.dense"),
            "ln2": stack_ln(t + ".post_attention_layernorm"),
            "fc1": stack_lin(t + ".mlp.dense_h_to_4h"),
            "fc2": stack_lin(t + ".mlp.dense_4h_to_h"),
        },
        "final_ln": {"scale": g("transformer.final_layernorm.weight"),
                     "bias": g("transformer.final_layernorm.bias")},
    }
