"""EVA-02 vision encoder (reference: sat/model/official/eva2_model.py —
masked patch embedding with mask-token substitution (:8-35), 2D vision
rotary on patch tokens with the cls token passed through
(EVA2AttnMixin :76-123 + VisionRotaryEmbeddingFast,
sat/model/position_embedding/vision_rotary_embeddings.py:95-135),
SwiGLU MLP with a sub-layernorm on the gated hidden (:48-70), learned
absolute positions, and a feature-prediction head over the patch tokens
(:37-46)).

Golden-tested against the reference's own torch module via
tests/refmods.py (tests/test_zoo_models_ref.py); the converter reads the
SAT naming including the fused query_key_value layout (mp=1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.ops.norms import layer_norm
from scail_tpu.ops.rotary import rotate_half


@dataclasses.dataclass(frozen=True)
class EVA2Config:
    image_size: int = 224
    patch_size: int = 14
    in_channels: int = 3
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    inner_hidden_size: int = 2048
    predict_feature_dim: int = 768
    eps: float = 1e-6

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    @property
    def grid(self):
        return self.image_size // self.patch_size


def _vision_rope_tables(cfg: EVA2Config):
    """VisionRotaryEmbeddingFast tables: per-axis interleaved freqs of
    length head_dim/2 each, broadcast-concatenated over the (h, w) grid
    -> (grid*grid, head_dim)."""
    dim = cfg.head_dim // 2            # rope 'dim' = half_head_dim
    n = cfg.grid
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))
    t = np.arange(n, dtype=np.float32)
    ang = np.repeat(np.outer(t, freqs), 2, axis=-1)       # (n, dim)
    full = np.concatenate([
        np.broadcast_to(ang[:, None, :], (n, n, dim)),
        np.broadcast_to(ang[None, :, :], (n, n, dim)),
    ], axis=-1).reshape(n * n, 2 * dim)                   # (S, head_dim)
    return jnp.asarray(np.cos(full)), jnp.asarray(np.sin(full))


def eva2_forward(params, cfg: EVA2Config, images, bool_masked_pos=None):
    """images: (b, C, H, W) -> predicted features (b, num_patches,
    predict_feature_dim).  bool_masked_pos (b, num_patches) substitutes
    the mask token (MaskedPatchEmbedMixin)."""
    n, hd = cfg.num_heads, cfg.head_dim
    x = jnp.transpose(images, (0, 2, 3, 1))
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"].astype(x.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.dim) + params["patch_embed"]["bias"]
    if bool_masked_pos is not None:
        w = bool_masked_pos[..., None].astype(x.dtype)
        x = x * (1 - w) + params["mask_token"][None, None] * w
    cls = jnp.broadcast_to(params["cls"][None], (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"][None]

    cos, sin = _vision_rope_tables(cfg)
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]

    for li in range(cfg.num_layers):
        p = jax.tree.map(lambda t: t[li], params["layers"])
        y = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps=cfg.eps)
        qkv = y @ p["qkv"]["kernel"] + p["qkv"]["bias"]
        q, k, v = [t.reshape(b, -1, n, hd) for t in jnp.split(qkv, 3, -1)]
        # 2D rope on patch tokens; cls (index 0) passes through
        q = jnp.concatenate(
            [q[:, :1], q[:, 1:] * cos + rotate_half(q[:, 1:], True) * sin], 1)
        k = jnp.concatenate(
            [k[:, :1], k[:, 1:] * cos + rotate_half(k[:, 1:], True) * sin], 1)
        s = jnp.einsum("bqnd,bknd->bnqk", q * (hd ** -0.5), k,
                       preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, -1, cfg.dim)
        x = x + (o @ p["dense"]["kernel"] + p["dense"]["bias"])
        y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps=cfg.eps)
        # SwiGLU with sub-LN on the gated hidden (SwiGLUMixin)
        h = jax.nn.silu(y @ p["w1"]["kernel"] + p["w1"]["bias"]) \
            * (y @ p["w2"]["kernel"] + p["w2"]["bias"])
        h = layer_norm(h, p["ffn_ln"]["scale"], p["ffn_ln"]["bias"], eps=cfg.eps)
        x = x + (h @ p["w3"]["kernel"] + p["w3"]["bias"])

    x = layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"],
                   eps=cfg.eps)
    x = x[:, 1:]  # drop cls (EVA2FinalMixin)
    return x @ params["head"]["kernel"] + params["head"]["bias"]


def eva2_params_from_sat(sd, cfg: EVA2Config):
    """Reference EVA2Model (SAT) state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers
    t = "transformer.layers.{}"

    def stack_lin(fmt):
        return {"kernel": np.stack([g(fmt.format(i) + ".weight").T for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)])}

    def stack_ln(fmt):
        return {"scale": np.stack([g(fmt.format(i) + ".weight") for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)])}

    conv_w = g("mixins.patch_embedding.proj.weight")
    return {
        "patch_embed": {"kernel": conv_w.transpose(2, 3, 1, 0),
                        "bias": g("mixins.patch_embedding.proj.bias")},
        "mask_token": g("mixins.patch_embedding.mask_token")[0, 0],
        "cls": g("transformer.word_embeddings.weight")[:1],
        "pos": g("transformer.position_embeddings.weight"),
        "layers": {
            "ln1": stack_ln(t + ".input_layernorm"),
            "qkv": stack_lin(t + ".attention.query_key_value"),
            "dense": stack_lin(t + ".attention.dense"),
            "ln2": stack_ln(t + ".post_attention_layernorm"),
            "w1": stack_lin(t + ".mlp.dense_h_to_4h"),
            "w2": stack_lin("mixins.eva2-mlp.w2.{}"),
            "ffn_ln": stack_ln("mixins.eva2-mlp.ffn_ln.{}"),
            "w3": stack_lin(t + ".mlp.dense_4h_to_h"),
        },
        "final_ln": {"scale": g("transformer.final_layernorm.weight"),
                     "bias": g("transformer.final_layernorm.bias")},
        "head": {"kernel": g("mixins.eva2-final.lm_head.weight").T,
                 "bias": g("mixins.eva2-final.lm_head.bias")},
    }
