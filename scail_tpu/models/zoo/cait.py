"""CaiT — Class-Attention in Image Transformers (reference:
sat/model/official/cait_model.py).

Encoder: ViT blocks with talking-heads attention (per-layer head-mixing
linears before and after the softmax, AttnMixin cait_model.py:10-52) and
LayerScale residuals (EncForward, :53-78).  Decoder: class-attention
stages — the class token queries the concatenation [cls | patch tokens]
through the layer's cross-attention, again LayerScale-gated (DecForward,
:82-148) — followed by a final layernorm and a linear classifier
(ClsMixin).

Golden-tested against the reference's own torch module via
tests/refmods.py (tests/test_zoo_models_ref.py); the converter reads the
SAT EncoderDecoderModel state-dict naming, including the fused
query_key_value layout (mp=1: contiguous [q|k|v]).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class CaiTConfig:
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    dim: int = 192
    num_heads: int = 4
    num_layers: int = 24
    dec_num_layers: int = 2
    inner_hidden_size: int = 768
    num_classes: int = 1000
    eps: float = 1e-6

    @property
    def head_dim(self):
        return self.dim // self.num_heads


def _talking_heads_attn(y, p, n, hd, eps):
    """SAT SelfAttention with AttnMixin's head-mixing projections
    (cait_model.py:17-45): scores -> proj_l -> softmax -> proj_w."""
    b, s, d = y.shape
    qkv = y @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    q, k, v = [t.reshape(b, s, n, hd) for t in jnp.split(qkv, 3, axis=-1)]
    s_ = jnp.einsum("bqnd,bknd->bnqk", q * (hd ** -0.5), k,
                    preferred_element_type=jnp.float32)
    # proj_l: linear over the HEADS axis, before softmax
    s_ = jnp.einsum("bnqk,nm->bmqk", s_, p["proj_l"]["kernel"]) \
        + p["proj_l"]["bias"][None, :, None, None]
    probs = jax.nn.softmax(s_, axis=-1)
    probs = jnp.einsum("bnqk,nm->bmqk", probs, p["proj_w"]["kernel"]) \
        + p["proj_w"]["bias"][None, :, None, None]
    o = jnp.einsum("bnqk,bknd->bqnd", probs.astype(v.dtype), v)
    return o.reshape(b, s, d) @ p["dense"]["kernel"] + p["dense"]["bias"]


def cait_forward(params, cfg: CaiTConfig, images):
    """images: (b, C, H, W) -> class logits (b, num_classes)."""
    n, hd = cfg.num_heads, cfg.head_dim
    x = jnp.transpose(images, (0, 2, 3, 1))
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"].astype(x.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.dim) + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["enc_cls"][None], (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["enc_pos"][None]

    for li in range(cfg.num_layers):
        p = jax.tree.map(lambda t: t[li], params["enc_layers"])
        y = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps=cfg.eps)
        attn = _talking_heads_attn(y, p, n, hd, cfg.eps)
        x = x + p["gamma1"] * attn                     # LayerScale
        y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps=cfg.eps)
        h = gelu_exact(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        h = h @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        x = x + p["gamma2"] * h

    # class-attention decoder (DecForward): cls queries [cls | enc tokens]
    h = jnp.broadcast_to(params["dec_cls"][None], (b, 1, cfg.dim))
    for li in range(cfg.dec_num_layers):
        p = jax.tree.map(lambda t: t[li], params["dec_layers"])
        u = jnp.concatenate([h, x], axis=1)
        y = layer_norm(u, p["ln1"]["scale"], p["ln1"]["bias"], eps=cfg.eps)
        q = (y[:, :1] @ p["q"]["kernel"] + p["q"]["bias"]).reshape(b, 1, n, hd)
        kv = y @ p["kv"]["kernel"] + p["kv"]["bias"]
        k, v = [t.reshape(b, -1, n, hd) for t in jnp.split(kv, 2, axis=-1)]
        s_ = jnp.einsum("bqnd,bknd->bnqk", q * (hd ** -0.5), k,
                        preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(s_, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, 1, cfg.dim)
        attn = o @ p["dense"]["kernel"] + p["dense"]["bias"]
        h = h + p["gamma1"] * attn
        y = layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"], eps=cfg.eps)
        m = gelu_exact(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        m = m @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        h = h + p["gamma2"] * m

    h = layer_norm(h, params["dec_final_ln"]["scale"],
                   params["dec_final_ln"]["bias"], eps=cfg.eps)
    return h[:, 0] @ params["classifier"]["kernel"] + params["classifier"]["bias"]


def cait_params_from_sat(sd, cfg: CaiTConfig):
    """Reference CaiT (SAT EncoderDecoderModel) state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    Le, Ld = cfg.num_layers, cfg.dec_num_layers
    enc = "encoder.transformer.layers.{}"
    dec = "decoder.transformer.layers.{}"

    def lin(key):
        return {"kernel": g(key + ".weight").T, "bias": g(key + ".bias")}

    def stack_lin(fmt, L):
        return {"kernel": np.stack([g(fmt.format(i) + ".weight").T for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)])}

    def stack_ln(fmt, L):
        return {"scale": np.stack([g(fmt.format(i) + ".weight") for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)])}

    def stack_param(fmt, L):
        return np.stack([g(fmt.format(i)) for i in range(L)])

    conv_w = g("encoder.mixins.patch_embedding.proj.weight")
    return {
        "patch_embed": {"kernel": conv_w.transpose(2, 3, 1, 0),
                        "bias": g("encoder.mixins.patch_embedding.proj.bias")},
        "enc_cls": g("encoder.transformer.word_embeddings.weight")[:1],
        "enc_pos": g("encoder.transformer.position_embeddings.weight"),
        "enc_layers": {
            "ln1": stack_ln(enc + ".input_layernorm", Le),
            "qkv": stack_lin(enc + ".attention.query_key_value", Le),
            "dense": stack_lin(enc + ".attention.dense", Le),
            "proj_l": stack_lin("encoder.mixins.attn.proj_l.{}", Le),
            "proj_w": stack_lin("encoder.mixins.attn.proj_w.{}", Le),
            "ln2": stack_ln(enc + ".post_attention_layernorm", Le),
            "fc1": stack_lin(enc + ".mlp.dense_h_to_4h", Le),
            "fc2": stack_lin(enc + ".mlp.dense_4h_to_h", Le),
            "gamma1": stack_param("encoder.mixins.enc_forward.gamma_1.{}", Le),
            "gamma2": stack_param("encoder.mixins.enc_forward.gamma_2.{}", Le),
        },
        "dec_cls": g("decoder.transformer.word_embeddings.weight")[:1],
        "dec_layers": {
            "ln1": stack_ln(dec + ".input_layernorm", Ld),
            "q": stack_lin(dec + ".cross_attention.query", Ld),
            "kv": stack_lin(dec + ".cross_attention.key_value", Ld),
            "dense": stack_lin(dec + ".cross_attention.dense", Ld),
            "ln2": stack_ln(dec + ".post_cross_attention_layernorm", Ld),
            "fc1": stack_lin(dec + ".mlp.dense_h_to_4h", Ld),
            "fc2": stack_lin(dec + ".mlp.dense_4h_to_h", Ld),
            "gamma1": stack_param("decoder.mixins.dec_forward.gamma_1.{}", Ld),
            "gamma2": stack_param("decoder.mixins.dec_forward.gamma_2.{}", Ld),
        },
        "dec_final_ln": {"scale": g("decoder.transformer.final_layernorm.weight"),
                         "bias": g("decoder.transformer.final_layernorm.bias")},
        "classifier": lin("decoder.mixins.cls.classifier"),
    }
