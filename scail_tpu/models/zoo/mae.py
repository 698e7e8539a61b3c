"""Masked-autoencoder ViT (reference: sat/model/official/mae_model.py —
MAEEncoder(ViTModel) with random_masking (mae_model.py:57-83), MAEDecoder
with mask-token insertion + ids_restore un-shuffle (MaskMixin,
mae_model.py:98-122), composed as an EncoderDecoderModel
(mae_model.py:135-167)).

Functional JAX rebuild over the zoo ViT block; weight ingestion uses the
HF `ViTMAEForPreTraining` naming (`mae_params_from_hf`) and is
golden-tested against transformers with a shared explicit noise tensor
(tests/test_zoo_models.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    inner_hidden_size: int = 3072
    decoder_dim: int = 512
    decoder_num_heads: int = 16
    decoder_num_layers: int = 8
    decoder_inner_hidden_size: int = 2048
    mask_ratio: float = 0.75
    eps: float = 1e-12

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2


def _block(x, p, num_heads, eps):
    """Pre-LN ViT block (shared by encoder and decoder)."""
    b, s, d = x.shape
    hd = d // num_heads
    y = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps=eps)
    q = (y @ p["q"]["kernel"] + p["q"]["bias"]).reshape(b, s, num_heads, hd)
    k = (y @ p["k"]["kernel"] + p["k"]["bias"]).reshape(b, s, num_heads, hd)
    v = (y @ p["v"]["kernel"] + p["v"]["bias"]).reshape(b, s, num_heads, hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, d)
    x = x + (o @ p["proj"]["kernel"] + p["proj"]["bias"])
    y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps=eps)
    h = gelu_exact(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    return x + (h @ p["fc2"]["kernel"] + p["fc2"]["bias"])


def random_masking(x, noise, mask_ratio):
    """Per-sample shuffle-mask (mae_model.py:57-83 == HF random_masking).

    x: (b, N, d); noise: (b, N) -> (kept (b, len_keep, d), mask (b, N)
    with 1=removed, ids_restore (b, N))."""
    b, N, d = x.shape
    len_keep = int(N * (1 - mask_ratio))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    kept = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((b, N))
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return kept, mask, ids_restore


def mae_encode(params, cfg: MAEConfig, images, noise):
    """images: (b, C, H, W); noise: (b, num_patches) in [0,1).
    Returns (latent (b, 1+len_keep, d), mask, ids_restore)."""
    x = jnp.transpose(images, (0, 2, 3, 1))
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"].astype(x.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.dim) + params["patch_embed"]["bias"]
    x = x + params["pos_embed"][None, 1:]
    x, mask, ids_restore = random_masking(x, noise, cfg.mask_ratio)
    cls = params["cls_token"] + params["pos_embed"][:1]
    x = jnp.concatenate([jnp.broadcast_to(cls[None], (b, 1, cfg.dim)), x], 1)
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda p: p[li], params["layers"])
        x = _block(x, lp, cfg.num_heads, cfg.eps)
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"],
                   eps=cfg.eps)
    return x, mask, ids_restore


def mae_decode(params, cfg: MAEConfig, latent, ids_restore):
    """latent: (b, 1+len_keep, d) -> patch-pixel logits
    (b, num_patches, patch^2*C) (MaskMixin.word_embedding_forward
    un-shuffle, mae_model.py:104-116)."""
    dp = params["decoder"]
    b = latent.shape[0]
    x = latent @ dp["embed"]["kernel"] + dp["embed"]["bias"]
    N = ids_restore.shape[1]
    n_mask = N + 1 - x.shape[1]
    mask_tokens = jnp.broadcast_to(
        dp["mask_token"][None], (b, n_mask, cfg.decoder_dim))
    x_ = jnp.concatenate([x[:, 1:], mask_tokens], axis=1)
    x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
    x = jnp.concatenate([x[:, :1], x_], axis=1)
    x = x + dp["pos_embed"][None]
    for li in range(cfg.decoder_num_layers):
        lp = jax.tree.map(lambda p: p[li], dp["layers"])
        x = _block(x, lp, cfg.decoder_num_heads, cfg.eps)
    x = layer_norm(x, dp["norm"]["scale"], dp["norm"]["bias"], eps=cfg.eps)
    x = x @ dp["pred"]["kernel"] + dp["pred"]["bias"]
    return x[:, 1:]  # drop cls


def mae_forward(params, cfg: MAEConfig, images, noise):
    """Full pretraining forward: returns (logits, mask, ids_restore)."""
    latent, mask, ids_restore = mae_encode(params, cfg, images, noise)
    return mae_decode(params, cfg, latent, ids_restore), mask, ids_restore


def mae_loss(params, cfg: MAEConfig, images, noise, norm_pix: bool = False):
    """Mean per-patch L2 on removed patches (mae_model.py MAE training
    objective / HF ViTMAEForPreTraining.forward_loss)."""
    logits, mask, _ = mae_forward(params, cfg, images, noise)
    p = cfg.patch_size
    b, C, H, W = images.shape
    t = images.reshape(b, C, H // p, p, W // p, p)
    target = jnp.einsum("bchpwq->bhwpqc", t).reshape(b, -1, p * p * C)
    if norm_pix:
        mu = target.mean(-1, keepdims=True)
        var = target.var(-1, keepdims=True)
        target = (target - mu) / jnp.sqrt(var + 1e-6)
    per_patch = jnp.mean((logits - target) ** 2, axis=-1)
    return jnp.sum(per_patch * mask) / jnp.sum(mask)


def _stack_layers(g, prefix, L):
    def w(fmt, i):
        return g(fmt.format(i))

    return {
        "ln1": {"scale": np.stack([w(prefix + ".{}.layernorm_before.weight", i) for i in range(L)]),
                "bias": np.stack([w(prefix + ".{}.layernorm_before.bias", i) for i in range(L)])},
        "q": {"kernel": np.stack([w(prefix + ".{}.attention.attention.query.weight", i).T for i in range(L)]),
              "bias": np.stack([w(prefix + ".{}.attention.attention.query.bias", i) for i in range(L)])},
        "k": {"kernel": np.stack([w(prefix + ".{}.attention.attention.key.weight", i).T for i in range(L)]),
              "bias": np.stack([w(prefix + ".{}.attention.attention.key.bias", i) for i in range(L)])},
        "v": {"kernel": np.stack([w(prefix + ".{}.attention.attention.value.weight", i).T for i in range(L)]),
              "bias": np.stack([w(prefix + ".{}.attention.attention.value.bias", i) for i in range(L)])},
        "proj": {"kernel": np.stack([w(prefix + ".{}.attention.output.dense.weight", i).T for i in range(L)]),
                 "bias": np.stack([w(prefix + ".{}.attention.output.dense.bias", i) for i in range(L)])},
        "ln2": {"scale": np.stack([w(prefix + ".{}.layernorm_after.weight", i) for i in range(L)]),
                "bias": np.stack([w(prefix + ".{}.layernorm_after.bias", i) for i in range(L)])},
        "fc1": {"kernel": np.stack([w(prefix + ".{}.intermediate.dense.weight", i).T for i in range(L)]),
                "bias": np.stack([w(prefix + ".{}.intermediate.dense.bias", i) for i in range(L)])},
        "fc2": {"kernel": np.stack([w(prefix + ".{}.output.dense.weight", i).T for i in range(L)]),
                "bias": np.stack([w(prefix + ".{}.output.dense.bias", i) for i in range(L)])},
    }


def mae_params_from_hf(sd, cfg: MAEConfig):
    """HF ViTMAEForPreTraining state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    conv_w = g("vit.embeddings.patch_embeddings.projection.weight")
    return {
        "patch_embed": {
            "kernel": conv_w.transpose(2, 3, 1, 0),  # OIHW -> HWIO
            "bias": g("vit.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": g("vit.embeddings.cls_token")[0],
        "pos_embed": g("vit.embeddings.position_embeddings")[0],
        "layers": _stack_layers(g, "vit.encoder.layer", cfg.num_layers),
        "norm": {"scale": g("vit.layernorm.weight"),
                 "bias": g("vit.layernorm.bias")},
        "decoder": {
            "embed": {"kernel": g("decoder.decoder_embed.weight").T,
                      "bias": g("decoder.decoder_embed.bias")},
            "mask_token": g("decoder.mask_token")[0, 0],
            "pos_embed": g("decoder.decoder_pos_embed")[0],
            "layers": _stack_layers(g, "decoder.decoder_layers",
                                    cfg.decoder_num_layers),
            "norm": {"scale": g("decoder.decoder_norm.weight"),
                     "bias": g("decoder.decoder_norm.bias")},
            "pred": {"kernel": g("decoder.decoder_pred.weight").T,
                     "bias": g("decoder.decoder_pred.bias")},
        },
    }
