"""ViT image classifier (reference: sat/model/official/vit_model.py —
patch embedding + cls token + learned positions, pre-LN blocks, cls head).

HF `ViTForImageClassification` weight naming (`vit_params_from_hf`);
golden-tested against transformers' ViT in tests/test_zoo_models.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    inner_hidden_size: int = 3072
    num_classes: int = 1000
    eps: float = 1e-12

    @property
    def head_dim(self):
        return self.dim // self.num_heads


def vit_forward(params, cfg: ViTConfig, images):
    """images: (b, 3, H, W) normalized -> logits (b, num_classes)."""
    n, hd = cfg.num_heads, cfg.head_dim
    x = jnp.transpose(images, (0, 2, 3, 1))
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"].astype(x.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.dim) + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None]

    def block(x, p):
        y = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps=cfg.eps)
        q = (y @ p["q"]["kernel"] + p["q"]["bias"]).reshape(b, -1, n, hd)
        k = (y @ p["k"]["kernel"] + p["k"]["bias"]).reshape(b, -1, n, hd)
        v = (y @ p["v"]["kernel"] + p["v"]["bias"]).reshape(b, -1, n, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, -1, cfg.dim)
        x = x + (o @ p["proj"]["kernel"] + p["proj"]["bias"])
        y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps=cfg.eps)
        y = gelu_exact(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        x = x + (y @ p["fc2"]["kernel"] + p["fc2"]["bias"])
        return x, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    x = layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"],
                   eps=cfg.eps)
    return x[:, 0] @ params["head"]["kernel"] + params["head"]["bias"]


def init_vit_params(key, cfg: ViTConfig):
    ks = iter(jax.random.split(key, 16))
    L, d, f = cfg.num_layers, cfg.dim, cfg.inner_hidden_size
    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1

    def lin(L_, din, dout):
        return {"kernel": 0.02 * jax.random.normal(next(ks), (L_, din, dout)),
                "bias": jnp.zeros((L_, dout))}

    def ln(L_, d_):
        return {"scale": jnp.ones((L_, d_)), "bias": jnp.zeros((L_, d_))}

    return {
        "patch_embed": {
            "kernel": 0.02 * jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, 3, d)),
            "bias": jnp.zeros((d,)),
        },
        "cls_token": 0.02 * jax.random.normal(next(ks), (1, d)),
        "pos_embed": 0.02 * jax.random.normal(next(ks), (n_tok, d)),
        "layers": {
            "ln1": ln(L, d), "ln2": ln(L, d),
            "q": lin(L, d, d), "k": lin(L, d, d), "v": lin(L, d, d),
            "proj": lin(L, d, d), "fc1": lin(L, d, f), "fc2": lin(L, f, d),
        },
        "ln_f": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "head": {"kernel": 0.02 * jax.random.normal(next(ks), (d, cfg.num_classes)),
                 "bias": jnp.zeros((cfg.num_classes,))},
    }


def vit_params_from_hf(sd, cfg: ViTConfig):
    """HF ViTForImageClassification state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers
    e = "vit.encoder.layer.{}"

    def stack_lin(fmt):
        return {"kernel": np.stack([g(fmt.format(i) + ".weight").T
                                    for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias")
                                  for i in range(L)])}

    def stack_ln(fmt):
        return {"scale": np.stack([g(fmt.format(i) + ".weight")
                                   for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias")
                                  for i in range(L)])}

    return {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                g("vit.embeddings.patch_embeddings.projection.weight")
                .transpose(2, 3, 1, 0)),
            "bias": g("vit.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": g("vit.embeddings.cls_token")[0],
        "pos_embed": g("vit.embeddings.position_embeddings")[0],
        "layers": {
            "ln1": stack_ln(e + ".layernorm_before"),
            "ln2": stack_ln(e + ".layernorm_after"),
            "q": stack_lin(e + ".attention.attention.query"),
            "k": stack_lin(e + ".attention.attention.key"),
            "v": stack_lin(e + ".attention.attention.value"),
            "proj": stack_lin(e + ".attention.output.dense"),
            "fc1": stack_lin(e + ".intermediate.dense"),
            "fc2": stack_lin(e + ".output.dense"),
        },
        "ln_f": {"scale": g("vit.layernorm.weight"),
                 "bias": g("vit.layernorm.bias")},
        "head": {"kernel": g("classifier.weight").T,
                 "bias": g("classifier.bias")},
    }
