"""EVA2-CLIP vision tower (reference: sat/model/official/
eva_clip_model.py — a ViT whose blocks normalize the SUBLAYER OUTPUT
before the residual add (NewLayerForward :58-104: x = x + LN(attn(x));
x = x + LN(mlp(x))), cls + patches with learned positions, identity
final (returns hidden states)).

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


@dataclasses.dataclass(frozen=True)
class EVACLIPConfig:
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    inner_hidden_size: int = 4096
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads


def evaclip_forward(params, cfg: EVACLIPConfig, images):
    """images: (b, C, H, W) -> patch hidden states (b, num_patches, d):
    final layernorm then the cls token dropped (the misleadingly named
    IdentityMixin is `logits[:, 1:]`, eva_clip_model.py:8-13)."""
    n, hd = cfg.num_heads, cfg.head_dim
    x = jnp.transpose(images, (0, 2, 3, 1))
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"].astype(x.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.dim) + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls"][None], (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"][None]
    s = x.shape[1]

    for li in range(cfg.num_layers):
        p = jax.tree.map(lambda t: t[li], params["layers"])
        qkv = x @ p["qkv"]["kernel"] + p["qkv"]["bias"]
        q, k, v = [t.reshape(b, s, n, hd) for t in jnp.split(qkv, 3, -1)]
        logits = jnp.einsum("bqnd,bknd->bnqk", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, -1)
        attn = o @ p["dense"]["kernel"] + p["dense"]["bias"]
        # sublayer-output norm BEFORE the residual (NewLayerForward)
        x = x + layer_norm(attn, p["ln1"]["scale"], p["ln1"]["bias"],
                           eps=cfg.eps)
        h = gelu_exact(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        h = h @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        x = x + layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"],
                           eps=cfg.eps)

    x = layer_norm(x, params["final_ln"]["scale"],
                   params["final_ln"]["bias"], eps=cfg.eps)
    return x[:, 1:]


def evaclip_params_from_sat(sd, cfg: EVACLIPConfig):
    """Reference EVA2CLIPModel (SAT) state dict -> pytree."""
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
        "cls": g("transformer.word_embeddings.weight")[:1],
        "pos": g("transformer.position_embeddings.weight"),
        "layers": {
            "qkv": stack_lin(t + ".attention.query_key_value"),
            "dense": stack_lin(t + ".attention.dense"),
            "ln1": stack_ln(t + ".input_layernorm"),
            "fc1": stack_lin(t + ".mlp.dense_h_to_4h"),
            "fc2": stack_lin(t + ".mlp.dense_4h_to_h"),
            "ln2": stack_ln(t + ".post_attention_layernorm"),
        },
        "final_ln": {"scale": g("transformer.final_layernorm.weight"),
                     "bias": g("transformer.final_layernorm.bias")},
    }
