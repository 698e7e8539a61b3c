"""Full CLIP (vision + text towers + projection heads) for CLIP-score.

The reference scores with open_clip ViT-g-14 (eval/eval_clip_score.py:
46-100: mean cosine of normalized image/text embeddings).  This is the
same dual-tower CLIP; weights load from the HF-format checkpoint of the
identical model ("laion/CLIP-ViT-g-14-laion2B-s12B-b42K") via
`clip_params_from_hf_state_dict`, and `init_clip_params` provides a
random-init smoke mode so the harness runs without downloads.

Semantics mirror HF transformers' CLIPModel exactly (pre-LN blocks,
causal mask on the text tower, EOS pooling, cls pooling + post-LN on the
vision tower, bias-free projections) — golden-tested against it in
tests/test_clip_score_model.py.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact, quick_gelu
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ClipScoreConfig:
    # ViT-g-14 (open_clip) geometry by default
    vision_width: int = 1408
    vision_layers: int = 40
    vision_heads: int = 16
    vision_mlp: int = 6144
    image_size: int = 224
    patch_size: int = 14
    text_width: int = 1024
    text_layers: int = 24
    text_heads: int = 16
    text_mlp: int = 4096
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = 1024
    hidden_act: str = "gelu"     # laion models; openai CLIP uses quick_gelu
    eos_token_id: int = 49407
    eps: float = 1e-5
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.dtype]

    @classmethod
    def vit_g14(cls, **kw) -> "ClipScoreConfig":
        """open_clip ViT-g-14 (the reference CLIP-score model)."""
        return cls(**kw)

    @classmethod
    def vit_l14(cls, **kw) -> "ClipScoreConfig":
        """openai CLIP ViT-L/14 — the LAION aesthetic-score backbone
        (eval/eval_aes.py uses clip.load('ViT-L/14'))."""
        return cls(vision_width=1024, vision_layers=24, vision_heads=16,
                   vision_mlp=4096, text_width=768, text_layers=12,
                   text_heads=12, text_mlp=3072, embed_dim=768,
                   hidden_act="quick_gelu", **kw)

    @classmethod
    def vit_h14(cls, **kw) -> "ClipScoreConfig":
        """open_clip ViT-H-14 — the HPSv2 backbone (eval/eval_hps.py:57-69
        loads CLIP-ViT-H-14-laion2B-s32B-b79K + the HPS_v2 fine-tune)."""
        return cls(vision_width=1280, vision_layers=32, vision_heads=16,
                   vision_mlp=5120, text_width=1024, text_layers=24,
                   text_heads=16, text_mlp=4096, embed_dim=1024, **kw)


def _act(cfg):
    return gelu_exact if cfg.hidden_act == "gelu" else quick_gelu


def _encoder_block(cfg, x, p, nh, mask_bias=None):
    """HF CLIPEncoderLayer: pre-LN attn + pre-LN MLP, biased projections."""
    b, s, d = x.shape
    hd = d // nh
    y = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps=cfg.eps)
    q = (y @ p["q"]["kernel"] + p["q"]["bias"]).reshape(b, s, nh, hd)
    k = (y @ p["k"]["kernel"] + p["k"]["bias"]).reshape(b, s, nh, hd)
    v = (y @ p["v"]["kernel"] + p["v"]["bias"]).reshape(b, s, nh, hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if mask_bias is not None:
        logits = logits + mask_bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, d)
    x = x + (o @ p["out"]["kernel"] + p["out"]["bias"])
    y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps=cfg.eps)
    y = _act(cfg)(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    x = x + (y @ p["fc2"]["kernel"] + p["fc2"]["bias"])
    return x


def clip_image_embed(params, cfg: ClipScoreConfig, images):
    """images: (b, 3, H, W) already CLIP-normalized.
    Returns unnormalized (b, embed_dim)."""
    vp = params["vision"]
    cdtype = cfg.compute_dtype
    x = jnp.transpose(images, (0, 2, 3, 1)).astype(cdtype)
    x = jax.lax.conv_general_dilated(
        x, vp["patch_embedding"]["kernel"].astype(cdtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.vision_width)
    cls = jnp.broadcast_to(vp["class_embedding"].astype(cdtype),
                           (b, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["position_embedding"].astype(cdtype)[None]
    x = layer_norm(x, vp["pre_ln"]["scale"], vp["pre_ln"]["bias"], eps=cfg.eps)

    def block(x, p):
        return _encoder_block(cfg, x, p, cfg.vision_heads), None

    lp = jax.tree.map(lambda t: t.astype(cdtype), vp["layers"])
    x, _ = jax.lax.scan(block, x, lp)
    pooled = x[:, 0]
    pooled = layer_norm(pooled, vp["post_ln"]["scale"], vp["post_ln"]["bias"],
                        eps=cfg.eps)
    return pooled @ params["visual_projection"]["kernel"].astype(cdtype)


def clip_text_embed(params, cfg: ClipScoreConfig, ids):
    """ids: (b, S) int32 (padded to context_length with the EOS/pad id).
    Returns unnormalized (b, embed_dim)."""
    tp = params["text"]
    cdtype = cfg.compute_dtype
    b, S = ids.shape
    x = tp["token_embedding"][ids].astype(cdtype)
    x = x + tp["position_embedding"].astype(cdtype)[None, :S]
    causal = jnp.triu(jnp.full((S, S), -jnp.inf, jnp.float32), k=1)[None, None]

    def block(x, p):
        return _encoder_block(cfg, x, p, cfg.text_heads, mask_bias=causal), None

    lp = jax.tree.map(lambda t: t.astype(cdtype), tp["layers"])
    x, _ = jax.lax.scan(block, x, lp)
    x = layer_norm(x, tp["final_ln"]["scale"], tp["final_ln"]["bias"],
                   eps=cfg.eps)
    # EOS pooling: first position equal to eos_token_id (HF CLIP semantics)
    eos_pos = jnp.argmax((ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(b), eos_pos]
    return pooled @ params["text_projection"]["kernel"].astype(cdtype)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------
def init_clip_params(key, cfg: ClipScoreConfig):
    ks = iter(jax.random.split(key, 16))
    n_patches = (cfg.image_size // cfg.patch_size) ** 2

    def lin(k, L, din, dout, std=0.02):
        return {"kernel": std * jax.random.normal(k, (L, din, dout), jnp.float32),
                "bias": jnp.zeros((L, dout), jnp.float32)}

    def ln(L, d):
        shape = (L, d) if L else (d,)
        return {"scale": jnp.ones(shape, jnp.float32),
                "bias": jnp.zeros(shape, jnp.float32)}

    def tower(k, L, d, mlp):
        k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
        return {
            "ln1": ln(L, d), "ln2": ln(L, d),
            "q": lin(k1, L, d, d), "k": lin(k2, L, d, d),
            "v": lin(k3, L, d, d), "out": lin(k4, L, d, d),
            "fc1": lin(k5, L, d, mlp), "fc2": lin(k6, L, mlp, d),
        }

    vd, td = cfg.vision_width, cfg.text_width
    return {
        "vision": {
            "class_embedding": 0.02 * jax.random.normal(next(ks), (vd,)),
            "patch_embedding": {"kernel": 0.02 * jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, 3, vd))},
            "position_embedding": 0.02 * jax.random.normal(
                next(ks), (n_patches + 1, vd)),
            "pre_ln": ln(0, vd), "post_ln": ln(0, vd),
            "layers": tower(next(ks), cfg.vision_layers, vd, cfg.vision_mlp),
        },
        "text": {
            "token_embedding": 0.02 * jax.random.normal(
                next(ks), (cfg.vocab_size, td)),
            "position_embedding": 0.02 * jax.random.normal(
                next(ks), (cfg.context_length, td)),
            "final_ln": ln(0, td),
            "layers": tower(next(ks), cfg.text_layers, td, cfg.text_mlp),
        },
        "visual_projection": {"kernel": 0.02 * jax.random.normal(
            next(ks), (vd, cfg.embed_dim))},
        "text_projection": {"kernel": 0.02 * jax.random.normal(
            next(ks), (td, cfg.embed_dim))},
    }


def clip_params_from_hf_state_dict(sd, cfg: ClipScoreConfig):
    """Map a HF-transformers CLIPModel state dict onto the JAX tree."""
    g = lambda k: np.asarray(sd[k])

    def tower(prefix, L):
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

        e = prefix + ".encoder.layers.{}"
        return {
            "ln1": stack_ln(e + ".layer_norm1"),
            "ln2": stack_ln(e + ".layer_norm2"),
            "q": stack_lin(e + ".self_attn.q_proj"),
            "k": stack_lin(e + ".self_attn.k_proj"),
            "v": stack_lin(e + ".self_attn.v_proj"),
            "out": stack_lin(e + ".self_attn.out_proj"),
            "fc1": stack_lin(e + ".mlp.fc1"),
            "fc2": stack_lin(e + ".mlp.fc2"),
        }

    def ln1(name):
        return {"scale": g(name + ".weight"), "bias": g(name + ".bias")}

    vision = tower("vision_model", cfg.vision_layers)
    text = tower("text_model", cfg.text_layers)
    return {
        "vision": {
            "class_embedding": g("vision_model.embeddings.class_embedding"),
            "patch_embedding": {"kernel": np.ascontiguousarray(
                g("vision_model.embeddings.patch_embedding.weight")
                .transpose(2, 3, 1, 0))},
            "position_embedding": g(
                "vision_model.embeddings.position_embedding.weight"),
            # HF's attribute is literally spelled 'pre_layrnorm'
            "pre_ln": ln1("vision_model.pre_layrnorm"),
            "post_ln": ln1("vision_model.post_layernorm"),
            "layers": vision,
        },
        "text": {
            "token_embedding": g("text_model.embeddings.token_embedding.weight"),
            "position_embedding": g(
                "text_model.embeddings.position_embedding.weight"),
            "final_ln": ln1("text_model.final_layer_norm"),
            "layers": text,
        },
        "visual_projection": {"kernel": g("visual_projection.weight").T},
        "text_projection": {"kernel": g("text_projection.weight").T},
    }


def clip_params_from_open_clip(sd, cfg: ClipScoreConfig):
    """Map an open_clip CLIP state dict (the layout of the reference's
    scoring checkpoints and of HPS_v2*.pt['state_dict']) onto the JAX tree.

    open_clip fuses qkv as attn.in_proj_{weight,bias}; blocks live under
    (visual.)transformer.resblocks.{i} with ln_1/ln_2 and mlp.c_fc/c_proj.
    """
    g = lambda k: np.asarray(sd[k])

    def tower(prefix, L, d):
        def stack(fmt, transpose=False):
            mats = [g(fmt.format(i)) for i in range(L)]
            if transpose:
                mats = [m.T for m in mats]
            return np.stack(mats)

        base = f"{prefix}transformer.resblocks.{{}}"
        in_w = stack(base + ".attn.in_proj_weight")          # (L, 3d, d)
        in_b = stack(base + ".attn.in_proj_bias")            # (L, 3d)
        qw, kw, vw = np.split(in_w, 3, axis=1)
        qb, kb, vb = np.split(in_b, 3, axis=1)

        def lin(kernel, bias):
            return {"kernel": np.ascontiguousarray(kernel.transpose(0, 2, 1)),
                    "bias": bias}

        def ln(fmt):
            return {"scale": stack(fmt + ".weight"), "bias": stack(fmt + ".bias")}

        return {
            "ln1": ln(base + ".ln_1"), "ln2": ln(base + ".ln_2"),
            "q": lin(qw, qb), "k": lin(kw, kb), "v": lin(vw, vb),
            "out": {"kernel": stack(base + ".attn.out_proj.weight", True),
                    "bias": stack(base + ".attn.out_proj.bias")},
            "fc1": {"kernel": stack(base + ".mlp.c_fc.weight", True),
                    "bias": stack(base + ".mlp.c_fc.bias")},
            "fc2": {"kernel": stack(base + ".mlp.c_proj.weight", True),
                    "bias": stack(base + ".mlp.c_proj.bias")},
        }

    def ln1(name):
        return {"scale": g(name + ".weight"), "bias": g(name + ".bias")}

    return {
        "vision": {
            "class_embedding": g("visual.class_embedding"),
            "patch_embedding": {"kernel": np.ascontiguousarray(
                g("visual.conv1.weight").transpose(2, 3, 1, 0))},
            "position_embedding": g("visual.positional_embedding"),
            "pre_ln": ln1("visual.ln_pre"),
            "post_ln": ln1("visual.ln_post"),
            "layers": tower("visual.", cfg.vision_layers, cfg.vision_width),
        },
        "text": {
            "token_embedding": g("token_embedding.weight"),
            "position_embedding": g("positional_embedding"),
            "final_ln": ln1("ln_final"),
            "layers": tower("", cfg.text_layers, cfg.text_width),
        },
        "visual_projection": {"kernel": g("visual.proj")},      # (d, embed)
        "text_projection": {"kernel": g("text_projection")},    # (d, embed)
    }
