"""XLM-Roberta-CLIP ViT-H/14 visual tower, TPU-native
(reference: sgm/modules/encoders/clip.py).

Only the vision branch is on the SCAIL path: `CLIPModel.visual` resizes the
reference frame to 224 (torch bicubic, antialias=False), normalizes with
CLIP statistics, and returns the PENULTIMATE block's tokens (use_31_block,
clip.py:307-328, :510-526) -- (b, 257, 1280), no post-norm, no head.

ViT-H/14: dim 1280, 32 layers (31 used), 16 heads, GELU (exact) MLP,
pre-norm LN before the blocks, LN eps 1e-5, fp32 LN statistics (clip.py:43-46).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact, quick_gelu
from scail_tpu.ops.norms import layer_norm
from scail_tpu.ops.resize import resize_bicubic
from scail_tpu.utils.registry import register

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    activation: str = "gelu"
    norm_eps: float = 1e-5
    pre_norm: bool = True
    dtype: str = "bfloat16"

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2

    @property
    def compute_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.dtype]


def init_clip_vision_params(key, cfg: ClipVisionConfig):
    d, L = cfg.dim, cfg.num_layers
    ks = iter(jax.random.split(key, 8))
    gain = d ** -0.5

    def lin(k, din, dout):
        return {"kernel": 0.02 * jax.random.normal(k, (L, din, dout)),
                "bias": jnp.zeros((L, dout))}

    def ln():
        return {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))}

    return {
        "patch_embedding": {
            "kernel": 0.02 * jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, 3, d))
        },
        "cls_embedding": gain * jax.random.normal(next(ks), (1, 1, d)),
        "pos_embedding": gain * jax.random.normal(next(ks), (1, cfg.num_patches + 1, d)),
        "pre_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "layers": {
            "norm1": ln(),
            "to_qkv": lin(next(ks), d, 3 * d),
            "proj": lin(next(ks), d, d),
            "norm2": ln(),
            "mlp_fc1": lin(next(ks), d, cfg.mlp_ratio * d),
            "mlp_fc2": lin(next(ks), cfg.mlp_ratio * d, d),
        },
    }


def clip_visual_tokens(params, cfg: ClipVisionConfig, images, *, use_31_block=True):
    """images: (b, 3, 224, 224) already normalized.  Returns (b, 257, dim)."""
    cdtype = cfg.compute_dtype
    b = images.shape[0]
    d, nh = cfg.dim, cfg.num_heads
    hd = d // nh
    act = gelu_exact if cfg.activation == "gelu" else quick_gelu

    x = images.transpose(0, 2, 3, 1).astype(cdtype)  # NHWC
    x = jax.lax.conv_general_dilated(
        x, params["patch_embedding"]["kernel"].astype(cdtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x.reshape(b, -1, d)
    cls = jnp.broadcast_to(params["cls_embedding"].astype(cdtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(cdtype)
    x = layer_norm(x, params["pre_norm"]["scale"], params["pre_norm"]["bias"],
                   eps=cfg.norm_eps)

    n_run = cfg.num_layers - 1 if use_31_block else cfg.num_layers
    lp = jax.tree.map(lambda p: p[:n_run].astype(cdtype), params["layers"])

    def block(x, p):
        y = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], eps=cfg.norm_eps)
        qkv = y @ p["to_qkv"]["kernel"] + p["to_qkv"]["bias"]
        # torch layout: (b, s, 3, nh, hd) (clip.py:95-99)
        qkv = qkv.reshape(b, -1, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, -1, d)
        x = x + (o @ p["proj"]["kernel"] + p["proj"]["bias"])
        y = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], eps=cfg.norm_eps)
        y = act(y @ p["mlp_fc1"]["kernel"] + p["mlp_fc1"]["bias"])
        x = x + (y @ p["mlp_fc2"]["kernel"] + p["mlp_fc2"]["bias"])
        return x, None

    x, _ = jax.lax.scan(block, x, lp)
    return x


def clip_preprocess(frames, image_size: int = 224):
    """(b, 3, H, W) in [-1,1] -> resized+normalized (clip.py:510-521):
    torch-bicubic to 224 (antialias=False), then CLIP mean/std on [0,1]."""
    x = resize_bicubic(frames.astype(jnp.float32), image_size, image_size,
                       antialias=False)
    x = x * 0.5 + 0.5
    x = (x - CLIP_MEAN[None, :, None, None]) / CLIP_STD[None, :, None, None]
    return x


def clip_vision_params_from_state_dict(sd, cfg: ClipVisionConfig):
    """Map `visual.*` names from the reference checkpoint
    (models_clip_open-clip-xlm-roberta-large-vit-huge-14-onlyvisual.pth)."""
    L = cfg.num_layers

    def g(k):
        if k in sd:
            return np.asarray(sd[k])
        return np.asarray(sd["visual." + k])

    def stack_lin(fmt):
        return {
            "kernel": np.stack([g(fmt.format(i) + ".weight").T for i in range(L)]),
            "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)]),
        }

    def stack_ln(fmt):
        return {
            "scale": np.stack([g(fmt.format(i) + ".weight") for i in range(L)]),
            "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)]),
        }

    return {
        "patch_embedding": {
            # conv2d (o,i,kh,kw) -> (kh,kw,i,o)
            "kernel": np.ascontiguousarray(
                g("patch_embedding.weight").transpose(2, 3, 1, 0))
        },
        "cls_embedding": g("cls_embedding"),
        "pos_embedding": g("pos_embedding"),
        "pre_norm": {"scale": g("pre_norm.weight"), "bias": g("pre_norm.bias")},
        "layers": {
            "norm1": stack_ln("transformer.{}.norm1"),
            "to_qkv": stack_lin("transformer.{}.attn.to_qkv"),
            "proj": stack_lin("transformer.{}.attn.proj"),
            "norm2": stack_ln("transformer.{}.norm2"),
            "mlp_fc1": stack_lin("transformer.{}.mlp.0"),
            "mlp_fc2": stack_lin("transformer.{}.mlp.2"),
        },
    }


@register(alias="sgm.modules.encoders.clip.CLIPModel")
class CLIPModel:
    """Reference-surface wrapper (clip.py:491-526): `.visual(videos)` with
    (b, c, t, h, w) input returns penultimate tokens for all frames."""

    def __init__(self, dtype="bfloat16", checkpoint_path=None, device=None):
        self.config = ClipVisionConfig(dtype="bfloat16" if "bf" in str(dtype) else "float32")
        self.params = None
        self._jit = None
        import os

        if checkpoint_path and os.path.exists(str(checkpoint_path)):
            from scail_tpu.convert.torch_ckpt import load_torch_state_dict

            self.params = clip_vision_params_from_state_dict(
                load_torch_state_dict(checkpoint_path), self.config
            )

    def init(self, key, cfg: ClipVisionConfig = None):
        self.config = cfg or self.config
        self.params = init_clip_vision_params(key, self.config)
        return self.params

    def visual(self, videos):
        """videos: (b, c, t, h, w) in [-1,1] (clip.py:510-526)."""
        b, c, t, h, w = videos.shape
        frames = videos.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = clip_preprocess(frames, self.config.image_size)
        if self._jit is None:
            self._jit = jax.jit(
                lambda p, xx: clip_visual_tokens(p, self.config, xx, use_31_block=True)
            )
        return self._jit(self.params, x)
