"""Torch checkpoint ingestion: SAT/SCAIL state dicts -> scail_tpu pytrees.

The released checkpoint layout is
`<dir>/<iteration>/mp_rank_{mp:02d}_model_states.pt` with the weights under
key 'module' and a text file `latest` naming the iteration
(sat/training/model_io.py:36-48, :260-327).  DiT parameters live under the
prefix 'model.diffusion_model.' (OpenAIWrapper), with SAT's mixin-flavored
names:

  transformer.layers.{i}.attention.query_key_value.{weight,bias}   (3h, h)
  transformer.layers.{i}.attention.dense.{weight,bias}
  transformer.layers.{i}.cross_attention.{query,key_value,dense}.*
  transformer.layers.{i}.mlp.dense_h_to_4h / dense_4h_to_h
  mixins.patch_embed.{proj,proj_pose}.{weight,bias}   conv3d (h, in, 1, 2, 2)
  mixins.adaln_layer.adaLN_modulations.{i}            (1, 6, h) [share_adaln]
  mixins.adaln_layer.{query,key,cross_query,cross_key,clip_feature_key}_layernorm_list.{i}.weight
  mixins.adaln_layer.clip_feature_key_value_list.{i}.{weight,bias}
  mixins.final_layer.linear.{weight,bias}, mixins.final_layer.adaLN_modulation (1, 2, h)
  time_embed.{0,2}.*, adaln_projection.1.*, text_embedding.{0,2}.*,
  clip_proj.proj.{0,1,3,4}.*

Linear weights are torch (out, in) and become kernel (in, out); conv3d patch
kernels (out, in, kt, kh, kw) flatten to (in*kt*kh*kw, out) matching
_patchify_tokens' (c, kh, kw) feature order.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from scail_tpu.models.dit import DiTConfig


def _tensor_to_numpy(t, dtype_policy: str = "preserve"):
    """torch tensor -> numpy, zero-copy where possible.

    `preserve` keeps the stored dtype (bf16 becomes ml_dtypes.bfloat16 via a
    uint16 view -- torch cannot `.numpy()` bf16 directly); `float32` is the
    legacy upcasting behaviour.  Both paths return views of the torch
    storage when layout allows, so a mmap-backed load stays file-backed and
    peak RSS is set by what downstream converters copy, not by the raw
    checkpoint size (sat/training/model_io.py:260-327 loads ~28 GB for the
    released 14B artifact -- upcasting that to fp32 would OOM any normal
    host)."""
    import torch

    if not hasattr(t, "detach"):
        return t
    t = t.detach()
    if dtype_policy == "float32" and t.is_floating_point():
        return t.float().numpy()
    if t.dtype == torch.bfloat16:
        import ml_dtypes

        if not t.is_contiguous():
            t = t.contiguous()
        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def load_torch_state_dict(
    path: str, dtype_policy: str = "preserve", mmap: bool = True
) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.pth into numpy arrays without requiring CUDA.

    Memory-maps the checkpoint when the serialization format allows (the
    zipfile format every torch>=1.6 save uses), so untouched tensors cost
    no resident memory and the OS can evict pages under pressure.  Falls
    back to a regular load for legacy files; even there the returned
    arrays are views of the torch storages (no fp32 double-buffering)."""
    import torch

    sd = None
    if mmap:
        try:
            sd = torch.load(path, map_location="cpu", weights_only=False, mmap=True)
        except (RuntimeError, TypeError, ValueError):
            sd = None  # legacy (non-zipfile) serialization: plain load below
    if sd is None:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "module" in sd:
        sd = sd["module"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _tensor_to_numpy(v, dtype_policy) for k, v in sd.items()}


def resolve_latest_checkpoint(load_dir: str) -> str:
    """Follow the `latest` tracker file (sat/training/model_io.py:36-48)."""
    tracker = os.path.join(load_dir, "latest")
    iteration = "1"
    if os.path.exists(tracker):
        with open(tracker) as f:
            iteration = f.read().strip()
    return os.path.join(load_dir, iteration, "mp_rank_00_model_states.pt")


def _lin(sd, name):
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _patch_kernel(w):
    # (out, in, kt, kh, kw) -> (in*kt*kh*kw, out); row-major flatten of
    # (in, kt, kh, kw) == the (c, kh, kw) token-feature order for kt==1
    out = w.shape[0]
    return np.ascontiguousarray(w.reshape(out, -1).T)


def _stack(arrs):
    return np.stack(arrs, axis=0)


def dit_params_from_state_dict(
    sd: Dict[str, np.ndarray], cfg: DiTConfig, prefix: str = "model.diffusion_model."
):
    """Map a SAT state dict onto the stacked-layer scail_tpu DiT pytree."""
    g = lambda k: sd[prefix + k]
    L = cfg.num_layers

    params = {
        "patch_embed": {
            "proj": {
                "kernel": _patch_kernel(g("mixins.patch_embed.proj.weight")),
                "bias": g("mixins.patch_embed.proj.bias"),
            },
            "proj_pose": {
                "kernel": _patch_kernel(g("mixins.patch_embed.proj_pose.weight")),
                "bias": g("mixins.patch_embed.proj_pose.bias"),
            },
        },
        "time_embed": {
            "fc1": {"kernel": g("time_embed.0.weight").T, "bias": g("time_embed.0.bias")},
            "fc2": {"kernel": g("time_embed.2.weight").T, "bias": g("time_embed.2.bias")},
        },
        "text_embedding": {
            "fc1": {"kernel": g("text_embedding.0.weight").T, "bias": g("text_embedding.0.bias")},
            "fc2": {"kernel": g("text_embedding.2.weight").T, "bias": g("text_embedding.2.bias")},
        },
        "final_layer": {
            "linear": {
                "kernel": g("mixins.final_layer.linear.weight").T,
                "bias": g("mixins.final_layer.linear.bias"),
            },
        },
    }
    if cfg.share_adaln:
        params["adaln_projection"] = {
            "fc": {
                "kernel": g("adaln_projection.1.weight").T,
                "bias": g("adaln_projection.1.bias"),
            }
        }
        params["final_layer"]["adaln"] = g("mixins.final_layer.adaLN_modulation")[0]  # (2, h)
    else:
        params["final_layer"]["adaln_mlp"] = {
            "kernel": g("mixins.final_layer.adaLN_modulation.1.weight").T,
            "bias": g("mixins.final_layer.adaLN_modulation.1.bias"),
        }
    if cfg.use_i2v_clip:
        params["clip_proj"] = {
            "ln_in": {"scale": g("clip_proj.proj.0.weight"), "bias": g("clip_proj.proj.0.bias")},
            "fc1": {"kernel": g("clip_proj.proj.1.weight").T, "bias": g("clip_proj.proj.1.bias")},
            "fc2": {"kernel": g("clip_proj.proj.3.weight").T, "bias": g("clip_proj.proj.3.bias")},
            "ln_out": {"scale": g("clip_proj.proj.4.weight"), "bias": g("clip_proj.proj.4.bias")},
        }

    def layer_lin(fmt):
        ws = _stack([g(fmt.format(i) + ".weight").T for i in range(L)])
        p = {"kernel": np.ascontiguousarray(ws)}
        if prefix + fmt.format(0) + ".bias" in sd:
            p["bias"] = _stack([g(fmt.format(i) + ".bias") for i in range(L)])
        return p

    lp = {
        "qkv": layer_lin("transformer.layers.{}.attention.query_key_value"),
        "attn_out": layer_lin("transformer.layers.{}.attention.dense"),
        "cross_q": layer_lin("transformer.layers.{}.cross_attention.query"),
        "cross_kv": layer_lin("transformer.layers.{}.cross_attention.key_value"),
        "cross_out": layer_lin("transformer.layers.{}.cross_attention.dense"),
        "mlp_in": layer_lin("transformer.layers.{}.mlp.dense_h_to_4h"),
        "mlp_out": layer_lin("transformer.layers.{}.mlp.dense_4h_to_h"),
    }
    if cfg.share_adaln:
        lp["adaln"] = _stack(
            [g(f"mixins.adaln_layer.adaLN_modulations.{i}")[0] for i in range(L)]
        )  # (L, 6, h)
    else:
        lp["adaln_mlp"] = layer_lin("mixins.adaln_layer.adaLN_modulations.{}.1")
    if cfg.qk_ln:
        def norms(name):
            return {"scale": _stack(
                [g(f"mixins.adaln_layer.{name}_layernorm_list.{i}.weight") for i in range(L)]
            )}
        lp["q_norm"] = norms("query")
        lp["k_norm"] = norms("key")
        lp["cross_q_norm"] = norms("cross_query")
        lp["cross_k_norm"] = norms("cross_key")
        if cfg.use_i2v_clip:
            lp["clip_k_norm"] = norms("clip_feature_key")
    if cfg.use_i2v_clip:
        lp["clip_kv"] = layer_lin("mixins.adaln_layer.clip_feature_key_value_list.{}")
    params["layers"] = lp
    return params
