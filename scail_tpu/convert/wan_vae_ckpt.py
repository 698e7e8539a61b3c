"""Wan2.1_VAE.pth -> scail_tpu param pytree.

The VAE param tree mirrors the torch module paths
(encoder.downsamples.{i}.residual.{j}..., see models/wan_vae.py), so the
conversion is mechanical: split dotted names into nested keys, transpose
conv kernels to channels-last layouts, squeeze RMS gammas.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def convert_wan_vae_state_dict(sd: Dict[str, np.ndarray]):
    params: Dict = {}
    for name, v in sd.items():
        parts = name.split(".")
        leaf = parts[-1]
        v = np.asarray(v)
        if leaf == "weight" and v.ndim == 5:      # conv3d (o,i,kt,kh,kw)->(kt,kh,kw,i,o)
            key, val = "kernel", np.ascontiguousarray(v.transpose(2, 3, 4, 1, 0))
        elif leaf == "weight" and v.ndim == 4:    # conv2d (o,i,kh,kw)->(kh,kw,i,o)
            key, val = "kernel", np.ascontiguousarray(v.transpose(2, 3, 1, 0))
        elif leaf == "gamma":                     # RMS_norm (c,1,1[,1]) -> (c,)
            key, val = "gamma", v.reshape(-1)
        elif leaf == "bias":
            key, val = "bias", v
        else:
            key, val = leaf, v
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[key] = val
    return params


def load_wan_vae_params(path: str):
    from scail_tpu.convert.torch_ckpt import load_torch_state_dict

    return convert_wan_vae_state_dict(load_torch_state_dict(path))
