"""Aesthetic score + HPSv2 hooks (reference: eval/eval_aes.py, eval/eval_hps.py).

Both reference metrics are thin wrappers over external score models (LAION
aesthetic MLP over CLIP embeddings; HPSv2 package).  The aesthetic head is
a small MLP we can run from its public weights file when present; scoring
math (normalize -> MLP) is implemented here, weights gated.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np


def aesthetic_score_from_clip_embeddings(clip_emb: np.ndarray, mlp_weights: dict) -> np.ndarray:
    """LAION aesthetic predictor: normalize CLIP emb -> 5-layer MLP -> scalar.

    mlp_weights: dict of torch Linear weights layers.{0,2,4,6,7} as in the
    public `sac+logos+ava1-l14-linearMSE.pth`.
    """
    x = clip_emb / np.linalg.norm(clip_emb, axis=-1, keepdims=True)
    sizes = [(768, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
    idx = [0, 2, 4, 6, 7]
    for n, (i, (din, dout)) in enumerate(zip(idx, sizes)):
        w = mlp_weights[f"layers.{i}.weight"]
        b = mlp_weights[f"layers.{i}.bias"]
        x = x @ w.T + b
        if n < 4:
            x = np.maximum(x, 0.0)  # ReLU between hidden layers
    return x[:, 0]


def load_aesthetic_head(path: str) -> dict:
    if not os.path.exists(path):
        raise FileNotFoundError(f"aesthetic head weights not found: {path}")
    from scail_tpu.convert.torch_ckpt import load_torch_state_dict

    return load_torch_state_dict(path)


def hps_score(images, prompts, scorer: Callable = None):
    """HPSv2 needs the external `hpsv2` package + weights; delegate when
    available (reference eval/eval_hps.py does the same through the pkg)."""
    if scorer is not None:
        return scorer(images, prompts)
    try:
        import hpsv2  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "hpsv2 package not installed; provide `scorer` or install hpsv2"
        ) from e
    return hpsv2.score(images, prompts)
