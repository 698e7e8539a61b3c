"""CLIP score (reference: eval/eval_clip_score.py).

score = 100 * cos(image_emb, text_emb) averaged over pairs, open_clip
ViT-g-14 in the reference.  Weights are external; the scorer takes any
(image_embed_fn, text_embed_fn) pair so it can run on our CLIP tower when
its checkpoint (+ a text tower) is available, or on torch open_clip if
installed.  The aggregation math is weight-free and tested.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def clip_score_from_embeddings(img_emb: np.ndarray, txt_emb: np.ndarray) -> float:
    """img_emb/txt_emb: (N, D) unnormalized.  Mean 100*cosine over pairs."""
    a = img_emb / np.linalg.norm(img_emb, axis=-1, keepdims=True)
    b = txt_emb / np.linalg.norm(txt_emb, axis=-1, keepdims=True)
    return float(100.0 * np.mean(np.sum(a * b, axis=-1)))


def compute_clip_score(images, prompts: Sequence[str],
                       image_embed_fn: Callable, text_embed_fn: Callable,
                       batch: int = 32) -> float:
    img_embs, txt_embs = [], []
    for i in range(0, len(prompts), batch):
        img_embs.append(np.asarray(image_embed_fn(images[i : i + batch])))
        txt_embs.append(np.asarray(text_embed_fn(list(prompts[i : i + batch]))))
    return clip_score_from_embeddings(np.concatenate(img_embs),
                                      np.concatenate(txt_embs))
