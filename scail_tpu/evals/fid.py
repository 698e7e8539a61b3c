"""FID (reference: eval/eval_fid.py, EDM-style).

`ref` mode builds (mu, cov) stats over a directory of images into an .npz;
`calc` mode compares generated images against stored stats.  The InceptionV3
feature extractor is an external torchscript download (eval/eval_fid.py uses
the EDM detector); extraction is gated on its presence.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from scail_tpu.evals.frechet import feature_stats, frechet_distance


class InceptionFeatureExtractor:
    def __init__(self, weights_path: str):
        import torch

        if not os.path.exists(weights_path):
            raise FileNotFoundError(
                f"inception weights not found at {weights_path} "
                "(EDM inception-2015-12-05.pkl / torchscript equivalent)")
        self.model = torch.jit.load(weights_path).eval()

    def __call__(self, images_u8: np.ndarray, batch: int = 16) -> np.ndarray:
        import torch

        x = torch.tensor(images_u8)  # (N, H, W, 3) uint8, NHWC like EDM
        feats = []
        with torch.no_grad():
            for i in range(0, x.shape[0], batch):
                xb = x[i : i + batch].permute(0, 3, 1, 2)
                feats.append(self.model(xb, return_features=True).numpy())
        return np.concatenate(feats)


def save_ref_stats(features: np.ndarray, out_path: str):
    mu, cov = feature_stats(features)
    np.savez(out_path, mu=mu, sigma=cov)


def fid_from_stats(features: np.ndarray, ref_stats_path: str) -> float:
    ref = np.load(ref_stats_path)
    mu, cov = feature_stats(features)
    return frechet_distance(mu, cov, ref["mu"], ref["sigma"])
