"""Frechet distance math shared by FVD and FID
(reference: eval/fvd/videogpt/fvd.py, eval/eval_fid.py -- EDM-style stats).

d^2 = |mu1 - mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))
"""

from __future__ import annotations

import numpy as np


def feature_stats(features: np.ndarray):
    """features: (N, D) -> (mu, cov)."""
    feats = np.asarray(features, np.float64)
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    cov1, cov2 = np.atleast_2d(cov1), np.atleast_2d(cov2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(cov1.dot(cov2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = linalg.sqrtm((cov1 + offset).dot(cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def frechet_from_features(feats1: np.ndarray, feats2: np.ndarray) -> float:
    mu1, c1 = feature_stats(feats1)
    mu2, c2 = feature_stats(feats2)
    return frechet_distance(mu1, c1, mu2, c2)
