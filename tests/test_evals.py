"""Eval harness math tests (weight-free parts)."""

import numpy as np

from scail_tpu.evals.clip_score import clip_score_from_embeddings
from scail_tpu.evals.frechet import feature_stats, frechet_distance, frechet_from_features


def test_frechet_identity_zero(rng):
    f = rng.standard_normal((500, 16))
    d = frechet_from_features(f, f.copy())
    assert abs(d) < 1e-6


def test_frechet_known_gaussians():
    # two isotropic gaussians: d^2 = |mu1-mu2|^2 + sum (sqrt(v1)-sqrt(v2))^2
    rng = np.random.default_rng(0)
    a = rng.standard_normal((200000, 4)) * 1.0
    b = rng.standard_normal((200000, 4)) * 2.0 + 3.0
    d = frechet_from_features(a, b)
    expect = 4 * 9.0 + 4 * (2.0 - 1.0) ** 2
    assert abs(d - expect) < 0.5


def test_feature_stats_shapes(rng):
    mu, cov = feature_stats(rng.standard_normal((50, 8)))
    assert mu.shape == (8,) and cov.shape == (8, 8)
    # symmetric PSD-ish
    np.testing.assert_allclose(cov, cov.T, atol=1e-12)


def test_clip_score_math():
    img = np.asarray([[1.0, 0.0], [0.0, 2.0]])
    txt = np.asarray([[2.0, 0.0], [0.0, 1.0]])
    assert abs(clip_score_from_embeddings(img, txt) - 100.0) < 1e-6
    txt_orth = np.asarray([[0.0, 1.0], [1.0, 0.0]])
    assert abs(clip_score_from_embeddings(img, txt_orth)) < 1e-6


def test_aesthetic_mlp_math(rng):
    from scail_tpu.evals.aesthetic import aesthetic_score_from_clip_embeddings

    weights = {}
    sizes = [(768, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
    for i, (din, dout) in zip([0, 2, 4, 6, 7], sizes):
        weights[f"layers.{i}.weight"] = rng.standard_normal((dout, din)).astype(np.float32) * 0.01
        weights[f"layers.{i}.bias"] = np.zeros((dout,), np.float32)
    emb = rng.standard_normal((3, 768)).astype(np.float32)
    s = aesthetic_score_from_clip_embeddings(emb, weights)
    assert s.shape == (3,)
    assert np.all(np.isfinite(s))


def test_i3d_preprocess(rng):
    from scail_tpu.evals.fvd import preprocess_for_i3d

    v = rng.uniform(0, 1, (2, 5, 32, 48, 3)).astype(np.float32)
    out = preprocess_for_i3d(v, size=64)
    assert out.shape == (2, 3, 5, 64, 64)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
