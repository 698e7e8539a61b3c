"""Eval harness math tests (weight-free parts)."""

import jax
import jax.numpy as jnp
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


# ---------------------------------------------------------------------------
# LPIPS (sgm/modules/autoencoding/lpips/loss/lpips.py)
# ---------------------------------------------------------------------------
def test_lpips_matches_torch_oracle():
    """Full LPIPS math vs a torch oracle implementing the reference's
    pipeline (lpips.py:47-66) with shared random weights."""
    import torch
    import torch.nn.functional as F

    from scail_tpu.evals.lpips import (init_lpips_params, lpips,
                                       lpips_params_from_torch)

    rng = np.random.default_rng(21)
    convs_ch = [3, 64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    vgg_convs = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    pools = {4, 9, 16, 23}
    slice_ends = [4, 9, 16, 23, 30]
    chns = [64, 128, 256, 512, 512]

    vgg_sd = {}
    for i, idx in enumerate(vgg_convs):
        vgg_sd[f"features.{idx}.weight"] = (
            0.05 * rng.standard_normal((convs_ch[i + 1], convs_ch[i], 3, 3))
        ).astype(np.float32)
        vgg_sd[f"features.{idx}.bias"] = (
            0.01 * rng.standard_normal((convs_ch[i + 1],))).astype(np.float32)
    lpips_sd = {f"lin{k}.model.1.weight":
                np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32) * 0.1
                for k, c in enumerate(chns)}

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32) * 0.5
    y = (x + 0.3 * rng.standard_normal(x.shape)).astype(np.float32)

    # ---- torch oracle (reference math) ----
    def t_features(t):
        taps, ci = [], 0
        for idx in range(30):
            if idx in pools:
                t = F.max_pool2d(t, 2, 2)
            elif idx in vgg_convs:
                w = torch.from_numpy(vgg_sd[f"features.{idx}.weight"])
                b = torch.from_numpy(vgg_sd[f"features.{idx}.bias"])
                t = F.relu(F.conv2d(t, w, b, padding=1))
                ci += 1
            if idx + 1 in slice_ends:
                taps.append(t)
        return taps

    shift = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    scale = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
    with torch.no_grad():
        f0 = t_features((torch.from_numpy(x) - shift) / scale)
        f1 = t_features((torch.from_numpy(y) - shift) / scale)
        val = 0.0
        for kk in range(5):
            n0 = f0[kk] / (f0[kk].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            n1 = f1[kk] / (f1[kk].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (n0 - n1) ** 2
            w = torch.from_numpy(lpips_sd[f"lin{kk}.model.1.weight"])
            val = val + F.conv2d(d, w).mean([2, 3], keepdim=True)
        want = val[:, 0, 0, 0].numpy()

    params = lpips_params_from_torch(vgg_sd, lpips_sd)
    got = np.asarray(lpips(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # identity -> 0; random-init smoke mode runs
    z = np.asarray(lpips(params, jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(z, np.zeros_like(z), atol=1e-7)
    p2 = init_lpips_params(jax.random.PRNGKey(0))
    v2 = np.asarray(lpips(p2, jnp.asarray(x), jnp.asarray(y)))
    assert np.all(np.isfinite(v2)) and np.all(v2 >= 0)


def test_fvd_sweep_matches_unsharded(tmp_path):
    """dp-sharded sweep driver (eval/calculate_fvd_multiprocess.py
    semantics) == the plain extractor on the same clips."""
    from scail_tpu.evals.fvd import compute_fvd
    from scail_tpu.evals.sweep import fvd_sweep

    rng = np.random.default_rng(0)
    real_dir, fake_dir = tmp_path / "real", tmp_path / "fake"
    real_dir.mkdir(), fake_dir.mkdir()
    reals, fakes = [], []
    for i in range(4):
        r = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
        f = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
        np.savez(real_dir / f"{i}.npz", frames=r)
        np.savez(fake_dir / f"{i}.npz", frames=f)
        reals.append(r.astype(np.float32) / 255.0)
        fakes.append(f.astype(np.float32) / 255.0)

    got = fvd_sweep(str(real_dir), str(fake_dir), num_frames=4,
                    resolution=32, crop_size=32, batch=4, i3d_size=64)
    want = compute_fvd(np.stack(reals), np.stack(fakes), i3d_size=64)
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=2e-2)

    # fewer clips than devices: the pad wraps around (1 clip on the
    # 8-device mesh needs 7 repeat rows) and pad features are dropped
    got1 = fvd_sweep(str(real_dir), str(fake_dir), num_frames=4,
                     resolution=32, crop_size=32, batch=8, i3d_size=64,
                     max_videos=1)
    assert np.isfinite(got1)


def test_fvd_sweep_preprocessing():
    from scail_tpu.evals.sweep import (center_crop, sample_frames,
                                       short_side_scale)

    frames = np.arange(20 * 8 * 12 * 3, dtype=np.float32).reshape(20, 8, 12, 3)
    # long clip: first num_frames*rate window, uniform stride
    got = sample_frames(frames, num_frames=5, sample_rate=2)
    assert got.shape[0] == 5
    np.testing.assert_array_equal(got, frames[[0, 2, 4, 6, 9]])
    # short clip: proportional count
    short = sample_frames(frames[:6], num_frames=5, sample_rate=2)
    assert short.shape[0] == 3
    cropped = center_crop(frames, 6)
    assert cropped.shape == (20, 6, 6, 3)
    np.testing.assert_array_equal(cropped, frames[:, 1:7, 3:9])
    scaled = short_side_scale(frames / 255.0, 4)
    assert scaled.shape == (20, 4, 6, 3)
