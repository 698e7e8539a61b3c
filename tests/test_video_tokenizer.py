"""MagViT2-lite VideoTokenizer (autoencoding/video_tokenizer.py): golden
vs the ACTUAL reference VideoTokenizer (magvit2_pytorch.py:1044-) with
converted weights, causality, and an LFQ codebook-learning smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scail_tpu.autoencoding.video_tokenizer import (
    VideoTokenizer, VideoTokenizerConfig, video_tokenizer_params_from_torch)

LAYERS = ("residual", "compress_space", ("consecutive_residual", 2),
          "compress_time", "residual")
CFG = VideoTokenizerConfig(layers=LAYERS, init_dim=8, channels=3,
                           codebook_size=256)


def test_shapes_and_roundtrip():
    tok = VideoTokenizer(CFG)
    assert tok.latent_dim == 32 and tok.time_downsample_factor == 2
    params = tok.init_params(jax.random.PRNGKey(0))
    v = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 5, 16, 16, 3)).astype(np.float32))
    feats = tok.encode(params, v)
    assert feats.shape == (1, 3, 8, 8, 32)   # (5+1)/2 latent frames
    recon, aux, log = tok(params, v, training=True)
    assert recon.shape == v.shape
    assert np.isfinite(float(aux))
    idx = tok.tokenize(params, v)
    assert idx.shape == (1, 3, 8, 8) and idx.dtype == jnp.int32
    # the discrete bottleneck carries the reconstruction
    np.testing.assert_allclose(
        np.asarray(tok.decode_from_indices(params, idx)),
        np.asarray(tok(params, v, training=False)[0]), rtol=1e-4, atol=1e-4)


def test_encoder_is_time_causal():
    """Latent frame i must not change when LATER input frames change --
    the causal-conv contract that makes streaming tokenization possible."""
    tok = VideoTokenizer(CFG)
    params = tok.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    v = rng.standard_normal((1, 5, 16, 16, 3)).astype(np.float32)
    v2 = v.copy()
    v2[:, 3:] += 10.0                      # perturb the last two frames
    f1 = np.asarray(tok.encode(params, jnp.asarray(v)))
    f2 = np.asarray(tok.encode(params, jnp.asarray(v2)))
    # latent frame 0 covers input frames {pad, 0, 1} (tdf=2): unchanged
    np.testing.assert_allclose(f1[:, 0], f2[:, 0], rtol=1e-5, atol=1e-5)
    assert np.abs(f1[:, -1] - f2[:, -1]).max() > 1e-3


def test_video_tokenizer_golden_vs_reference():
    import torch

    from tests import refmods

    refmods.install_stubs()
    mv = refmods.import_ref("sgm.modules.autoencoding.magvit2_pytorch")
    torch.manual_seed(0)
    ref = mv.VideoTokenizer(
        image_size=16, layers=LAYERS, init_dim=8, channels=3,
        codebook_size=256, use_gan=False, perceptual_loss_weight=0.0,
        flash_attn=False)
    ref.eval()
    tok = VideoTokenizer(CFG)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = video_tokenizer_params_from_torch(sd, tok)

    rng = np.random.default_rng(5)
    v = rng.standard_normal((1, 5, 16, 16, 3)).astype(np.float32)
    vt = torch.from_numpy(v.transpose(0, 4, 1, 2, 3))  # (b, c, t, h, w)
    with torch.no_grad():
        feats_t = ref.encode(vt)
        q_out = ref.quantizers(feats_t)
        q_t, idx_t = q_out[0], q_out[1]
        recon_t = ref.decode(q_t)

    feats = tok.encode(params, jnp.asarray(v))
    np.testing.assert_allclose(
        np.asarray(feats).transpose(0, 4, 1, 2, 3), feats_t.numpy(),
        rtol=3e-4, atol=3e-4)
    q, idx, _, _ = tok.quantize(params, feats, training=False)
    np.testing.assert_array_equal(np.asarray(idx), idx_t.numpy())
    recon = tok.decode(params, q)
    np.testing.assert_allclose(
        np.asarray(recon).transpose(0, 4, 1, 2, 3), recon_t.numpy(),
        rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_video_tokenizer_learning_smoke():
    """Joint recon + LFQ-aux training on a tiny config: loss drops and
    multiple codes are used (the reference's tokenizer-pretraining
    objective minus GAN/perceptual, which compose via the trainer)."""
    import optax

    cfg = VideoTokenizerConfig(layers=("residual", "compress_space"),
                               init_dim=8, channels=3, codebook_size=64)
    tok = VideoTokenizer(cfg)
    params = tok.init_params(jax.random.PRNGKey(0))
    batch = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 3, 8, 8, 3)).astype(np.float32) * 0.3)

    def loss_fn(p, v):
        recon, aux, _ = tok(p, v, training=True)
        return jnp.mean((recon - v) ** 2) + 0.1 * aux

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, opt, v):
        loss, g = jax.value_and_grad(loss_fn)(p, v)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt, loss

    first = None
    for _ in range(30):
        params, opt, loss = step(params, opt, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))
    codes = np.asarray(tok.tokenize(params, batch))
    assert len(np.unique(codes)) > 1
