"""Wan VAE parity: our full-sequence and streamed modes vs the torch oracle
that replicates the reference's feat_cache streaming (wan_vae.py:516-568)."""

import jax.numpy as jnp
import numpy as np
import torch

from scail_tpu.convert.wan_vae_ckpt import convert_wan_vae_state_dict
from scail_tpu.models.wan_vae import WanVAEConfig, vae_decode, vae_encode

from oracle_vae import OracleWanVAE
import pytest

CFG = WanVAEConfig(dim=8, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
                   temporal_downsample=(False, True, True), dtype="float32")


def _setup():
    torch.manual_seed(0)
    oracle = OracleWanVAE(dim=8, z_dim=4, dim_mult=(1, 1, 2, 2),
                          num_res_blocks=1, temporal_down=(False, True, True))
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_wan_vae_state_dict(sd)
    return oracle, params


@pytest.mark.slow
def test_encode_matches_oracle(rng):
    oracle, params = _setup()
    video = rng.standard_normal((1, 9, 3, 16, 16)).astype(np.float32) * 0.5

    mu_ref = oracle.encode_streamed(torch.tensor(video).permute(0, 2, 1, 3, 4))
    mu_ref = mu_ref.permute(0, 2, 1, 3, 4).numpy()  # -> (b, t, c, h, w)

    full = np.asarray(vae_encode(params, CFG, jnp.asarray(video), streamed=False))
    stream = np.asarray(vae_encode(params, CFG, jnp.asarray(video), streamed=True))

    assert full.shape == mu_ref.shape == (1, 3, 4, 2, 2)
    np.testing.assert_allclose(full, mu_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(stream, full, rtol=2e-5, atol=2e-5)


def test_decode_matches_oracle(rng):
    oracle, params = _setup()
    z = rng.standard_normal((1, 3, 4, 2, 2)).astype(np.float32)

    dec_ref = oracle.decode_streamed(torch.tensor(z).permute(0, 2, 1, 3, 4))
    dec_ref = dec_ref.clamp(-1, 1).permute(0, 2, 1, 3, 4).numpy()

    full = np.asarray(vae_decode(params, CFG, jnp.asarray(z), streamed=False))
    stream = np.asarray(vae_decode(params, CFG, jnp.asarray(z), streamed=True))

    assert full.shape == dec_ref.shape == (1, 9, 3, 16, 16)
    np.testing.assert_allclose(full, dec_ref, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(stream, full, rtol=3e-5, atol=3e-5)


def test_single_frame_image():
    _, params = _setup()
    img = np.zeros((1, 1, 3, 16, 16), np.float32)
    z = vae_encode(params, CFG, jnp.asarray(img), streamed=False)
    assert z.shape == (1, 1, 4, 2, 2)
    out = vae_decode(params, CFG, z, streamed=False)
    assert out.shape == (1, 1, 3, 16, 16)


@pytest.mark.slow
def test_context_parallel_matches_full(rng):
    """CP (temporal halo-exchange) encode/decode == full-sequence
    (cp_enc_dec.py parity) on a 4-way 'seq' mesh."""
    import jax

    from scail_tpu.models.wan_vae import vae_decode_cp, vae_encode_cp
    from scail_tpu.parallel.mesh import MeshSpec, make_mesh

    _, params = _setup()
    mesh = make_mesh(MeshSpec(data=1, seq=4, model=2))

    video = rng.standard_normal((1, 33, 3, 16, 16)).astype(np.float32) * 0.5
    want = np.asarray(vae_encode(params, CFG, jnp.asarray(video), streamed=False))
    got = np.asarray(jax.jit(
        lambda v: vae_encode_cp(params, CFG, v, mesh))(jnp.asarray(video)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    z = rng.standard_normal((1, 9, 4, 2, 2)).astype(np.float32)
    want_d = np.asarray(vae_decode(params, CFG, jnp.asarray(z), streamed=False))
    got_d = np.asarray(jax.jit(
        lambda zz: vae_decode_cp(params, CFG, zz, mesh))(jnp.asarray(z)))
    np.testing.assert_allclose(got_d, want_d, rtol=3e-4, atol=3e-4)


def test_real_config_shapes():
    cfg = WanVAEConfig()
    assert cfg.enc_dims == [96, 96, 192, 384, 384]
    assert cfg.dec_dims == [384, 384, 384, 192, 96]
    assert cfg.latent_mean.shape == (16,)
