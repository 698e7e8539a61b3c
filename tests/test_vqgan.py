"""VQModel / MOVQ shells (autoencoding/vqgan.py): golden vs the ACTUAL
reference models (sgm/models/vqgan.py) with converted weights, plus a
codebook-learning smoke through the AutoencoderTrainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

DD = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
          attn_resolutions=(8,), in_channels=3, resolution=16,
          z_channels=8, double_z=False, dropout=0.0)
N_EMBED, EMBED_DIM = 16, 4


def _ref_model(movq):
    import torch

    from tests import refmods

    refmods.install_stubs()
    vq = refmods.import_ref("sgm.models.vqgan")
    torch.manual_seed(0)
    if movq:
        m = vq.MOVQ(ddconfig=dict(DD), n_embed=N_EMBED, embed_dim=EMBED_DIM)
    else:
        m = vq.VQModel(ddconfig=dict(DD), learning_rate=1e-4,
                       lossconfig={"target": "torch.nn.Identity"},
                       n_embed=N_EMBED, embed_dim=EMBED_DIM)
    m.eval()
    return m


@pytest.mark.parametrize("movq", [False, True], ids=["vqmodel", "movq"])
def test_vq_shells_golden_vs_reference(movq):
    import torch

    from scail_tpu.autoencoding.vqgan import (MOVQ, VQModel,
                                              vqmodel_params_from_torch)

    ref = _ref_model(movq)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = vqmodel_params_from_torch(sd, DD, movq=movq)
    mine = (MOVQ if movq else VQModel)(DD, N_EMBED, EMBED_DIM)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want_dec, want_diff = ref(torch.from_numpy(x))
        want_quant = ref.encode(torch.from_numpy(x))[0]

    got_dec, got_diff = mine(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got_dec).transpose(0, 3, 1, 2), want_dec.numpy(),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(got_diff), float(want_diff),
                               rtol=2e-4, atol=2e-5)
    got_quant = mine.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)))[0]
    np.testing.assert_allclose(
        np.asarray(got_quant).transpose(0, 3, 1, 2), want_quant.numpy(),
        rtol=2e-4, atol=2e-4)


def test_vq_decode_code_roundtrip():
    """decode(quantize(x)) == decode_code(indices(x)) -- the discrete
    token bottleneck actually carries the reconstruction (vqgan.py:291)."""
    from scail_tpu.autoencoding.vqgan import VQModel

    m = VQModel(DD, N_EMBED, EMBED_DIM)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, 16, 3)).astype(np.float32))
    quant, _, idx = m.encode(params, x)
    np.testing.assert_allclose(np.asarray(m.decode(params, quant)),
                               np.asarray(m.decode_code(params, idx)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_vqmodel_codebook_learning_smoke():
    """Tiny VQModel jointly trained (recon + codebook commit, the
    vqgan.py training_step generator objective without the GAN term --
    the adversarial phase is covered by test_autoencoding): recon
    improves and the codebook is actually used (perplexity > 1)."""
    import optax

    from scail_tpu.autoencoding.vqgan import VQModel

    dd = dict(ch=32, out_ch=3, ch_mult=(1,), num_res_blocks=1,
              attn_resolutions=(), in_channels=3, resolution=8,
              z_channels=4, double_z=False, dropout=0.0)
    m = VQModel(dd, n_embed=8, embed_dim=4)
    params = m.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
                        * 0.3)

    def loss_fn(p, batch):
        dec, diff = m(p, batch)
        return jnp.mean((dec - batch) ** 2) + diff

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, opt, batch):
        loss, g = jax.value_and_grad(loss_fn)(p, batch)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt, loss

    first = None
    for _ in range(30):
        params, opt, loss = step(params, opt, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.8, (first, float(loss))
    perp, _ = m.codebook_stats(params, batch)
    assert float(perp) > 1.0
