"""TASD loss family: golden parity vs the reference's own
sgm/modules/diffusionmodules/loss.py TASDLoss / TASDLoss_RF (randomness
injected on both sides), plus grad/shape sanity in pure JAX.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import refmods

torch = pytest.importorskip("torch")

B, T, C, H, W = 2, 3, 4, 8, 8


class _RefNet:
    """Reference-side network stub: returns 0.1*x + 0.01*t (broadcast)."""

    class _DM:
        patch_size = [1, 2, 2]

    diffusion_model = _DM()

    def __call__(self, x, t, cond, **kw):
        return 0.1 * x + 0.01 * t.reshape(t.shape + (1, 1, 1))


def _jax_net(x, t, cond, **kw):
    return 0.1 * x + 0.01 * t.reshape(t.shape + (1, 1, 1))


def _ref_mpu_init():
    refmods.simple_init_distributed()
    sat = refmods.import_ref("sat")
    from sat import mpu

    if not mpu.model_parallel_is_initialized():
        mpu.initialize_model_parallel(1)


def _mk_denoisers():
    """Matching (reference torch, ours jax) RF denoisers."""
    den_ref_mod = refmods.import_ref("sgm.modules.diffusionmodules.denoiser")
    ref_den = den_ref_mod.Denoiser(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"},
    )
    from scail_tpu.diffusion.denoiser import Denoiser

    our_den = Denoiser(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"},
    )
    return ref_den, our_den


RF_SAMPLER_CFG = {
    "target": "sgm.modules.diffusionmodules.sigma_sampling.RFSampling",
    "params": {"p_mean": 0.0, "p_std": 1.0},
}


@pytest.mark.slow
def test_tasd_rf_golden_vs_reference(monkeypatch):
    _ref_mpu_init()
    loss_mod = refmods.import_ref("sgm.modules.diffusionmodules.loss")
    ref_den, our_den = _mk_denoisers()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    noise = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    t_idx = rng.uniform(0.05, 0.95, size=(B, T)).astype(np.float32)

    for kwargs in ({"schedule_shift": False, "remove_first": True},
                   {"schedule_shift": True, "remove_first": False}):
        ref_loss = loss_mod.TASDLoss_RF(
            sigma_sampler_config=RF_SAMPLER_CFG, **kwargs)
        ref_loss.sigma_sampler = lambda shape: torch.from_numpy(t_idx.copy())
        monkeypatch.setattr(
            loss_mod.torch, "randn_like",
            lambda t_: torch.from_numpy(noise.copy()))
        conditioner = lambda batch: {}
        want = (
            ref_loss(_RefNet(), ref_den, conditioner,
                     torch.from_numpy(x.copy()), {})
            .detach().numpy()
        )

        from scail_tpu.diffusion.loss import TASDLossRF

        ours = TASDLossRF(sigma_sampler_config=RF_SAMPLER_CFG, **kwargs)
        got = np.asarray(ours(
            jax.random.PRNGKey(0), _jax_net, our_den, {}, jnp.asarray(x),
            patch_size=(1, 2, 2), noise=jnp.asarray(noise),
            t_indices=jnp.asarray(t_idx)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tasd_ddpm_golden_vs_reference(monkeypatch):
    _ref_mpu_init()
    loss_mod = refmods.import_ref("sgm.modules.diffusionmodules.loss")
    den_ref_mod = refmods.import_ref("sgm.modules.diffusionmodules.denoiser")

    num_idx = 20
    disc_cfg = {
        "target": "sgm.modules.diffusionmodules.discretizer.ZeroSNRDDPMDiscretization",
        "params": {},
    }
    ref_den = den_ref_mod.DiscreteDenoiser_TASD(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.VideoScaling"},
        num_idx=num_idx, discretization_config=disc_cfg,
    )
    from scail_tpu.diffusion.denoiser import DiscreteDenoiserTASD

    our_den = DiscreteDenoiserTASD(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.VideoScaling"},
        num_idx=num_idx, discretization_config=disc_cfg,
    )
    np.testing.assert_allclose(np.asarray(our_den.sigmas),
                               ref_den.sigmas.numpy(), rtol=1e-5, atol=1e-6)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    noise = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    idx = rng.integers(1, num_idx, size=(B, T))

    ref_loss = loss_mod.TASDLoss(
        sigma_sampler_config={
            "target": "sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling",
            "params": {"num_idx": num_idx, "discretization_config": disc_cfg},
        },
        min_snr_value=None,
    )
    ref_loss.sigma_sampler = lambda shape, return_idx: (
        ref_den.sigmas[torch.from_numpy(idx)], torch.from_numpy(idx))
    monkeypatch.setattr(loss_mod.torch, "randn_like",
                        lambda t_: torch.from_numpy(noise.copy()))
    want = (
        ref_loss(_RefNet(), ref_den, lambda batch: {},
                 torch.from_numpy(x.copy()), {})
        .detach().numpy()
    )

    from scail_tpu.diffusion.loss import TASDLoss

    ours = TASDLoss(
        sigma_sampler_config={
            "target": "sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling",
            "params": {"num_idx": num_idx, "discretization_config": disc_cfg},
        },
        min_snr_value=None,
    )
    got = np.asarray(ours(
        jax.random.PRNGKey(0), _jax_net, our_den, {}, jnp.asarray(x),
        patch_size=(1, 2, 2), noise=jnp.asarray(noise),
        alphas_idx=jnp.asarray(idx)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tasd_rf_runs_and_grads():
    """Sampled path (no injection): finite loss and nonzero grads."""
    from scail_tpu.diffusion.loss import TASDLossRF

    _, our_den = _mk_denoisers_jax_only()
    loss_obj = TASDLossRF(sigma_sampler_config=RF_SAMPLER_CFG,
                          schedule_shift=True, aug=True, aug_max=0.3,
                          noise_augmentation=True)

    w0 = jnp.asarray(0.2)

    def f(w):
        def net(x, t, cond, **kw):
            return w * x + 0.01 * t.reshape(t.shape + (1, 1, 1))

        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C, H, W))
        return jnp.mean(loss_obj(jax.random.PRNGKey(2), net, our_den, {}, x))

    val, grad = jax.value_and_grad(f)(w0)
    assert np.isfinite(float(val)) and abs(float(grad)) > 0


def _mk_denoisers_jax_only():
    from scail_tpu.diffusion.denoiser import Denoiser

    our_den = Denoiser(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"},
    )
    return None, our_den
