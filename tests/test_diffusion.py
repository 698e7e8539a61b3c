"""Diffusion stack parity: schedules, scalings, guiders, sampler math, loss."""

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.diffusion.denoiser import Denoiser
from scail_tpu.diffusion.discretization import RFDiscretization
from scail_tpu.diffusion.guiders import VanillaCFG
from scail_tpu.diffusion.loss import RFLoss
from scail_tpu.diffusion.samplers import RFSampler, RFSamplerLong, make_flow_sigmas, make_tile_indices
from scail_tpu.diffusion.scaling import RFScaling
from scail_tpu.diffusion.sigma_sampling import RFSampling
from scail_tpu.utils.registry import instantiate_from_config


def test_flow_sigma_schedule_exact():
    """make_flow_timesteps (sampling.py:888-903): shift 5, 50 steps."""
    sig = make_flow_sigmas(50, shift_scale=5.0)
    s = np.linspace(0, 1, 51)
    want = 1 - s / (5 + s - 5 * s)
    np.testing.assert_allclose(sig, want.astype(np.float32), atol=1e-7)
    assert sig[0] == 1.0 and abs(sig[-1]) < 1e-7
    assert np.all(np.diff(sig) < 0)


def test_rf_discretization():
    d = RFDiscretization()
    sig = d(50)
    assert len(sig) == 51
    assert abs(sig[-1]) < 1e-8  # append_zero
    assert np.all(sig[:-1] > 0) and sig.max() <= 1.0
    # full ladder
    full = d(1000, do_append_zero=False)
    np.testing.assert_allclose(full, np.flip(np.linspace(0, 1, 1001)[1:]), atol=1e-8)


def test_rf_scaling():
    s = RFScaling()
    sigma = jnp.asarray([0.5, 1.0])
    c_skip, c_out, c_in, c_noise = s(sigma)
    np.testing.assert_allclose(np.asarray(c_noise), [500.0, 1000.0])
    assert np.all(np.asarray(c_skip) == 0) and np.all(np.asarray(c_out) == 1)


def test_rf_sampling_distribution():
    rs = RFSampling(p_mean=0.0, p_std=1.0)
    sig = np.asarray(rs(jax.random.PRNGKey(0), 20000))
    assert 0 < sig.min() and sig.max() < 1
    # sigmoid of standard normal has median 0.5
    assert abs(np.median(sig) - 0.5) < 0.02


def test_vanilla_cfg_combine_and_prepare():
    g = VanillaCFG(scale=4.0)
    xu = np.ones((1, 2, 2)) * 1.0
    xc = np.ones((1, 2, 2)) * 2.0
    out = np.asarray(g(jnp.concatenate([jnp.asarray(xu), jnp.asarray(xc)], axis=0)))
    np.testing.assert_allclose(out, 1.0 + 4.0 * (2.0 - 1.0))

    c = {"crossattn": jnp.ones((1, 5, 8)), "ref_concat": jnp.ones((1, 1, 4))}
    uc = {"crossattn": jnp.zeros((1, 3, 8)), "ref_concat": jnp.ones((1, 1, 4))}
    merged = g.prepare_cond(c, uc)
    assert merged["crossattn"].shape == (2, 5, 8)   # uc token-padded then cat
    assert merged["ref_concat"].shape == (2, 1, 4)  # tiled


def test_rf_sampler_closed_form():
    """With a linear velocity field v = -x the Euler recursion has the exact
    closed form x_n = x0 * prod(1 - (s_{i+1}-s_i))."""
    sampler = RFSampler(
        hunyuan_schedule=True, shift_scale=5, num_steps=8, mode="normal",
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.RFDiscretization"},
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
            "params": {"scale": 4.0}},
    )
    x0 = jnp.ones((1, 2, 4, 4, 4), jnp.float32) * 0.7

    def denoise_fn(x, sigma, cond, **kw):
        return -x  # both CFG halves identical -> guider returns -x

    out = np.asarray(sampler(denoise_fn, x0, cond={"crossattn": jnp.zeros((1, 1, 8))}))
    sig = make_flow_sigmas(8, 5.0)
    expect = 0.7 * np.prod([1 - (sig[i + 1] - sig[i]) for i in range(8)])
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_rf_sampler_long_blending():
    sampler = RFSamplerLong(
        hunyuan_schedule=True, shift_scale=5, num_steps=2, mode="normal",
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.RFDiscretization"},
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
            "params": {"scale": 1.0}},
    )
    T, tile, ov = 6, 4, 2
    tiles = make_tile_indices(T, tile, ov)
    assert tiles == [[0, 1, 2, 3], [2, 3, 4, 5]]
    x0 = jnp.ones((1, T, 2, 4, 4), jnp.float32)
    smpl_tiled = jnp.zeros((1, len(tiles), tile, 2, 2, 2))

    def denoise_fn(x, sigma, cond, **kw):
        return -x

    out = sampler(
        denoise_fn, x0,
        cond={"crossattn": jnp.zeros((1, 1, 8)), "smpl_tiled": smpl_tiled},
        tile_indices=tiles,
    )
    out = np.asarray(out)
    assert out.shape == (1, T, 2, 4, 4)
    sig = make_flow_sigmas(2, 5.0)
    expect = np.prod([1 - (sig[i + 1] - sig[i]) for i in range(2)])
    # blending of identical per-tile predictions must be exact everywhere
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_denoiser_rf_identity():
    den = Denoiser(
        weighting_config={"target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={"target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"},
    )
    seen = {}

    def net(x, c_noise, cond, **kw):
        seen["c_noise"] = np.asarray(c_noise)
        return x * 2.0

    x = jnp.ones((2, 3, 4))
    sigma = jnp.asarray([0.25, 0.5])
    out = np.asarray(den(net, x, sigma, cond={}))
    np.testing.assert_allclose(out, 2.0)
    np.testing.assert_allclose(seen["c_noise"], [250.0, 500.0])


def test_rf_loss_history_mask():
    loss = RFLoss(
        schedule_shift=False,
        sigma_sampler_config={
            "target": "sgm.modules.diffusionmodules.sigma_sampling.RFSampling",
            "params": {"p_mean": 0.0, "p_std": 1.0}},
    )
    den = Denoiser(
        weighting_config={"target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={"target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"},
    )
    x = jnp.ones((2, 3, 8, 4, 4))
    hist = jnp.zeros((2, 3, 4, 4, 4)).at[:, 0].set(1.0)  # frame 0 is history

    captured = {}

    def net(xin, c_noise, cond, **kw):
        captured["x"] = np.asarray(xin)
        return jnp.zeros_like(xin)

    val = loss(jax.random.PRNGKey(0), net, den, {}, x, history_mask=hist)
    assert val.shape == (2,)
    assert np.all(np.isfinite(np.asarray(val)))
    # history frame must be passed through clean (input * (1 - sigma)) ... with
    # v-pred target noise-input; at minimum, frame 0 gets NO noise:
    # noised frame0 = input * (1-sigma) exactly (deterministic given sigma)
    x0 = captured["x"][:, 0]
    assert np.allclose(x0, x0[..., :1, :1])  # spatially constant (input==1)


def _edm_sampler(cls_target, extra=None):
    params = {
        "num_steps": 6,
        "discretization_config": {
            "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_min": 0.1, "sigma_max": 10.0}},
        "guider_config": {
            "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
            "params": {"scale": 1.0}},
    }
    params.update(extra or {})
    return instantiate_from_config({"target": cls_target, "params": params})


def _linear_denoiser(x, sigma, cond, cfg_scale=None, **kw):
    # x0-prediction: denoised = 0.5 * x (both CFG halves identical)
    return 0.5 * x


def test_edm_samplers_run_and_converge():
    """Euler/Heun/DPM++2M drive x toward the denoiser's fixed point; Heun
    should land closer to the exact ODE than Euler."""
    import numpy as _np

    from scail_tpu.diffusion.samplers import (DPMPP2MSampler, EulerAncestralSampler,
                                              EulerEDMSampler, HeunEDMSampler)

    x0 = jnp.ones((1, 2, 4, 4), jnp.float32)
    cond = {"crossattn": jnp.zeros((1, 1, 8))}
    outs = {}
    for name, cls in [("euler", "sgm.modules.diffusionmodules.sampling.EulerEDMSampler"),
                      ("heun", "sgm.modules.diffusionmodules.sampling.HeunEDMSampler"),
                      ("dpmpp2m", "sgm.modules.diffusionmodules.sampling.DPMPP2MSampler"),
                      ("sde_dpmpp2m", "sgm.modules.diffusionmodules.sampling.SDEDPMPP2MSampler"),
                      ("ddim", "sgm.modules.diffusionmodules.sampling.DDIMSampler"),
                      ("euler_a", "sgm.modules.diffusionmodules.sampling.EulerAncestralSampler"),
                      ("dpmpp2s_a", "sgm.modules.diffusionmodules.sampling.DPMPP2SAncestralSampler"),
                      ("lms", "sgm.modules.diffusionmodules.sampling.LinearMultistepSampler")]:
        sampler = _edm_sampler(cls)
        out = _np.asarray(sampler(_linear_denoiser, x0, cond))
        assert _np.all(_np.isfinite(out)), name
        outs[name] = out

    # exact ODE for denoised = c*x: dx/dsigma = (1-c) x / sigma
    # -> x(sig_end)/x(sig_start) = (sig_end/sig_start)^(1-c); sig_end=0 -> 0
    # with append_zero final step, the last Euler step jumps to denoised(x)
    assert abs(outs["euler"]).max() < abs(float(jnp.sqrt(1 + 10.0 ** 2))) * 1.0
    # Heun (2nd order) differs from Euler
    assert not _np.allclose(outs["euler"], outs["heun"])


def test_video_ddim_sampler_runs():
    from scail_tpu.diffusion.samplers import VideoDDIMSampler

    sampler = instantiate_from_config({
        "target": "sgm.modules.diffusionmodules.sampling.VideoDDIMSampler",
        "params": {
            "num_steps": 4,
            "discretization_config": {
                "target": "sgm.modules.diffusionmodules.discretizer.ZeroSNRDDPMDiscretization"},
            "guider_config": {
                "target": "sgm.modules.diffusionmodules.guiders.DynamicCFG",
                "params": {"scale": 4, "exp": 5, "num_steps": 4}},
        },
    })
    assert isinstance(sampler, VideoDDIMSampler)
    x0 = jnp.ones((1, 2, 4, 4), jnp.float32)

    def denoise_fn(x, ac, cond, idx=None, cfg_scale=None, **kw):
        return 0.5 * x

    out = np.asarray(sampler(denoise_fn, x0, {"crossattn": jnp.zeros((1, 1, 8))}))
    assert out.shape == (1, 2, 4, 4)
    assert np.all(np.isfinite(out))


def test_zero_snr_discretization():
    from scail_tpu.diffusion.discretization import ZeroSNRDDPMDiscretization

    d = ZeroSNRDDPMDiscretization()
    s, idx = d(50, do_append_zero=False, flip=True, return_idx=True)
    assert len(s) == 50 and len(idx) == 50
    # zero terminal SNR: the noisiest alpha is exactly 0
    assert min(abs(s)) < 1e-7
    assert max(s) < 1.0


def test_registry_roundtrip_reference_targets():
    obj = instantiate_from_config({
        "target": "sgm.modules.diffusionmodules.sampling.RFSampler",
        "params": {
            "hunyuan_schedule": True, "shift_scale": 5, "num_steps": 4,
            "discretization_config": {
                "target": "sgm.modules.diffusionmodules.discretizer.RFDiscretization",
                "params": {"reverse": False}},
            "guider_config": {
                "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
                "params": {"scale": 4}},
        },
    })
    assert isinstance(obj, RFSampler)
    assert obj.guider.scale == 4


def test_discrete_sampling_dp_stratification():
    """uniform_sampling=True with group_num=g: the reference partitions
    the dp world into g rank groups, group k drawing sigma indices only
    from [k*num_idx/g, (k+1)*num_idx/g) (reference sigma_sampling.py:22-59).
    TPU-natively the rank groups are contiguous chunks of the dp-sharded
    global batch; assert the per-chunk interval property under a real
    8-device 'data' sharding."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from scail_tpu.diffusion.sigma_sampling import DiscreteSampling

    g, num_idx, b = 4, 1000, 16
    samp = DiscreteSampling(num_idx=num_idx, uniform_sampling=True,
                            group_num=g)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))

    @jax.jit
    def draw(key):
        sig, idx = samp(key, b, return_idx=True)
        return jax.lax.with_sharding_constraint(idx, sh)

    interval = num_idx // g
    for seed in range(8):
        idx = np.asarray(draw(jax.random.PRNGKey(seed)))
        groups = (np.arange(b) * g) // b
        assert ((idx >= groups * interval)
                & (idx < (groups + 1) * interval)).all()
    # every group interval is actually exercised across draws
    all_idx = np.concatenate([np.asarray(draw(jax.random.PRNGKey(s)))
                              for s in range(32)])
    hist = np.histogram(all_idx, bins=g, range=(0, num_idx))[0]
    assert (hist > 0).all()
    # plain mode still spans the full range
    samp0 = DiscreteSampling(num_idx=num_idx)
    idx0 = np.asarray(samp0(jax.random.PRNGKey(0), 4096, return_idx=True)[1])
    assert idx0.min() < interval and idx0.max() >= num_idx - interval
