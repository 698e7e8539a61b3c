"""End-to-end engine tests at toy scale: build-from-config, jitted RF
sampling, VAE roundtrip through the engine, and the training loss."""

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.engine import VideoDiffusionEngine
from scail_tpu.testing import tiny_cond, tiny_model_config
import pytest


def make_engine(dtype="float32"):
    mc = tiny_model_config()
    mc["network_config"]["params"]["dtype"] = "fp32" if dtype == "float32" else "bf16"
    eng = VideoDiffusionEngine(mc)
    eng.init_params(jax.random.PRNGKey(0))
    return eng


def test_engine_builds_from_config():
    eng = make_engine()
    assert eng.network.config.hidden_size == 32
    assert eng.sampler.guider.scale == 4
    assert eng.denoiser.scaling.__class__.__name__ == "RFScaling"
    assert "dit" in eng.params


@pytest.mark.slow
def test_engine_sample_shapes_and_determinism():
    eng = make_engine()
    cond = tiny_cond(jax.random.PRNGKey(1))
    uc = dict(cond)
    uc["crossattn"] = jnp.zeros_like(cond["crossattn"])
    out1 = eng.sample(jax.random.PRNGKey(2), cond, uc, batch_size=1, shape=(2, 16, 8, 8))
    out2 = eng.sample(jax.random.PRNGKey(2), cond, uc, batch_size=1, shape=(2, 16, 8, 8))
    assert out1.shape == (1, 2, 16, 8, 8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = eng.sample(jax.random.PRNGKey(3), cond, uc, batch_size=1, shape=(2, 16, 8, 8))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    assert np.all(np.isfinite(np.asarray(out1)))


def test_engine_sample_jitted():
    eng = make_engine()
    cond = tiny_cond(jax.random.PRNGKey(1))

    @jax.jit
    def run(key, cond):
        return eng.sample(key, cond, cond, batch_size=1, shape=(2, 16, 8, 8))

    out = run(jax.random.PRNGKey(0), cond)
    assert out.shape == (1, 2, 16, 8, 8)


@pytest.mark.slow
def test_engine_first_stage_roundtrip():
    eng = make_engine()
    video = jnp.zeros((1, 5, 3, 16, 16))
    z = eng.encode_first_stage(video, force_encode=True, streamed=False)
    assert z.shape == (1, 2, 16, 2, 2)
    rec = eng.decode_first_stage(z, streamed=False)
    assert rec.shape == (1, 5, 3, 16, 16)


@pytest.mark.slow
def test_engine_loss_runs_and_grads():
    eng = make_engine()
    cond = tiny_cond(jax.random.PRNGKey(1))
    latents = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 16, 8, 8))

    def loss_fn(dit_params):
        eng.params["dit"] = dit_params
        return jnp.mean(eng.loss(jax.random.PRNGKey(5), latents, cond))

    val, grads = jax.value_and_grad(loss_fn)(eng.params["dit"])
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_engine_from_yaml_configs():
    from scail_tpu.utils.config import load_configs, split_reference_config

    cfg = load_configs(["configs/video_model/scail_1p3b.yaml",
                        "configs/sampling/pose_cli.yaml"])
    run_args, model = split_reference_config(cfg)
    assert run_args.sampling_image_size == [512, 896]
    # only check the graph parses into the right component classes: no params
    from scail_tpu.models.dit import DiTConfig

    dit_cfg = DiTConfig.from_network_config(
        dict(model["network_config"]["params"]), use_i2v_clip=True
    )
    assert dit_cfg.hidden_size == 1536 and dit_cfg.num_layers == 30
    assert dit_cfg.head_dim == 128
