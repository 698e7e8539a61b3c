"""End-to-end CLI smoke test with tiny random models at 32x64.

The container has no video codec (no ffmpeg/pyav; cv2 lacks H.264), so the
fixture is synthesized as ref.png + rendered.gif -- exercising the CLI's
codec-less IO fallbacks end to end."""

import os
from types import SimpleNamespace

import jax
import numpy as np
import pytest

from scail_tpu.engine import VideoDiffusionEngine
from scail_tpu.testing import tiny_model_config


@pytest.fixture
def example_dir(tmp_path):
    from PIL import Image

    d = tmp_path / "001"
    d.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 70, 3), np.uint8)).save(d / "ref.png")
    frames = [Image.fromarray(rng.integers(0, 255, (40, 70, 3), np.uint8))
              for _ in range(9)]
    frames[0].save(d / "rendered.gif", save_all=True, append_images=frames[1:],
                   duration=63, loop=0)
    return str(d)


def _args(tmp_path):
    return SimpleNamespace(
        mode="inference", batch_size=1, input_type="txt", input_file=None,
        sampling_image_size=[32, 64], vae_compress_size=[4, 8, 8],
        bf16=False, fp16=False, sampling_fps=16, sequence_parallel_size=1,
        image2video=True, use_i2v_clip=True, use_pose=True,
        representation="smpl_downsample", output_dir=str(tmp_path),
        load=None, only_save_latents=False, multi_cond_cfg=False, seed=0,
    )


@pytest.mark.slow
def test_cli_end_to_end_examples_001(tmp_path, example_dir):
    mc = tiny_model_config()
    # tiny text/clip dims need matching conditioner + clip stubs: use random
    # embedder outputs by dropping conditioner/clip configs and calling
    # prepare_case pieces manually is heavier; instead give the engine the
    # real-config text/clip dims at toy width.
    mc["network_config"]["params"]["text_dim"] = 12
    mc["network_config"]["params"]["clip_dim"] = 10
    mc["sampler_config"]["params"]["num_steps"] = 2

    eng = VideoDiffusionEngine(mc)
    eng.init_params(jax.random.PRNGKey(0))

    from scail_tpu.cli.sample_video import prepare_case

    # stub the text/clip encoders at toy dims
    class _TxtEmb:
        input_key = "txt"

        def get_unconditional_conditioning(self, batch, batch_uc=None, **kw):
            import jax.numpy as jnp

            c = {"crossattn": jnp.ones((1, 7, 12), jnp.float32)}
            uc = {"crossattn": jnp.zeros((1, 7, 12), jnp.float32)}
            return c, uc

    class _Clip:
        def visual(self, videos):
            import jax.numpy as jnp

            return jnp.ones((1, 5, 10), jnp.float32)

    eng.conditioner = _TxtEmb()
    eng.i2v_clip = _Clip()

    args = _args(tmp_path)
    c, uc, shape, meta = prepare_case(eng, args, f"a character dancing@@{example_dir}")

    T_lat = shape[0]
    assert shape == (T_lat, 16, 4, 8)
    assert c["concat_smpl_render"].shape == (1, T_lat, 16, 2, 4)
    assert c["ref_concat"].shape == (1, 1, 16, 4, 8)
    assert meta["driving_fps"] > 0

    # keep the denoise cheap: sample just the first 2 latent frames' worth
    import jax.numpy as jnp

    for d in (c, uc):
        d["concat_smpl_render"] = d["concat_smpl_render"][:, :2]
        d.pop("concat_images", None)
        d.pop("concat_pose", None)
    z = eng.sample(jax.random.PRNGKey(1), c, uc=uc, batch_size=1,
                   shape=(2, 16, 4, 8))
    assert z.shape == (1, 2, 16, 4, 8)
    vid = eng.decode_first_stage(z, streamed=False)
    assert vid.shape == (1, 5, 3, 32, 64)
    assert np.all(np.isfinite(np.asarray(vid, np.float32)))

    from scail_tpu.data.video import save_multi_video_grid_and_mp4

    frames01 = np.clip((np.asarray(vid, np.float32) + 1) / 2, 0, 1)
    save_multi_video_grid_and_mp4([frames01], str(tmp_path), fps=8, key="case_output")
    outs = [f for f in os.listdir(tmp_path) if f.endswith((".mp4", ".gif"))]
    assert outs, "no video written (mp4 or gif fallback)"


class _TinyTxtEmb:
    input_key = "txt"
    params = {}

    def get_unconditional_conditioning(self, batch, batch_uc=None, **kw):
        import jax.numpy as jnp

        return ({"crossattn": jnp.ones((1, 7, 12), jnp.float32)},
                {"crossattn": jnp.zeros((1, 7, 12), jnp.float32)})


class _TinyClip:
    params = {}

    def visual(self, videos):
        import jax.numpy as jnp

        return jnp.ones((1, 5, 10), jnp.float32)


def _run_sampling_main(tmp_path, example_dir, monkeypatch, mc, extra_args=None):
    import scail_tpu.cli.sample_video as sv

    real_cls = sv.VideoDiffusionEngine

    def factory(model_config, args=None):
        eng = real_cls(mc, args)
        eng.init_params(jax.random.PRNGKey(0))
        eng.conditioner = _TinyTxtEmb()
        eng.i2v_clip = _TinyClip()
        return eng

    monkeypatch.setattr(sv, "VideoDiffusionEngine", factory)

    prompts = tmp_path / "prompts.txt"
    prompts.write_text(f"a character dancing@@{example_dir}\n")
    args = _args(tmp_path)
    args.input_type = "txt"
    args.input_file = str(prompts)
    for k, v in (extra_args or {}).items():
        setattr(args, k, v)
    sv.sampling_main(args, mc)

    case_dir = os.path.join(str(tmp_path), os.path.basename(example_dir))
    assert os.path.isfile(os.path.join(case_dir, "text.txt"))
    outs = [f for f in os.listdir(case_dir) if f.endswith((".mp4", ".gif"))]
    assert outs, f"no video written in {case_dir}"


@pytest.mark.slow
def test_sampling_main_jitted_loop(tmp_path, example_dir, monkeypatch):
    """Drives the ACTUAL CLI loop (sampling_main), now jitted with params as
    jit arguments."""
    mc = tiny_model_config()
    mc["network_config"]["params"]["text_dim"] = 12
    mc["network_config"]["params"]["clip_dim"] = 10
    mc["sampler_config"]["params"]["num_steps"] = 2
    _run_sampling_main(tmp_path, example_dir, monkeypatch, mc)


@pytest.mark.slow
def test_sampling_main_long_tiled(tmp_path, example_dir, monkeypatch):
    """RFSamplerLong temporal tiling through the jitted CLI path."""
    mc = tiny_model_config()
    mc["network_config"]["params"]["text_dim"] = 12
    mc["network_config"]["params"]["clip_dim"] = 10
    mc["sampler_config"]["target"] = (
        "sgm.modules.diffusionmodules.sampling.RFSamplerLong")
    mc["sampler_config"]["params"]["num_steps"] = 2
    _run_sampling_main(tmp_path, example_dir, monkeypatch, mc,
                       extra_args={"long_tile": 2, "long_overlap": 1})
