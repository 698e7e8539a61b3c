"""sgm/inference API parity: config builders golden vs the actual
reference api module, embedder goldens vs HF/reference torch, the KL
autoencoder golden, and a tiny end-to-end SamplingPipeline run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import refmods

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# config builders
# ---------------------------------------------------------------------------
def _shim_ref_discretization(sampler):
    """Work around the reference bug where Discretization.__call__
    (discretizer.py:18-22) forwards return_idx into get_sigmas signatures
    that don't accept it (EDM + LegacyDDPM both crash as shipped)."""
    orig = sampler.discretization.get_sigmas
    sampler.discretization.get_sigmas = (
        lambda n, device="cpu", return_idx=False: orig(n, device=device))
    return sampler


def test_sampler_config_builders_golden():
    """get_{guider,discretization,sampler}_config across the full enum
    cross-product vs sgm/inference/api.py:283-388: same class, same sigma
    ladder, same guider scale, same sampler knobs."""
    ref_api = refmods.import_ref("sgm.inference.api")

    from scail_tpu.inference import api

    for s in api.Sampler:
        for d in api.Discretization:
            for g in api.Guider:
                params = api.SamplingParams(
                    steps=8, sampler=s, discretization=d, guider=g,
                    scale=3.5, eta=0.7, s_noise=0.9, order=3)
                ref_params = ref_api.SamplingParams(
                    steps=8, sampler=ref_api.Sampler(s.value),
                    discretization=ref_api.Discretization(d.value),
                    guider=ref_api.Guider(g.value),
                    scale=3.5, eta=0.7, s_noise=0.9, order=3)
                assert (api.get_discretization_config(params)
                        == ref_api.get_discretization_config(ref_params))
                assert (api.get_guider_config(params)["target"]
                        == ref_api.get_guider_config(ref_params)["target"])

                ours = api.get_sampler_config(params)
                ref = _shim_ref_discretization(
                    ref_api.get_sampler_config(ref_params))
                assert type(ours).__name__ == type(ref).__name__, s
                want = ref.discretization(8).numpy()
                got = np.asarray(ours.discretization(8))
                np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                           err_msg=f"{s} {d}")
                assert ours.num_steps == ref.num_steps == 8
                if g == api.Guider.VANILLA:
                    assert ours.guider.scale == ref.guider.scale == 3.5
                for attr in ("eta", "s_noise", "order"):
                    if hasattr(ref, attr):
                        assert getattr(ours, attr) == getattr(ref, attr), attr

    # the enum/spec tables themselves
    assert [m.value for m in api.ModelArchitecture] == [
        m.value for m in ref_api.ModelArchitecture]
    for m in ref_api.ModelArchitecture:
        ref_spec = ref_api.model_specs[m]
        spec = api.model_specs[api.ModelArchitecture(m.value)]
        for f in ("width", "height", "channels", "factor", "is_legacy",
                  "config", "ckpt", "is_guided"):
            assert getattr(spec, f) == getattr(ref_spec, f), (m, f)


def test_img2img_discretization_wrapper_golden():
    """Truncation math vs helpers.py:77-99 at several strengths."""
    ref_helpers = refmods.import_ref("sgm.inference.helpers")
    disc_ref = refmods.import_ref(
        "sgm.modules.diffusionmodules.discretizer")

    from scail_tpu.diffusion.discretization import EDMDiscretization
    from scail_tpu.inference.helpers import Img2ImgDiscretizationWrapper

    ref_d = disc_ref.EDMDiscretization(sigma_min=0.1, sigma_max=10.0)
    ref_d.get_sigmas_orig = ref_d.get_sigmas
    ref_d.get_sigmas = (lambda n, device="cpu", return_idx=False:
                        ref_d.get_sigmas_orig(n, device=device))
    ours_d = EDMDiscretization(sigma_min=0.1, sigma_max=10.0)
    for strength in (1.0, 0.55, 0.2, 0.01):
        want = ref_helpers.Img2ImgDiscretizationWrapper(
            ref_d, strength=strength)(12).numpy()
        got = np.asarray(Img2ImgDiscretizationWrapper(
            ours_d, strength=strength)(12))
        assert got.shape == want.shape, strength
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=str(strength))


# ---------------------------------------------------------------------------
# embedders
# ---------------------------------------------------------------------------
def test_concat_timestep_embedder_golden():
    """vs the reference ConcatTimestepEmbedderND (modules.py:1158-1175)."""
    ref_mod = refmods.import_ref("sgm.modules.encoders.modules")

    from scail_tpu.diffusion.embedders import ConcatTimestepEmbedderND

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1024, size=(3, 2)).astype(np.float32)
    for outdim in (16, 256):
        ref = ref_mod.ConcatTimestepEmbedderND(outdim)
        with torch.no_grad():
            want = ref(torch.from_numpy(x.copy())).numpy()
        got = np.asarray(ConcatTimestepEmbedderND(outdim)(jnp.asarray(x)))
        assert got.shape == want.shape == (3, 2 * outdim)
        # sin/cos of O(1e3) args: f32 multiply ordering costs a few e-5
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # 1d input promotes to (b, 1)
    got = np.asarray(ConcatTimestepEmbedderND(16)(jnp.asarray(x[:, 0])))
    assert got.shape == (3, 16)


def _tiny_hf_clip_text(layers=3, width=32, heads=2, mlp=64, vocab=99):
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=vocab, hidden_size=width, intermediate_size=mlp,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=77, hidden_act="quick_gelu",
        eos_token_id=vocab - 1, bos_token_id=vocab - 2)
    torch.manual_seed(0)
    return CLIPTextModel(cfg).eval(), cfg


def test_frozen_clip_embedder_golden():
    """FrozenCLIPEmbedder vs HF CLIPTextModel (the module the reference
    wraps, modules.py:577-640) for layer last / pooled / hidden, with
    identical random weights through text_params_from_hf."""
    from scail_tpu.diffusion.embedders import FrozenCLIPEmbedder

    model, cfg = _tiny_hf_clip_text()
    sd = model.state_dict()
    rng = np.random.default_rng(1)
    ids = np.zeros((2, 77), np.int64) + (cfg.vocab_size - 1)
    ids[:, 0] = cfg.vocab_size - 2
    ids[0, 1:5] = rng.integers(1, cfg.vocab_size - 2, 4)
    ids[1, 1:9] = rng.integers(1, cfg.vocab_size - 2, 8)

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    output_hidden_states=True)

    def build(**kw):
        emb = FrozenCLIPEmbedder(
            width=cfg.hidden_size, layers=cfg.num_hidden_layers,
            heads=cfg.num_attention_heads, mlp=cfg.intermediate_size,
            vocab_size=cfg.vocab_size, **kw)
        emb.load_state_dict(sd)
        return emb

    jids = jnp.asarray(ids.astype(np.int32))

    got = np.asarray(build(layer="last")._build()(
        build(layer="last").params, jids)["z"])
    np.testing.assert_allclose(got, out.last_hidden_state.numpy(),
                               rtol=2e-4, atol=2e-4)

    e = build(layer="pooled")
    got = np.asarray(e._build()(e.params, jids)["z"])
    np.testing.assert_allclose(got[:, 0], out.pooler_output.numpy(),
                               rtol=2e-4, atol=2e-4)

    for idx in (0, 2, -1):
        e = build(layer="hidden", layer_idx=idx)
        got = np.asarray(e._build()(e.params, jids)["z"])
        np.testing.assert_allclose(
            got, out.hidden_states[idx].numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"hidden_states[{idx}]")


def test_open_clip_embedder_semantics():
    """FrozenOpenCLIPEmbedder2 penultimate/legacy/pooled semantics against
    a direct torch replay of the reference's encode_with_transformer
    (modules.py:705-742): legacy=ln_final(hidden@depth); non-legacy z is
    the RAW penultimate hidden and pooled = ln_final(last)[argmax]@proj."""
    from scail_tpu.diffusion.embedders import (FrozenOpenCLIPEmbedder2,
                                               _OPEN_CLIP_ARCHS,
                                               init_text_tower, _text_cfg,
                                               text_tower_hidden, _final_ln)

    cfg = _text_cfg(32, 3, 2, 64, act="gelu", vocab_size=50,
                    context_length=12)
    params = init_text_tower(jax.random.PRNGKey(3), cfg,
                             with_projection=True)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 49, size=(2, 12)).astype(np.int32)
    ids[:, -1] = 49  # EOT = largest id -> argmax pools the last position

    hid_pen = text_tower_hidden(params, cfg, jnp.asarray(ids), 2)
    hid_last = text_tower_hidden(params, cfg, jnp.asarray(ids), 3)

    emb = FrozenOpenCLIPEmbedder2.__new__(FrozenOpenCLIPEmbedder2)
    emb.cfg, emb.layer, emb.layer_idx = cfg, "penultimate", 1
    emb.legacy, emb.return_pooled = True, False
    emb._fwd = None
    out = emb._build()(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out["z"]),
                               np.asarray(_final_ln(params, cfg, hid_pen)),
                               rtol=1e-5, atol=1e-6)

    emb.legacy, emb.return_pooled = False, True
    emb._fwd = None
    out = emb._build()(params, jnp.asarray(ids))
    # raw penultimate, NO ln_final (the SDXL quirk)
    np.testing.assert_allclose(np.asarray(out["z"]), np.asarray(hid_pen),
                               rtol=1e-5, atol=1e-6)
    o = np.asarray(_final_ln(params, cfg, hid_last))
    want_pooled = o[np.arange(2), ids.argmax(-1)] @ np.asarray(
        params["text_projection"]["kernel"])
    np.testing.assert_allclose(np.asarray(out["pooled"]), want_pooled,
                               rtol=1e-5, atol=1e-5)

    # arch table sanity: SDXL's bigG tower is 1280 wide, 32 deep
    assert _OPEN_CLIP_ARCHS["ViT-bigG-14"][:2] == (1280, 32)


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------
def test_autoencoder_kl_golden():
    """Mode-encode + decode vs the actual reference AutoencoderKL
    (sgm/models/autoencoder.py:445-528) with converted weights."""
    ref_ae = refmods.import_ref("sgm.models.autoencoder")

    from scail_tpu.autoencoding.autoencoder_kl import (
        AutoencoderKLModeOnly, autoencoder_kl_params_from_torch)

    # ch must be a multiple of 32 (the reference's GroupNorm(32, C))
    ddconfig = dict(double_z=True, z_channels=3, resolution=32,
                    in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
                    num_res_blocks=1, attn_resolutions=[16], dropout=0.0)
    torch.manual_seed(0)
    ref = ref_ae.AutoencoderKLModeOnly(
        ddconfig=ddconfig, embed_dim=3,
        loss_config={"target": "torch.nn.Identity"}).eval()
    sd = ref.state_dict()

    ours = AutoencoderKLModeOnly(ddconfig=ddconfig, embed_dim=3)
    params = autoencoder_kl_params_from_torch(sd, ddconfig)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want_z = ref.encode(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy())).numpy()
        want_rec = ref.decode(torch.from_numpy(want_z)).numpy()
    got_z = np.asarray(ours.encode(params, jnp.asarray(x)))
    np.testing.assert_allclose(got_z.transpose(0, 3, 1, 2), want_z,
                               rtol=2e-4, atol=2e-4)
    got_rec = np.asarray(ours.decode(params, jnp.asarray(got_z)))
    np.testing.assert_allclose(got_rec.transpose(0, 3, 1, 2), want_rec,
                               rtol=2e-4, atol=5e-4)

    # sampling encode draws the reparameterized latent: same mean, finite
    z_s = np.asarray(ours.encode(params, jnp.asarray(x),
                                 key=jax.random.PRNGKey(0), sample=True))
    assert z_s.shape == got_z.shape and np.all(np.isfinite(z_s))


# ---------------------------------------------------------------------------
# end-to-end tiny pipeline
# ---------------------------------------------------------------------------
TINY_SD = """
model:
  target: sgm.models.diffusion.DiffusionEngine
  params:
    scale_factor: 0.18215
    denoiser_config:
      target: sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser
      params:
        num_idx: 1000
        weighting_config:
          target: sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting
        scaling_config:
          target: sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling
        discretization_config:
          target: sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization
    network_config:
      target: sgm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        in_channels: 4
        out_channels: 4
        model_channels: 32
        attention_resolutions: [2]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 16
        use_spatial_transformer: true
        use_linear_in_transformer: true
        transformer_depth: 1
        context_dim: 32
        legacy: false
        adm_in_channels: 96
        num_classes: sequential
    conditioner_config:
      target: sgm.modules.GeneralConditioner
      params:
        emb_models:
          - is_trainable: false
            input_key: txt
            target: sgm.modules.encoders.modules.FrozenCLIPEmbedder
            params: {width: 32, layers: 2, heads: 2, mlp: 64, layer: hidden,
                     layer_idx: 1}
          - is_trainable: false
            input_key: original_size_as_tuple
            target: sgm.modules.encoders.modules.ConcatTimestepEmbedderND
            params: {outdim: 16}
          - is_trainable: false
            input_key: crop_coords_top_left
            target: sgm.modules.encoders.modules.ConcatTimestepEmbedderND
            params: {outdim: 16}
          - is_trainable: false
            input_key: aesthetic_score
            target: sgm.modules.encoders.modules.ConcatTimestepEmbedderND
            params: {outdim: 32}
    first_stage_config:
      target: sgm.models.autoencoder.AutoencoderKLInferenceWrapper
      params:
        embed_dim: 4
        ddconfig:
          double_z: true
          z_channels: 4
          resolution: 32
          in_channels: 3
          out_ch: 3
          ch: 32
          ch_mult: [1, 1, 1, 2]  # factor 8, matching the spec
          num_res_blocks: 1
          attn_resolutions: []
          dropout: 0.0
"""


@pytest.fixture(scope="module")
def tiny_pipeline(tmp_path_factory):
    d = tmp_path_factory.mktemp("sdcfg")
    (d / "sd_2_1.yaml").write_text(TINY_SD)

    from scail_tpu.inference.api import ModelArchitecture, SamplingPipeline

    return SamplingPipeline(ModelArchitecture.SD_2_1,
                            model_path=str(d), config_path=str(d))


def test_text_to_image_tiny_e2e(tiny_pipeline):
    """SamplingPipeline.text_to_image end to end in smoke mode: right
    shape, finite, deterministic under a fixed seed (api.py:187-214)."""
    from scail_tpu.inference.api import SamplingParams, Sampler

    params = SamplingParams(width=32, height=32, steps=3,
                            sampler=Sampler.DPMPP2M, scale=3.0)
    out = tiny_pipeline.text_to_image(params, "a photo of a cat",
                                      negative_prompt="blurry", samples=2)
    out = np.asarray(out)
    assert out.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(out)) and out.min() >= 0.0 and out.max() <= 1.0
    again = np.asarray(tiny_pipeline.text_to_image(
        params, "a photo of a cat", negative_prompt="blurry", samples=2))
    np.testing.assert_array_equal(out, again)


def test_img2img_and_refiner_tiny_e2e(tiny_pipeline):
    """image_to_image truncates the ladder via the wrapper; refiner runs
    skip_encode on a latent (api.py:215-281)."""
    from scail_tpu.inference.api import SamplingParams, Sampler

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    params = SamplingParams(width=32, height=32, steps=4,
                            sampler=Sampler.EULER_EDM, scale=2.0,
                            img2img_strength=0.5)
    out = np.asarray(tiny_pipeline.image_to_image(params, img, "a cat"))
    assert out.shape == (1, 32, 32, 3) and np.all(np.isfinite(out))

    latent = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    params = SamplingParams(width=32, height=32, steps=3,
                            sampler=Sampler.EULER_ANCESTRAL, scale=2.0)
    out = np.asarray(tiny_pipeline.refiner(params, latent, "a cat"))
    assert out.shape == (1, 32, 32, 3) and np.all(np.isfinite(out))


# ---------------------------------------------------------------------------
# invisible watermark
# ---------------------------------------------------------------------------
def test_watermark_roundtrip_and_imperceptibility():
    """WatermarkEmbedder (helpers.py:16-60 equivalent): the 48-bit payload
    decodes back exactly, stays >40 dB PSNR, and survives mild noise."""
    from scail_tpu.inference.watermark import (WATERMARK_BITS,
                                               decode_watermark,
                                               embed_watermark)

    assert len(WATERMARK_BITS) == 48  # the reference constant's width
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    marked = embed_watermark(img)
    assert marked.shape == img.shape and marked.dtype == img.dtype

    mse = float(np.mean((marked - img) ** 2))
    psnr = 10 * np.log10(1.0 / mse)
    # uniform-noise chroma is the worst case for the reference's
    # quantization scale (36/255); natural images land well above this
    assert psnr > 35.0, psnr

    assert decode_watermark(marked) == WATERMARK_BITS
    # an unmarked image should NOT decode to the payload
    assert decode_watermark(img) != WATERMARK_BITS

    noisy = np.clip(
        marked + rng.normal(0, 0.01, marked.shape).astype(np.float32), 0, 1)
    assert decode_watermark(noisy) == WATERMARK_BITS

    # the 5d (n, b, h, w, 3) layout the reference also accepts
    stack = np.stack([img, img])
    m5 = embed_watermark(stack)
    assert m5.shape == stack.shape
    assert decode_watermark(m5[0]) == WATERMARK_BITS
