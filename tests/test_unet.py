"""Golden parity for the legacy UNet stacks vs the ACTUAL reference modules
(sgm/modules/diffusionmodules/openaimodel.py, video_model.py,
sgm/modules/attention.py, video_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _ref_openaimodel():
    from tests import refmods
    refmods.install_stubs()
    return refmods.import_ref("sgm.modules.diffusionmodules.openaimodel")


def _ref_video_model():
    from tests import refmods
    refmods.install_stubs()
    return refmods.import_ref("sgm.modules.diffusionmodules.video_model")


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def _nchw(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# pure-conv UNet: AttentionBlock (both QKV orders), scale-shift norm,
# resblock up/down, int class conditioning
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("new_order", [False, True],
                         ids=["legacy_qkv", "new_qkv"])
def test_unet_conv_attention_golden(new_order):
    import torch

    from scail_tpu.models.unet import UNetModel, unet_params_from_torch

    oa = _ref_openaimodel()
    cfg = dict(in_channels=3, model_channels=32, out_channels=3,
               num_res_blocks=1, attention_resolutions=[2],
               channel_mult=(1, 2), num_heads=2,
               use_scale_shift_norm=True, resblock_updown=True,
               use_new_attention_order=new_order, num_classes=7)
    torch.manual_seed(0)
    ref = oa.UNetModel(**cfg).eval()
    mine = UNetModel(**cfg)
    params = unet_params_from_torch(ref.state_dict(), mine)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([3.0, 777.0], np.float32)
    y = np.array([1, 5])
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t),
                   y=torch.from_numpy(y)).numpy()
    got = mine(params, _nhwc(x), jnp.asarray(t), y=jnp.asarray(y))
    np.testing.assert_allclose(_nchw(got), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# SD-style UNet: SpatialTransformer with cross-attention, per-level depth,
# linear and conv projections, sequential adm conditioning
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("use_linear", [False, True],
                         ids=["conv_proj", "linear_proj"])
def test_unet_spatial_transformer_golden(use_linear):
    import torch

    from scail_tpu.models.unet import UNetModel, unet_params_from_torch

    oa = _ref_openaimodel()
    cfg = dict(in_channels=4, model_channels=32, out_channels=4,
               num_res_blocks=1, attention_resolutions=[1, 2],
               channel_mult=(1, 2), num_head_channels=8,
               use_spatial_transformer=True, transformer_depth=[1, 2],
               context_dim=12, use_linear_in_transformer=use_linear,
               disable_middle_self_attn=True, num_classes="sequential",
               adm_in_channels=10)
    torch.manual_seed(1)
    ref = oa.UNetModel(**cfg).eval()
    mine = UNetModel(**cfg)
    params = unet_params_from_torch(ref.state_dict(), mine)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([10.0, 500.0], np.float32)
    ctx = rng.standard_normal((2, 5, 12)).astype(np.float32)
    adm = rng.standard_normal((2, 10)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t),
                   context=torch.from_numpy(ctx),
                   y=torch.from_numpy(adm)).numpy()
    got = mine(params, _nhwc(x), jnp.asarray(t), context=jnp.asarray(ctx),
               y=jnp.asarray(adm))
    np.testing.assert_allclose(_nchw(got), want, rtol=2e-4, atol=2e-4)


def test_unet_yaml_target_resolves():
    from scail_tpu.utils.registry import instantiate_from_config

    m = instantiate_from_config({
        "target": "sgm.modules.diffusionmodules.openaimodel.UNetModel",
        "params": dict(in_channels=3, model_channels=32, out_channels=3,
                       num_res_blocks=1, attention_resolutions=[],
                       channel_mult=(1,), num_heads=1)})
    p = m.init(jax.random.PRNGKey(0))
    out = m(p, jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,)))
    assert out.shape == (1, 8, 8, 3)


# ---------------------------------------------------------------------------
# SVD VideoUNet: VideoResBlock time mixing, SpatialVideoTransformer with
# spatial time-context, learned_with_images blending, temporal down/up
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("spatial_ctx", [False, True],
                         ids=["time_ctx", "spatial_ctx"])
def test_video_unet_golden(spatial_ctx):
    import torch

    from scail_tpu.models.video_unet import (VideoUNet,
                                             video_unet_params_from_torch)

    vm = _ref_video_model()
    T = 3
    cfg = dict(in_channels=4, model_channels=32, out_channels=4,
               num_res_blocks=1, attention_resolutions=[1, 2],
               channel_mult=(1, 2), num_head_channels=8, context_dim=12,
               extra_ff_mix_layer=True, use_spatial_context=spatial_ctx,
               time_context_dim=None if spatial_ctx else 12,
               merge_strategy="learned_with_images",
               video_kernel_size=[3, 1, 1], use_linear_in_transformer=True,
               num_classes="sequential", adm_in_channels=10,
               time_downup=True)
    torch.manual_seed(2)
    ref = vm.VideoUNet(**cfg).eval()
    mine = VideoUNet(**cfg)
    params = video_unet_params_from_torch(ref.state_dict(), mine)

    rng = np.random.default_rng(3)
    b = 2
    x = rng.standard_normal((b * T, 4, 8, 8)).astype(np.float32)
    t = rng.uniform(0, 999, (b * T,)).astype(np.float32)
    ctx = rng.standard_normal((b * T, 5, 12)).astype(np.float32)
    adm = rng.standard_normal((b * T, 10)).astype(np.float32)
    # one video batch element, one image-only
    ioi = np.stack([np.zeros(T), np.ones(T)]).astype(np.float32)
    tc = (None if spatial_ctx
          else rng.standard_normal((b, 5, 12)).astype(np.float32))
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t),
                   context=torch.from_numpy(ctx), y=torch.from_numpy(adm),
                   time_context=(None if tc is None else torch.from_numpy(tc)),
                   num_video_frames=T,
                   image_only_indicator=torch.from_numpy(ioi)).numpy()
    got = mine(params, _nhwc(x), jnp.asarray(t), context=jnp.asarray(ctx),
               y=jnp.asarray(adm),
               time_context=None if tc is None else jnp.asarray(tc),
               num_video_frames=T, image_only_indicator=jnp.asarray(ioi))
    np.testing.assert_allclose(_nchw(got), want, rtol=3e-4, atol=3e-4)


def test_video_unet_jits():
    from scail_tpu.models.video_unet import VideoUNet

    cfg = dict(in_channels=4, model_channels=32, out_channels=4,
               num_res_blocks=1, attention_resolutions=[1],
               channel_mult=(1,), num_head_channels=8, context_dim=12,
               merge_strategy="fixed")
    m = VideoUNet(**cfg)
    p = m.init(jax.random.PRNGKey(0))
    T = 2

    @jax.jit
    def step(p, x, t, ctx):
        return m(p, x, t, context=ctx, num_video_frames=T)

    out = step(p, jnp.zeros((2 * T, 8, 8, 4)), jnp.zeros((2 * T,)),
               jnp.zeros((2 * T, 5, 12)))
    assert out.shape == (2 * T, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
