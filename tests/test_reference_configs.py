"""Compatibility proof: the REFERENCE's own YAML configs build our engine
(weight-gated components skip their checkpoints)."""

import os

import pytest

REF_MODEL_YAML = "/root/reference/configs/video_model/Wan2.1-i2v-14Bsc-pose-xc-latent.yaml"
REF_13B_YAML = "/root/reference/configs/video_model/Wan2.1-Fun-1.3Bsc-pose-xc-latent.yaml"
REF_SAMPLING_YAML = "/root/reference/configs/sampling/wan_pose_14Bsc_xc_cli.yaml"


@pytest.mark.skipif(not os.path.exists(REF_MODEL_YAML), reason="reference absent")
def test_reference_yaml_builds_engine():
    from scail_tpu.engine import VideoDiffusionEngine
    from scail_tpu.utils.config import load_configs, split_reference_config

    cfg = load_configs([REF_13B_YAML, REF_SAMPLING_YAML])
    run_args, model_cfg = split_reference_config(cfg)
    assert run_args.sampling_image_size == [512, 896]
    assert run_args.representation == "smpl_downsample"

    eng = VideoDiffusionEngine(dict(model_cfg))
    # the graph resolved through the reference target strings:
    assert eng.network.config.hidden_size == 1536
    assert eng.network.config.num_layers == 30
    assert eng.network.config.head_dim == 128
    assert eng.network.config.interleaved_rope is True
    assert eng.network.config.remat  # checkpoint_activations: True in the YAML
    assert eng.sampler.__class__.__name__ == "RFSampler"
    assert eng.sampler.hunyuan_schedule and eng.sampler.shift_scale == 5
    assert eng.sampler.guider.scale == 4
    assert eng.denoiser.scaling.__class__.__name__ == "RFScaling"
    assert eng.loss_fn.__class__.__name__ == "RFLoss"
    assert eng.loss_fn.schedule_shift is True
    assert eng.first_stage_model.config.z_dim == 16
    assert eng.i2v_clip is not None
    # text conditioner built (weights gated on the absent checkpoint path)
    emb = eng.conditioner.embedders[0]
    assert emb.__class__.__name__ == "T5EncoderModel"
    assert emb.ucg_rate == 0.1 and emb.legacy_ucg_val == ""
    assert emb.max_length == 512


@pytest.mark.skipif(not os.path.exists(REF_MODEL_YAML), reason="reference absent")
def test_reference_14b_config_parses():
    from scail_tpu.models.dit import DiTConfig
    from scail_tpu.utils.config import load_configs

    cfg = load_configs([REF_MODEL_YAML])
    params = dict(cfg["model"]["network_config"]["params"])
    params.pop("transformer_args", None)
    dit = DiTConfig.from_network_config(params, use_i2v_clip=True)
    assert dit.hidden_size == 5120 and dit.num_layers == 40
    assert dit.inner_hidden_size == 13824 and dit.num_heads == 40
    assert dit.in_channels == 20 and dit.out_channels == 16


def test_network_config_maps_remat_and_sta_keys():
    """YAML-level remat/sta knobs reach DiTConfig (a silently-dropped
    remat_policy key would disable the documented save_attn_frac path)."""
    from scail_tpu.models.dit import DiTConfig

    cfg = DiTConfig.from_network_config(dict(
        hidden_size=32, num_layers=2, num_attention_heads=4,
        inner_hidden_size=48, remat=True, remat_policy="save_attn_frac",
        remat_save_frac=0.5, attn_impl="sta", sta_window=[5, 1],
        sta_pose_kv_window=0))
    assert cfg.remat and cfg.remat_policy == "save_attn_frac"
    assert cfg.remat_save_frac == 0.5
    assert cfg.attn_impl == "sta" and cfg.sta_window == (5, 1)
    assert cfg.sta_pose_kv_window == 0
