"""Tiny model configs for tests, the graft entry, and smoke benches."""

from __future__ import annotations


def tiny_model_config(hidden=32, heads=2, layers=2, inner=48, vae_dim=8,
                      clip_small=True):
    """A complete engine config at toy scale, same graph as the 14B YAML."""
    return {
        "use_i2v_clip": True,
        "i2v_encode_video": True,
        "scale_factor": 1.0,
        "latent_input": True,
        "noised_image_input": True,
        "use_pose": True,
        "pose_dropout": 0.15,
        "denoiser_config": {
            "target": "sgm.modules.diffusionmodules.denoiser.Denoiser",
            "params": {
                "weighting_config": {
                    "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
                "scaling_config": {
                    "target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"},
            },
        },
        "network_config": {
            "target": "dit_video_crossattn_sc_xc.DiffusionTransformer",
            "params": {
                "time_freq_dim": 16,
                "time_embed_dim": hidden,
                "share_adaln": True,
                "elementwise_affine": False,
                "num_frames": 9,
                "time_compressed_rate": 4,
                "latent_width": 300,
                "latent_height": 300,
                "num_layers": layers,
                "patch_size": [1, 2, 2],
                "in_channels": 20,
                "out_channels": 16,
                "text_dim": 12,
                "hidden_size": hidden,
                "inner_hidden_size": inner,
                "num_attention_heads": heads,
                "layernorm_epsilon": 1e-6,
                "clip_dim": 10,
                "modules": {
                    "pos_embed_config": {
                        "target": "dit_video_crossattn_sc_xc.Rotary3DPositionEmbeddingMixin",
                        "params": {"hidden_size_head": hidden // heads,
                                   "interleaved_rope": True}},
                    "adaln_layer_config": {
                        "target": "dit_video_crossattn_sc_xc.AdaLNMixin",
                        "params": {"qk_ln": True, "qk_ln_affine": True,
                                   "hidden_size_head": hidden}},
                },
            },
        },
        "first_stage_config": {
            "target": "sgm.models.wan_vae.WanVAE",
            "params": {"z_dim": 16, "vae_pth": None, "dtype": "torch.bfloat16"},
        },
        "sampler_config": {
            "target": "sgm.modules.diffusionmodules.sampling.RFSampler",
            "params": {
                "mode": "normal",
                "hunyuan_schedule": True,
                "shift_scale": 5,
                "num_steps": 4,
                "discretization_config": {
                    "target": "sgm.modules.diffusionmodules.discretizer.RFDiscretization",
                    "params": {"reverse": False}},
                "guider_config": {
                    "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
                    "params": {"scale": 4}},
            },
        },
        "loss_fn_config": {
            "target": "sgm.modules.diffusionmodules.loss.RFLoss",
            "params": {
                "schedule_shift": True,
                "sigma_sampler_config": {
                    "target": "sgm.modules.diffusionmodules.sigma_sampling.RFSampling",
                    "params": {"p_mean": 0.0, "p_std": 1.0}},
            },
        },
    }


def tiny_cond(key, b=1, T=2, H=8, W=8, text_dim=12, clip_dim=10, dtype=None):
    """Random conditioning dict matching the tiny DiT's expectations."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 4)
    dt = dtype or jnp.float32
    return {
        "crossattn": jax.random.normal(ks[0], (b, 7, text_dim), dt),
        "ref_concat": jax.random.normal(ks[1], (b, 1, 16, H, W), dt),
        "concat_smpl_render": jax.random.normal(ks[2], (b, T, 16, H // 2, W // 2), dt),
        "image_clip_features": jax.random.normal(ks[3], (b, 5, clip_dim), dt),
    }
