"""VideoDiffusionEngine — the composition root
(reference: diffusion_video.SATVideoDiffusionEngine, diffusion_video.py:41-849).

Holds the DiT + denoiser + sampler + conditioner + CLIP + VAE + loss built
data-driven from the YAML `model:` block, and exposes:
  * sample(key, c, uc, shape)      (reference :457-587)
  * encode_first_stage / decode_first_stage (:298-331)
  * loss(key, batch_latents, cond) (shared_step/forward, :333-454)

Differences by design (TPU-native):
  * noise comes from an explicit PRNG key; the reference's data-broadcast
    collectives (:486-493) are unnecessary because every shard folds the
    same key.
  * sequence-parallel spatial chunking (:495-552) is expressed as sharding
    the latent over the 'seq' mesh axis; the gather (:571-585) is XLA's job.
  * the whole 50-step CFG loop is one jitted `lax.scan`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from scail_tpu.utils.logging import print_rank0
from scail_tpu.utils.registry import ensure_imports, instantiate_from_config
from scail_tpu.utils.misc import default


def _half_res(video):
    """0.5x bilinear downsample of a (b, T, C, H, W) clip (the
    smpl_downsample representation, sample_video.py:350-351)."""
    from scail_tpu.ops.resize import resize_bilinear

    H, W = video.shape[-2:]
    return resize_bilinear(video, H // 2, W // 2)


class VideoDiffusionEngine:
    def __init__(self, model_config: Dict, args=None):
        ensure_imports()
        mc = dict(model_config)
        self.scale_factor = mc.get("scale_factor", 1.0)
        self.latent_input = mc.get("latent_input", False)
        self.use_pose = mc.get("use_pose", False)
        self.use_i2v_clip = mc.get("use_i2v_clip", False)
        self.i2v_encode_video = mc.get("i2v_encode_video", False)
        self.noised_image_input = mc.get("noised_image_input", False)
        self.image_cond_dropout = mc.get("image_cond_dropout", 0.0)
        self.pose_dropout = mc.get("pose_dropout", 0.0)

        # dtype selection (reference :94-106)
        def _flag(name, default=False):
            if args is None:
                return default
            if isinstance(args, dict):
                return args.get(name, default)
            return getattr(args, name, default)

        if _flag("fp16"):
            dtype_str = "fp16"
        elif not _flag("bf16", True):
            dtype_str = "fp32"
        else:
            dtype_str = "bf16"
        self.dtype_str = dtype_str

        network_config = dict(mc["network_config"])
        network_config.setdefault("params", {})
        network_config["params"] = dict(network_config["params"])
        network_config["params"]["dtype"] = dtype_str
        network_config["params"]["use_i2v_clip"] = self.use_i2v_clip
        self.network = instantiate_from_config(network_config)

        self.denoiser = instantiate_from_config(mc["denoiser_config"])
        self.sampler = (
            instantiate_from_config(mc["sampler_config"])
            if mc.get("sampler_config") else None
        )
        self.conditioner = (
            instantiate_from_config(mc["conditioner_config"])
            if mc.get("conditioner_config") else None
        )
        self.i2v_clip = (
            instantiate_from_config(mc["i2v_clip_config"])
            if self.use_i2v_clip and mc.get("i2v_clip_config") else None
        )
        self.first_stage_model = (
            instantiate_from_config(mc["first_stage_config"])
            if mc.get("first_stage_config") else None
        )
        self.loss_fn = (
            instantiate_from_config(mc["loss_fn_config"])
            if mc.get("loss_fn_config") else None
        )

        self.params: Dict = {}
        self.mesh = None

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------
    def init_params(self, key):
        """Random-init every sub-model that has no checkpoint loaded
        (smoke mode; real runs load converted weights)."""
        import dataclasses as _dc

        kd, kv, kc, kt = jax.random.split(key, 4)
        self.params["dit"] = self.network.init(kd)
        if self.first_stage_model is not None and self.first_stage_model.params is None:
            self.first_stage_model.init(kv)
        if self.i2v_clip is not None and self.i2v_clip.params is None:
            self.i2v_clip.init(kc)
        for emb in getattr(self.conditioner, "embedders", []):
            if getattr(emb, "params", None) is None and hasattr(emb, "init"):
                cfg = getattr(emb, "config", None)
                if cfg is not None and hasattr(cfg, "num_layers"):
                    # keep width (the DiT consumes text_dim) but cut depth:
                    # a weightless random init only needs shape-correct
                    # embeddings, not 24 umt5-xxl layers of them
                    emb.init(kt, _dc.replace(cfg, num_layers=min(cfg.num_layers, 2)))
                else:
                    emb.init(kt)
        return self.params

    def load_checkpoint(self, load_dir: str):
        """Read the SAT layout `<dir>/<latest>/mp_rank_00_model_states.pt`
        (sat/training/model_io.py:260-327)."""
        from scail_tpu.convert.torch_ckpt import (
            dit_params_from_state_dict, load_torch_state_dict,
            resolve_latest_checkpoint,
        )

        path = resolve_latest_checkpoint(load_dir)
        print_rank0(f"loading DiT checkpoint from {path}")
        sd = load_torch_state_dict(path)
        self.params["dit"] = dit_params_from_state_dict(sd, self.network.config)
        return self.params

    def load_orbax(self, bundle_dir: str):
        """Load a converted Orbax bundle (scripts/convert_checkpoint.py)."""
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        bundle_dir = os.path.abspath(bundle_dir)
        if os.path.isdir(os.path.join(bundle_dir, "dit")):
            from scail_tpu.models.dit import unsplit_layer_params

            # bundles written by a save_attn_frac training run store the
            # pre-split layer stack; restore the stacked layout unless
            # this engine trains with the same policy
            restored = ckptr.restore(os.path.join(bundle_dir, "dit"))
            cfg = self.network.config
            if not (getattr(cfg, "remat", False)
                    and getattr(cfg, "remat_policy", "") == "save_attn_frac"):
                restored = unsplit_layer_params(restored)
            self.params["dit"] = restored
        if (self.first_stage_model is not None
                and os.path.isdir(os.path.join(bundle_dir, "vae"))):
            self.first_stage_model.params = ckptr.restore(
                os.path.join(bundle_dir, "vae"))
        if (self.i2v_clip is not None
                and os.path.isdir(os.path.join(bundle_dir, "clip"))):
            self.i2v_clip.params = ckptr.restore(os.path.join(bundle_dir, "clip"))
        if self.conditioner is not None:
            for emb in getattr(self.conditioner, "embedders", []):
                if hasattr(emb, "params") and os.path.isdir(
                        os.path.join(bundle_dir, "umt5")):
                    emb.params = ckptr.restore(os.path.join(bundle_dir, "umt5"))
        return self.params

    def shard_params(self, mesh):
        from scail_tpu.parallel.sharding import shard_tree

        self.mesh = mesh
        self.params["dit"] = shard_tree(
            self.params["dit"], self.network.param_rules(), mesh
        )

    # ------------------------------------------------------------------
    # network wrapper (OpenAIWrapper, sgm/.../wrappers.py:24-45)
    # ------------------------------------------------------------------
    def network_fn(self, params):
        cfg = self.network.config

        def fn(x, c_noise, cond: Dict, **kw):
            if "concat" in cond:  # channel concat on dim 2 for 5D input
                x = jnp.concatenate([x, cond["concat"].astype(x.dtype)], axis=2)
            extra = {}
            if cfg.cfg_embed_dim and kw.get("cfg_scale") is not None:
                extra["cfg_scale"] = kw["cfg_scale"]
            return self.network.apply(
                params, x, c_noise, cond["crossattn"],
                ref_concat=cond["ref_concat"],
                concat_smpl_render=cond["concat_smpl_render"],
                image_clip_features=cond.get("image_clip_features"),
                history_mask=kw.get("history_mask"),
                mesh=self.mesh,
                **extra,
            )

        return fn

    # ------------------------------------------------------------------
    # first stage (reference :298-331)
    # ------------------------------------------------------------------
    def encode_first_stage(self, x, force_encode: bool = False, streamed=None):
        """x: (b, T, 3, H, W) in [-1,1] -> scaled latent (b, t, 16, h, w)."""
        if not force_encode and self.latent_input:
            return x * self.scale_factor
        streamed = default(streamed, x.shape[1] > 9)
        z = self.first_stage_model.encode(x, streamed=streamed)
        return z * self.scale_factor

    def decode_first_stage(self, z, streamed=None):
        z = z / self.scale_factor
        streamed = default(streamed, z.shape[1] > 3)
        return self.first_stage_model.decode(z, streamed=streamed)

    # ------------------------------------------------------------------
    # sampling (reference :456-587)
    # ------------------------------------------------------------------
    def sample(
        self,
        key,
        cond: Dict,
        uc: Optional[Dict] = None,
        batch_size: int = 1,
        shape: Tuple[int, int, int, int] = None,
        prefix=None,
        tile_indices=None,
        params=None,
        **kw,
    ):
        """Pass `params` explicitly when calling under jit so the weights are
        jit ARGUMENTS, not captured constants (multi-GB constant capture
        breaks/blows up compilation)."""
        randn = jax.random.normal(key, (batch_size, *shape), jnp.float32)
        if prefix is not None:
            randn = jnp.concatenate([prefix, randn[:, prefix.shape[1]:]], axis=1)

        net = self.network_fn(params if params is not None else self.params["dit"])

        def denoise_fn(x, sigma, c, cfg_scale=None, **dkw):
            return self.denoiser(net, x, sigma, c, **dkw)

        sampler_kw = {}
        if tile_indices is not None:
            sampler_kw["tile_indices"] = tile_indices
        samples = self.sampler(denoise_fn, randn, cond, uc=uc, **sampler_kw)
        return samples.astype(self.network.config.compute_dtype)

    # ------------------------------------------------------------------
    # training loss (reference :333-454 + RFLoss)
    # ------------------------------------------------------------------
    def loss(self, key, latents, cond: Dict, history_mask=None):
        net = self.network_fn(self.params["dit"])
        return self.loss_fn(
            key, net, self.denoiser, cond, latents,
            history_mask=history_mask,
            patch_size=self.network.config.patch_size,
        )

    def add_noise_to_first_frame(self, key, image):
        """sigma ~ exp(N(-2.5, 0.5)); image + sigma*noise (reference :350-355)."""
        k1, k2 = jax.random.split(key)
        sigma = jnp.exp(-2.5 + 0.5 * jax.random.normal(k1, (image.shape[0],)))
        noise = jax.random.normal(k2, image.shape) * sigma[:, None, None, None, None]
        return image + noise.astype(image.dtype)

    def shared_step(self, key, batch: Dict):
        """Raw-pixel training step: VAE-encode x/ref/pose, apply
        image/pose conditioning dropout, embed text, compute RFLoss
        (reference shared_step, diffusion_video.py:357-454, wan branch).

        batch: {'mp4': (b,T,3,H,W), 'pose': (b,T,3,H,W),
                'ref_frame': (b,1,3,H,W), 'txt': [str]*b} in [-1,1].
        Returns (loss_mean, loss_dict)."""
        assert self.use_pose and self.noised_image_input and self.i2v_encode_video
        k_noise, k_imgdrop, k_posedrop, k_loss, k_clip = jax.random.split(key, 5)
        x_pix = batch["mp4"]
        ref = batch["ref_frame"]
        pose_pix = batch["pose"]
        b, T = x_pix.shape[:2]

        # noised first-frame conditioning latent [noisy ref ‖ zeros] (:368-377)
        noisy_ref = self.add_noise_to_first_frame(k_noise, ref)
        img_seq = jnp.concatenate(
            [noisy_ref, jnp.zeros_like(x_pix[:, 1:])], axis=1)
        concat_images = self.encode_first_stage(img_seq, force_encode=True)
        ref_concat = self.encode_first_stage(ref, force_encode=True, streamed=False)
        latents = self.encode_first_stage(x_pix, force_encode=True)
        pose_latent = self.encode_first_stage(
            _half_res(pose_pix), force_encode=True)

        # conditioning dropout (:385-407)
        keep_img = jax.random.bernoulli(
            k_imgdrop, 1.0 - self.image_cond_dropout, (b,)).astype(concat_images.dtype)
        concat_images = concat_images * keep_img[:, None, None, None, None]
        keep_pose = jax.random.bernoulli(
            k_posedrop, 1.0 - self.pose_dropout, (b,)).astype(pose_latent.dtype)
        pose_latent = pose_latent * keep_pose[:, None, None, None, None]

        # text embedding: precomputed (jit-friendly: tokenization is host
        # work) or via the conditioner when running eagerly
        if "crossattn" in batch:
            cond = {"crossattn": batch["crossattn"]}
        elif self.conditioner is not None:
            cond = self.conditioner(batch)
        else:
            cond = {}
        cond["concat_images"] = concat_images
        cond["ref_concat"] = ref_concat
        cond["concat_smpl_render"] = pose_latent
        if self.use_i2v_clip and self.i2v_clip is not None:
            cond["image_clip_features"] = self.i2v_clip.visual(
                jnp.transpose(ref, (0, 2, 1, 3, 4)))

        loss = self.loss(k_loss, latents, cond,
                         history_mask=batch.get("history_mask"))
        loss_mean = jnp.mean(loss)
        return loss_mean, {"diffusion loss": loss_mean}
