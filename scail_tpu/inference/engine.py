"""ImageDiffusionEngine — the sgm DiffusionEngine for image models.

Reference: sgm/models/diffusion.py:24-120 (config composition,
first-stage scale factor, OpenAIWrapper input routing from
sgm/modules/diffusionmodules/wrappers.py:24-45).

Functional JAX shell in the VideoDiffusionEngine style (engine.py):
sub-models are config objects, params live in one pytree passed
explicitly, and the wrapper routing happens in `network_fn`:
`concat` joins the latent on the channel axis (last: NHWC),
`crossattn` feeds the UNet context, `vector` its adm/class vector y.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from scail_tpu.utils.registry import (ensure_imports, instantiate_from_config,
                                      register)


@register(alias="sgm.models.diffusion.DiffusionEngine")
class ImageDiffusionEngine:
    def __init__(self, network_config: Dict, denoiser_config: Dict,
                 first_stage_config: Optional[Dict] = None,
                 conditioner_config: Optional[Dict] = None,
                 sampler_config: Optional[Dict] = None,
                 loss_fn_config: Optional[Dict] = None,
                 scale_factor: float = 1.0, input_key: str = "jpg",
                 disable_first_stage_autocast: bool = False,
                 network_wrapper=None, ckpt_path: Optional[str] = None,
                 **_):
        ensure_imports()
        self.scale_factor = scale_factor
        self.input_key = input_key
        self.network = instantiate_from_config(network_config)
        self.denoiser = instantiate_from_config(denoiser_config)
        self.first_stage_model = (instantiate_from_config(first_stage_config)
                                  if first_stage_config else None)
        self.conditioner = (instantiate_from_config(conditioner_config)
                            if conditioner_config else None)
        self.sampler = (instantiate_from_config(sampler_config)
                        if sampler_config else None)
        self.loss_fn = (instantiate_from_config(loss_fn_config)
                        if loss_fn_config else None)
        self.params: Dict = {}
        if ckpt_path:
            self.load_checkpoint(ckpt_path)

    # ------------------------------------------------------------------
    def init_params(self, key):
        """Random-init smoke mode (weights-day runs load a checkpoint)."""
        ku, kv, kc = jax.random.split(key, 3)
        self.params["unet"] = self.network.init(ku)
        if self.first_stage_model is not None:
            self.params["first_stage"] = self.first_stage_model.init_params(kv)
        if self.conditioner is not None:
            for i, emb in enumerate(self.conditioner.embedders):
                if getattr(emb, "params", "absent") is None:
                    emb.init(jax.random.fold_in(kc, i))
        return self.params

    def load_checkpoint(self, path: str):
        """Ingest a reference torch checkpoint: model.diffusion_model.* is
        the UNet (wrappers.py OpenAIWrapper layout), first_stage_model.*
        the KL VAE, conditioner.embedders.N.* the text towers
        (diffusion.py:89-108 init_from_ckpt)."""
        from scail_tpu.convert.torch_ckpt import load_torch_state_dict
        from scail_tpu.models.unet import unet_params_from_torch

        sd = load_torch_state_dict(path)

        def sub(prefix):
            pl = len(prefix)
            return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix)}

        self.params["unet"] = unet_params_from_torch(
            sub("model.diffusion_model."), self.network)
        if self.first_stage_model is not None:
            from scail_tpu.autoencoding.autoencoder_kl import (
                autoencoder_kl_params_from_torch)

            self.params["first_stage"] = autoencoder_kl_params_from_torch(
                sub("first_stage_model."), self.first_stage_model.ddconfig)
        if self.conditioner is not None:
            for i, emb in enumerate(self.conditioner.embedders):
                esub = sub(f"conditioner.embedders.{i}.")
                if esub and hasattr(emb, "load_state_dict"):
                    # strip the module attribute the torch embedder wraps
                    for head in ("transformer.", "model."):
                        if any(k.startswith(head) for k in esub):
                            esub = {k[len(head):]: v for k, v in esub.items()
                                    if k.startswith(head)}
                            break
                    emb.load_state_dict(esub)
        return self.params

    # ------------------------------------------------------------------
    def network_fn(self, params):
        """OpenAIWrapper routing (wrappers.py:24-45), channels-last."""

        def net(x, c_noise, cond, **kw):
            if cond.get("concat") is not None:
                x = jnp.concatenate(
                    [x, cond["concat"].astype(x.dtype)], axis=-1)
            return self.network(params, x, c_noise,
                                context=cond.get("crossattn"),
                                y=cond.get("vector"))

        return net

    def denoise_fn(self, params=None):
        net = self.network_fn(
            params if params is not None else self.params["unet"])

        def fn(x, sigma, c, cfg_scale=None, **kw):
            return self.denoiser(net, x, sigma, c)

        return fn

    # ------------------------------------------------------------------
    def encode_first_stage(self, x, key=None):
        """x (b, h, w, 3) in [-1, 1] -> z * scale_factor
        (diffusion.py:142-154)."""
        z = self.first_stage_model.encode(
            self.params["first_stage"], x, key=key)
        return self.scale_factor * z

    def decode_first_stage(self, z):
        """(diffusion.py:122-140): out = decoder(z / scale_factor)."""
        return self.first_stage_model.decode(
            self.params["first_stage"], z / self.scale_factor)

    # ------------------------------------------------------------------
    def sample(self, key, cond: Dict, uc: Optional[Dict] = None,
               batch_size: int = 1,
               shape: Tuple[int, int, int] = None, **kw):
        randn = jax.random.normal(key, (batch_size, *shape), jnp.float32)
        return self.sampler(self.denoise_fn(), randn, cond, uc=uc, **kw)
