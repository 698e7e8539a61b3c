"""AutoencoderKL — the SD-family continuous first stage.

Reference: sgm/models/autoencoder.py:445-528 (AutoencodingEngineLegacy +
AutoencoderKL) composing sgm/modules/diffusionmodules/model.py's taming
Encoder/Decoder (the same stacks as the VQ path, double_z moments head)
with the DiagonalGaussian regularizer.

Functional JAX, channels-last: encoder -> 1x1 quant_conv (2z -> 2*embed)
-> diagonal-Gaussian sample/mode -> 1x1 post_quant_conv -> decoder.
Torch checkpoint ingestion reuses the vqgan converters (identical
state_dict layout minus the quantizer).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from scail_tpu.autoencoding.discriminator import _conv2d
from scail_tpu.autoencoding.regularizers import diagonal_gaussian_regularizer
from scail_tpu.autoencoding.vqgan import (_kconv, _t_conv, decoder_apply,
                                          decoder_params_from_torch,
                                          encoder_apply,
                                          encoder_params_from_torch,
                                          init_decoder, init_encoder)
from scail_tpu.utils.registry import register


@register(alias="sgm.models.autoencoder.AutoencoderKL")
class AutoencoderKL:
    """KL-regularized VAE (autoencoder.py:516-528).  `sample=True` draws
    the reparameterized latent (needs a key); inference callers use
    encode(..., sample=False) for the posterior mode — the
    AutoencoderKLModeOnly behaviour (autoencoder.py:610-622)."""

    sample_default = True

    def __init__(self, ddconfig: Dict, embed_dim: int, lossconfig=None,
                 loss_config=None, ckpt_path: Optional[str] = None, **_):
        self.ddconfig = dict(ddconfig)
        self.ddconfig["double_z"] = True
        self.embed_dim = embed_dim
        self.params = None
        if ckpt_path:
            import os

            if os.path.exists(str(ckpt_path)):
                from scail_tpu.convert.torch_ckpt import load_torch_state_dict

                self.params = autoencoder_kl_params_from_torch(
                    load_torch_state_dict(ckpt_path), self.ddconfig)

    def init_params(self, key) -> Dict:
        ks = jax.random.split(key, 4)
        z = self.ddconfig["z_channels"]
        self.params = {
            "encoder": init_encoder(ks[0], **self.ddconfig),
            "decoder": init_decoder(ks[1], **self.ddconfig),
            "quant_conv": _kconv(ks[2], 1, 2 * z, 2 * self.embed_dim),
            "post_quant_conv": _kconv(ks[3], 1, self.embed_dim, z),
        }
        return self.params

    def moments(self, params, x):
        """x (b, h, w, 3) -> (b, h/f, w/f, 2*embed) mean‖logvar."""
        h = encoder_apply(params["encoder"], x)
        return _conv2d(params["quant_conv"], h, padding=((0, 0), (0, 0)))

    def encode(self, params, x, key=None, sample: Optional[bool] = None):
        sample = self.sample_default if sample is None else sample
        z, _ = diagonal_gaussian_regularizer(
            self.moments(params, x), key=key, sample=sample)
        return z

    def encode_with_reg(self, params, x, key=None,
                        sample: Optional[bool] = None):
        """(z, {'kl_loss': ...}) for the AutoencoderTrainer path."""
        sample = self.sample_default if sample is None else sample
        return diagonal_gaussian_regularizer(
            self.moments(params, x), key=key, sample=sample)

    def decode(self, params, z):
        h = _conv2d(params["post_quant_conv"], z, padding=((0, 0), (0, 0)))
        return decoder_apply(params["decoder"], h)

    def __call__(self, params, x, key=None):
        z, log = self.encode_with_reg(params, x, key=key)
        return self.decode(params, z), log["kl_loss"]


@register(alias="sgm.models.autoencoder.AutoencoderKLModeOnly")
@register(alias="sgm.models.autoencoder.AutoencoderKLInferenceWrapper")
class AutoencoderKLModeOnly(AutoencoderKL):
    """Deterministic encode (posterior mean), autoencoder.py:610-622."""

    sample_default = False


def autoencoder_kl_params_from_torch(sd: Dict, ddconfig: Dict) -> Dict:
    """Reference AutoencoderKL state_dict -> JAX tree (the
    encoder./decoder./quant_conv/post_quant_conv layout of
    autoencoder.py:462-467)."""
    dd = dict(ddconfig)
    dd["double_z"] = True
    return {
        "encoder": encoder_params_from_torch(sd, dd),
        "decoder": decoder_params_from_torch(sd, dd),
        "quant_conv": _t_conv(sd, "quant_conv"),
        "post_quant_conv": _t_conv(sd, "post_quant_conv"),
    }
