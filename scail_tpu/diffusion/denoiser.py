"""Denoiser wrappers (reference: sgm/modules/diffusionmodules/denoiser.py).

`network_fn(x, c_noise, cond, **kw)` is the wrapped DiT call; the denoiser
applies the scaling around it: out = net(x*c_in, c_noise)*c_out + x*c_skip.
"""

from __future__ import annotations

import jax.numpy as jnp

from scail_tpu.utils.misc import append_dims
from scail_tpu.utils.registry import instantiate_from_config, register


@register(alias="sgm.modules.diffusionmodules.denoiser.Denoiser")
class Denoiser:
    def __init__(self, weighting_config, scaling_config):
        self.weighting = instantiate_from_config(weighting_config)
        self.scaling = instantiate_from_config(scaling_config)

    def possibly_quantize_sigma(self, sigma):
        return sigma

    def possibly_quantize_c_noise(self, c_noise):
        return c_noise

    def w(self, sigma):
        return self.weighting(sigma)

    def __call__(self, network_fn, x, sigma, cond, **kw):
        sigma = self.possibly_quantize_sigma(sigma)
        sigma_shape = sigma.shape
        sigma_b = append_dims(sigma, x.ndim)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma_b, **kw)
        c_noise = self.possibly_quantize_c_noise(c_noise.reshape(sigma_shape))
        out = network_fn((x * c_in).astype(x.dtype), c_noise, cond, **kw)
        return out.astype(jnp.float32) * c_out + x.astype(jnp.float32) * c_skip


@register(alias="sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser")
class DiscreteDenoiser(Denoiser):
    """Sigma-quantizing denoiser (denoiser.py:47-79)."""

    def __init__(self, weighting_config, scaling_config, num_idx,
                 discretization_config, do_append_zero=False,
                 quantize_c_noise=True, flip=True):
        super().__init__(weighting_config, scaling_config)
        disc = instantiate_from_config(discretization_config)
        self.sigmas = jnp.asarray(disc(num_idx, do_append_zero=do_append_zero, flip=flip))
        self.quantize_c_noise = quantize_c_noise

    def sigma_to_idx(self, sigma):
        dists = sigma - self.sigmas[:, None]
        return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)

    def idx_to_sigma(self, idx):
        return self.sigmas[idx]

    def possibly_quantize_sigma(self, sigma):
        return self.idx_to_sigma(self.sigma_to_idx(sigma))

    def possibly_quantize_c_noise(self, c_noise):
        if self.quantize_c_noise:
            return self.sigma_to_idx(c_noise)
        return c_noise


@register(alias="sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser_TASD")
class DiscreteDenoiserTASD(DiscreteDenoiser):
    """TASD variant (denoiser.py:82-94): sigma is per-frame (b, t), so the
    nearest-sigma lookup broadcasts over an arbitrary-rank sigma."""

    def sigma_to_idx(self, sigma):
        dists = sigma[None] - self.sigmas.reshape((-1,) + (1,) * sigma.ndim)
        return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)
