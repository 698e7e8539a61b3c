"""Denoiser scalings and loss weightings
(reference: sgm/modules/diffusionmodules/denoiser_scaling.py, denoiser_weighting.py).

Each scaling maps sigma -> (c_skip, c_out, c_in, c_noise); the denoiser
computes `network(x*c_in, c_noise)*c_out + x*c_skip`.
"""

from __future__ import annotations

import jax.numpy as jnp

from scail_tpu.utils.registry import register


@register(alias="sgm.modules.diffusionmodules.denoiser_scaling.RFScaling")
class RFScaling:
    """Rectified flow: identity wrapper, timestep = sigma*1000
    (denoiser_scaling.py:71-78)."""

    def __call__(self, sigma, **kw):
        ones = jnp.ones_like(sigma)
        return jnp.zeros_like(sigma), ones, ones, sigma * 1000.0


@register(alias="sgm.modules.diffusionmodules.denoiser_scaling.EDMScaling")
class EDMScaling:
    def __init__(self, sigma_data: float = 0.5):
        self.sigma_data = sigma_data

    def __call__(self, sigma, **kw):
        sd2 = self.sigma_data ** 2
        c_skip = sd2 / (sigma ** 2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma ** 2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + sd2)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise


@register(alias="sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling")
class EpsScaling:
    def __call__(self, sigma, **kw):
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
        return c_skip, c_out, c_in, sigma

@register(alias="sgm.modules.diffusionmodules.denoiser_scaling.VScaling")
class VScaling:
    def __call__(self, sigma, **kw):
        c_skip = 1.0 / (sigma ** 2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma ** 2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
        return c_skip, c_out, c_in, sigma


@register(alias="sgm.modules.diffusionmodules.denoiser_scaling.VideoScaling")
class VideoScaling:
    """alphas_cumprod_sqrt parametrization (denoiser_scaling.py:62-69)."""

    def __call__(self, alphas_cumprod_sqrt, idx=None, **kw):
        c_skip = alphas_cumprod_sqrt
        c_out = -jnp.sqrt(1.0 - alphas_cumprod_sqrt ** 2)
        c_in = jnp.ones_like(alphas_cumprod_sqrt)
        return c_skip, c_out, c_in, idx


# -- weightings (denoiser_weighting.py) ------------------------------------
@register(alias="sgm.modules.diffusionmodules.denoiser_weighting.UnitWeighting")
class UnitWeighting:
    def __call__(self, sigma):
        return jnp.ones_like(sigma)


@register(alias="sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting")
class EpsWeighting:
    def __call__(self, sigma):
        return sigma ** -2.0


@register(alias="sgm.modules.diffusionmodules.denoiser_weighting.VWeighting")
class VWeighting:
    def __call__(self, sigma):
        return 1.0 / (sigma ** 2 + 1.0)
