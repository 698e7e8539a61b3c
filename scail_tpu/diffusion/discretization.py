"""Noise-level discretizations
(reference: sgm/modules/diffusionmodules/discretizer.py).

Schedules are tiny host-side numpy computations; samplers treat them as
static constants folded into the jitted loop.
"""

from __future__ import annotations

import numpy as np

from scail_tpu.utils.registry import register


def generate_roughly_equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    """(discretizer.py:11-14)"""
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


def append_zero(x):
    return np.concatenate([x, np.zeros((1,), x.dtype)])


def append_one(x):
    return np.concatenate([x, np.ones((1,), x.dtype)])


@register(alias="sgm.modules.diffusionmodules.discretizer.RFDiscretization")
class RFDiscretization:
    """Rectified-flow sigmas in (0,1] (discretizer.py:130-180)."""

    def __init__(self, num_timesteps: int = 1000, reverse: bool = False, shift_scale: float = 1.0):
        self.num_timesteps = num_timesteps
        self.reverse = reverse
        if reverse:
            self.sigmas = np.linspace(1, 0, num_timesteps + 1)[1:]
        else:
            self.sigmas = np.linspace(0, 1, num_timesteps + 1)[1:]

    def get_sigmas(self, n: int, return_idx: bool = False):
        if n < self.num_timesteps:
            timesteps = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            sigmas = self.sigmas[timesteps]
        elif n == self.num_timesteps:
            sigmas = self.sigmas
            timesteps = np.arange(n)
        else:
            raise ValueError(n)
        sigmas = np.flip(sigmas, 0).astype(np.float32)
        return (sigmas, timesteps) if return_idx else sigmas

    def __call__(self, n: int, do_append_zero: bool = True, flip: bool = False,
                 return_idx: bool = False):
        out = self.get_sigmas(n, return_idx=return_idx)
        sigmas, idx = out if return_idx else (out, None)
        if do_append_zero:
            sigmas = append_one(sigmas) if self.reverse else append_zero(sigmas)
        sigmas = np.flip(sigmas, 0).copy() if flip else sigmas
        return (sigmas, idx) if return_idx else sigmas


@register(alias="sgm.modules.diffusionmodules.discretizer.EDMDiscretization")
class EDMDiscretization:
    def __init__(self, sigma_min=0.002, sigma_max=80.0, rho=7.0):
        self.sigma_min, self.sigma_max, self.rho = sigma_min, sigma_max, rho

    def get_sigmas(self, n: int, return_idx: bool = False):
        ramp = np.linspace(0, 1, n)
        min_r = self.sigma_min ** (1 / self.rho)
        max_r = self.sigma_max ** (1 / self.rho)
        sigmas = (max_r + ramp * (min_r - max_r)) ** self.rho
        return (sigmas.astype(np.float32), None) if return_idx else sigmas.astype(np.float32)

    def __call__(self, n, do_append_zero=True, flip=False, return_idx=False):
        sigmas = self.get_sigmas(n)
        if do_append_zero:
            sigmas = append_zero(sigmas)
        sigmas = np.flip(sigmas, 0).copy() if flip else sigmas
        return (sigmas, None) if return_idx else sigmas


@register(alias="sgm.modules.diffusionmodules.discretizer.ZeroSNRDDPMDiscretization")
class ZeroSNRDDPMDiscretization:
    """DDPM alphas_cumprod_sqrt rescaled so the final step has zero SNR
    (discretizer.py:77-129); returns sqrt(alpha_cumprod) ladders used by
    VideoDDIMSampler / VideoScaling (CogVideo lineage)."""

    def __init__(self, linear_start=0.00085, linear_end=0.0120,
                 num_timesteps=1000, shift_scale=1.0, keep_start=False,
                 post_shift=False):
        if keep_start and not post_shift:
            linear_start = linear_start / (shift_scale + (1 - shift_scale) * linear_start)
        self.num_timesteps = num_timesteps
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                            num_timesteps, dtype=np.float64) ** 2
        self.alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        if not post_shift:
            self.alphas_cumprod = self.alphas_cumprod / (
                shift_scale + (1 - shift_scale) * self.alphas_cumprod)
        self.post_shift = post_shift
        self.shift_scale = shift_scale

    def get_sigmas(self, n: int, return_idx: bool = False):
        if n < self.num_timesteps:
            timesteps = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            ac = self.alphas_cumprod[timesteps]
        elif n == self.num_timesteps:
            ac = self.alphas_cumprod
            timesteps = np.arange(n)
        else:
            raise ValueError(n)
        s = np.sqrt(ac)
        s0, sT = s[0], s[-1]
        s = (s - sT) * s0 / (s0 - sT)  # zero terminal SNR rescale
        if self.post_shift:
            s = np.sqrt(s ** 2 / (self.shift_scale + (1 - self.shift_scale) * s ** 2))
        s = np.flip(s, 0).astype(np.float32).copy()
        return (s, timesteps) if return_idx else s

    def __call__(self, n, do_append_zero=True, flip=False, return_idx=False):
        out = self.get_sigmas(n, return_idx=return_idx)
        sigmas, idx = out if return_idx else (out, None)
        # NOTE: for alphas_cumprod_sqrt ladders append_zero appends alpha=1
        # at the caller (VideoDDIMSampler.prepare_sampling_loop)
        sigmas = np.flip(sigmas, 0).copy() if flip else sigmas
        return (sigmas, idx) if return_idx else sigmas


@register(alias="sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization")
class LegacyDDPMDiscretization:
    def __init__(self, linear_start=0.00085, linear_end=0.0120, num_timesteps=1000):
        self.num_timesteps = num_timesteps
        betas = (
            np.linspace(linear_start ** 0.5, linear_end ** 0.5, num_timesteps) ** 2
        )
        self.alphas_cumprod = np.cumprod(1.0 - betas, axis=0)

    def get_sigmas(self, n: int, return_idx: bool = False):
        if n < self.num_timesteps:
            timesteps = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            alphas_cumprod = self.alphas_cumprod[timesteps]
        else:
            alphas_cumprod = self.alphas_cumprod
            timesteps = np.arange(n)
        sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
        sigmas = np.flip(sigmas, 0).astype(np.float32)
        return (sigmas, timesteps) if return_idx else sigmas

    def __call__(self, n, do_append_zero=True, flip=False, return_idx=False):
        out = self.get_sigmas(n, return_idx=return_idx)
        sigmas, idx = out if return_idx else (out, None)
        if do_append_zero:
            sigmas = append_zero(sigmas)
        sigmas = np.flip(sigmas, 0).copy() if flip else sigmas
        return (sigmas, idx) if return_idx else sigmas
