"""Samplers (reference: sgm/modules/diffusionmodules/sampling.py).

The production SCAIL path is `RFSampler` (sampling.py:920-982): 50-step
rectified-flow Euler over the hunyuan-shifted schedule with VanillaCFG.
On TPU the whole denoise loop is one `lax.scan` inside a single `jit`:
the model compiles once and the sigma ladder folds in as constants.

`RFSamplerLong` (sampling.py:986-1084) is the temporally-tiled long-video
variant: each step denoises overlapping frame tiles with per-tile pose
conditioning and triangle-weight blending.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.utils.misc import append_dims, default
from scail_tpu.utils.registry import instantiate_from_config, register


def make_flow_sigmas(num_steps: int, shift_scale: float = 7.0, t_start: float = 0.0,
                     mode: str = "normal") -> np.ndarray:
    """Hunyuan shift schedule (sampling.py:888-903): linspace through
    s/(shift+s-shift*s); mode 'normal' returns 1-s so sigma_0=1 ... sigma_n=0."""
    s = np.linspace(t_start, 1.0, num_steps + 1, endpoint=True)
    s = s / (shift_scale + s - shift_scale * s)
    if mode == "meta":
        out = s
    elif mode == "normal":
        out = 1.0 - s
    else:
        raise ValueError(mode)
    return out.astype(np.float32)


def get_lin_function(x1: float = 256, y1: float = 0.5, x2: float = 4096, y2: float = 1.15):
    """(sampling.py:905-911)"""
    m = (y2 - y1) / (x2 - x1)
    b = y1 - m * x1
    return lambda x: m * x + b


def time_shift(mu: float, t, mode: str = "normal"):
    """(sampling.py:913-918)"""
    if mode == "meta":
        return 1.0 / (1.0 + math.exp(mu) / t - math.exp(mu))
    if mode == "normal":
        return math.exp(mu) / (math.exp(mu) + 1.0 / t - 1.0)
    raise ValueError(mode)


class BaseDiffusionSampler:
    def __init__(self, discretization_config, num_steps=None, guider_config=None,
                 verbose=False, device=None):
        self.num_steps = num_steps
        self.discretization = instantiate_from_config(discretization_config)
        self.guider = instantiate_from_config(
            default(guider_config,
                    {"target": "sgm.modules.diffusionmodules.guiders.IdentityGuider"})
        )
        self.verbose = verbose


@register(alias="sgm.modules.diffusionmodules.sampling.RFSampler")
class RFSampler(BaseDiffusionSampler):
    """Rectified-flow Euler sampler (sampling.py:920-982).

    __call__(denoise_fn, x, cond, uc) where denoise_fn(x, sigma, cond, **kw)
    returns the model velocity (the engine wraps denoiser+network+shared
    conds).  The CFG batch doubling happens once, outside the scan.
    """

    def __init__(self, schedule_shift=False, hunyuan_schedule=False, shift_scale=7,
                 mode="normal", distill=False, **kw):
        super().__init__(**kw)
        self.schedule_shift = schedule_shift
        self.hunyuan_schedule = hunyuan_schedule
        self.shift_scale = shift_scale
        self.mode = mode
        self.distill = distill

    def sigma_schedule(self, x_shape, num_steps=None) -> np.ndarray:
        n = default(num_steps, self.num_steps)
        sigmas = np.asarray(self.discretization(n))
        if self.schedule_shift:
            image_seq_len = x_shape[-1] * x_shape[-2]
            mu = get_lin_function(y1=0.5, y2=1.15)(image_seq_len)
            sigmas = np.asarray([time_shift(mu, float(s), mode=self.mode) for s in sigmas],
                                dtype=np.float32)
        if self.hunyuan_schedule:
            sigmas = make_flow_sigmas(n, shift_scale=self.shift_scale, mode=self.mode)
        return sigmas.astype(np.float32)

    def __call__(self, denoise_fn, x, cond: Dict, uc: Optional[Dict] = None,
                 num_steps=None, scale=None, **kw):
        uc = default(uc, cond)
        sigmas = self.sigma_schedule(x.shape, num_steps)
        cfg_scale = default(scale, self.guider.scale)
        b = x.shape[0]

        if self.distill:
            merged_cond = dict(cond)
        else:
            merged_cond = self.guider.prepare_cond(cond, uc)

        sig_pairs = jnp.asarray(np.stack([sigmas[:-1], sigmas[1:]], axis=1))

        def step(x, pair):
            sigma, next_sigma = pair[0], pair[1]
            s_in = jnp.full((b,), sigma, jnp.float32)
            if self.distill:
                v = denoise_fn(x, s_in, merged_cond, cfg_scale=cfg_scale, **kw)
                v = v.astype(jnp.float32)
            else:
                x2 = jnp.concatenate([x, x], axis=0)
                s2 = jnp.concatenate([s_in, s_in], axis=0)
                v = denoise_fn(x2, s2, merged_cond, cfg_scale=cfg_scale, **kw)
                v = self.guider(v.astype(jnp.float32), sigma, scale=cfg_scale)
            x = x + append_dims(next_sigma - sigma, x.ndim) * v
            return x, None

        x, _ = jax.lax.scan(step, x.astype(jnp.float32), sig_pairs)
        return x


@register(alias="sgm.modules.diffusionmodules.sampling.RFSamplerLong")
class RFSamplerLong(RFSampler):
    """Temporally tiled long-video RF sampling (sampling.py:986-1084).

    tile_indices: list of equal-length frame-index lists; consecutive pairs
    (k, k+1) are denoised per step with per-tile pose conditioning
    cond['smpl_tiled'][:, k] and blended with a triangle weight window.
    """

    def __call__(self, denoise_fn, x, cond: Dict, uc: Optional[Dict] = None,
                 num_steps=None, scale=None, tile_indices: Sequence[Sequence[int]] = None,
                 **kw):
        assert tile_indices is not None, "RFSamplerLong requires tile_indices"
        uc = default(uc, cond)
        sigmas = self.sigma_schedule(x.shape, num_steps)
        cfg_scale = default(scale, self.guider.scale)
        b = x.shape[0]

        sig_pairs = jnp.asarray(np.stack([sigmas[:-1], sigmas[1:]], axis=1))

        def step(x, pair):
            return self.long_step(denoise_fn, x, pair, tile_indices, cond,
                                  uc, cfg_scale=cfg_scale, **kw), None

        x, _ = jax.lax.scan(step, x.astype(jnp.float32), sig_pairs)
        return x

    def long_step(self, denoise_fn, x, pair, tile_indices, cond, uc,
                  cfg_scale=None, **kw):
        """One tiled denoise step (sampling.py:1025-1084): every
        consecutive tile pair (k, k+1) is denoised with its own pose
        conditioning `cond['smpl_tiled'][:, k]` and blended with a
        triangle weight window.  Exposed so benchmarks can host-drive the
        50-step loop one jitted step at a time (the axon tunnel kills
        multi-minute device programs)."""
        cfg_scale = default(cfg_scale, self.guider.scale)
        b = x.shape[0]
        smpl_tiled = cond["smpl_tiled"]  # (b, n_tiles, T_tile, C, Hp, Wp)
        base_c = {k: v for k, v in cond.items() if k != "smpl_tiled"}
        base_uc = {k: v for k, v in uc.items() if k != "smpl_tiled"}

        seg_len = len(tile_indices[0])
        w = (np.arange(seg_len) + 0.5) * 2.0 / seg_len
        w = np.minimum(w, 2.0 - w).astype(np.float32)  # triangle window
        weight = jnp.asarray(w)
        tiles = [jnp.asarray(np.asarray(t, np.int32)) for t in tile_indices]

        def denoise_tile(x_tile, s_in, smpl_tile):
            c = dict(base_c)
            u = dict(base_uc)
            c["concat_smpl_render"] = smpl_tile
            u["concat_smpl_render"] = smpl_tile
            merged = self.guider.prepare_cond(c, u)
            x2 = jnp.concatenate([x_tile, x_tile], axis=0)
            s2 = jnp.concatenate([s_in, s_in], axis=0)
            v = denoise_fn(x2, s2, merged, cfg_scale=cfg_scale, **kw)
            return self.guider(v.astype(jnp.float32), None, scale=cfg_scale)

        sigma, next_sigma = pair[0], pair[1]
        s_in = jnp.full((b,), sigma, jnp.float32)
        denoised = jnp.zeros_like(x)
        wsum = jnp.zeros((x.shape[1],), jnp.float32)
        for k in range(len(tiles) - 1):
            for tk, idx in ((k, tiles[k]), (k + 1, tiles[k + 1])):
                v = denoise_tile(x[:, idx], s_in, smpl_tiled[:, tk])
                denoised = denoised.at[:, idx].add(
                    v * weight[None, :, None, None, None])
                wsum = wsum.at[idx].add(weight)
        denoised = denoised / wsum[None, :, None, None, None]
        return x + append_dims(next_sigma - sigma, x.ndim) * denoised


# ---------------------------------------------------------------------------
# EDM / k-diffusion sampler family (sampling.py:89-456) -- part of the sgm
# sampler zoo.  Each denoises toward x0 (the denoiser output), unlike the RF
# samplers above which integrate a velocity.
# ---------------------------------------------------------------------------
def _to_d(x, sigma, denoised):
    """(sampling_utils.py:139-141)"""
    return (x - denoised) / append_dims(sigma, x.ndim)


def _ancestral_step_sigmas(sigma_from, sigma_to, eta=1.0):
    """(sampling_utils.py:127-137)"""
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * (sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2)
               / jnp.maximum(sigma_from ** 2, 1e-20)) ** 0.5,
    )
    sigma_down = (sigma_to ** 2 - sigma_up ** 2) ** 0.5
    return sigma_down, sigma_up


class _EDMBase(BaseDiffusionSampler):
    """Shared loop: x scaled by sqrt(1+sigma0^2) (sampling.py:54), CFG merge
    outside the scan, per-step `step(x, carry, i, sigma, next_sigma)`."""

    def _denoise_fn_wrap(self, denoise_fn, merged_cond, cfg_scale, kw):
        def call(x, sigma):
            x2 = jnp.concatenate([x, x], axis=0)
            s2 = jnp.concatenate([sigma, sigma], axis=0)
            out = denoise_fn(x2, s2, merged_cond, cfg_scale=cfg_scale, **kw)
            return self.guider(out.astype(jnp.float32), sigma[0], scale=cfg_scale)

        return call

    def __call__(self, denoise_fn, x, cond: Dict, uc: Optional[Dict] = None,
                 num_steps=None, scale=None, **kw):
        uc = default(uc, cond)
        sigmas = np.asarray(self.discretization(default(num_steps, self.num_steps)),
                            np.float32)
        cfg_scale = default(scale, getattr(self.guider, "scale", 1.0))
        merged = self.guider.prepare_cond(cond, uc)
        call = self._denoise_fn_wrap(denoise_fn, merged, cfg_scale, kw)
        b = x.shape[0]
        x = x.astype(jnp.float32) * float(np.sqrt(1.0 + sigmas[0] ** 2))

        pairs = jnp.asarray(np.stack([sigmas[:-1], sigmas[1:]], axis=1))
        carry0 = self.init_carry(x)

        def scan_step(state, pair):
            x, carry = state
            s_in = jnp.full((b,), pair[0], jnp.float32)
            s_next = jnp.full((b,), pair[1], jnp.float32)
            x, carry = self.step(call, x, carry, s_in, s_next)
            return (x, carry), None

        (x, _), _ = jax.lax.scan(scan_step, (x, carry0), pairs)
        return x

    def init_carry(self, x):
        return jnp.zeros((), jnp.float32)

    def step(self, call, x, carry, sigma, next_sigma):
        raise NotImplementedError


@register(alias="sgm.modules.diffusionmodules.sampling.EulerEDMSampler")
class EulerEDMSampler(_EDMBase):
    """(sampling.py:89-136, :258-263); s_churn handled as 0 (the SCAIL-era
    default -- stochastic churn would need a key plumbed per step)."""

    def __init__(self, s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0, **kw):
        super().__init__(**kw)
        assert s_churn == 0.0, "stochastic churn not implemented (unused defaults)"
        self.s_churn, self.s_tmin, self.s_tmax, self.s_noise = (
            s_churn, s_tmin, s_tmax, s_noise)  # inert at churn 0; API parity

    def step(self, call, x, carry, sigma, next_sigma):
        denoised = call(x, sigma)
        d = _to_d(x, sigma, denoised)
        return x + append_dims(next_sigma - sigma, x.ndim) * d, carry


@register(alias="sgm.modules.diffusionmodules.sampling.HeunEDMSampler")
class HeunEDMSampler(_EDMBase):
    """(sampling.py:265-281): 2nd-order correction unless sigma_next == 0."""

    def __init__(self, s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0, **kw):
        super().__init__(**kw)
        assert s_churn == 0.0
        self.s_churn, self.s_tmin, self.s_tmax, self.s_noise = (
            s_churn, s_tmin, s_tmax, s_noise)

    def step(self, call, x, carry, sigma, next_sigma):
        denoised = call(x, sigma)
        d = _to_d(x, sigma, denoised)
        dt = append_dims(next_sigma - sigma, x.ndim)
        euler = x + dt * d
        safe_next = jnp.maximum(next_sigma, 1e-8)
        denoised2 = call(euler, safe_next)
        d2 = _to_d(euler, safe_next, denoised2)
        heun = x + dt * (d + d2) / 2.0
        out = jnp.where(append_dims(next_sigma, x.ndim) > 0.0, heun, euler)
        return out, carry


@register(alias="sgm.modules.diffusionmodules.sampling.DPMPP2MSampler")
class DPMPP2MSampler(_EDMBase):
    """(sampling.py:334-407): 2nd-order multistep in neg-log-sigma space;
    carry = previous denoised + previous sigma."""

    def init_carry(self, x):
        return (jnp.zeros_like(x), jnp.zeros((), jnp.float32))

    def step(self, call, x, carry, sigma, next_sigma):
        old_denoised, prev_sigma = carry
        denoised = call(x, sigma)
        eps = 1e-20
        t = -jnp.log(jnp.maximum(sigma, eps))
        t_next = -jnp.log(jnp.maximum(next_sigma, eps))
        h = t_next - t
        mult1 = append_dims(jnp.exp(-t_next) / jnp.exp(-t), x.ndim)
        mult2 = append_dims(jnp.expm1(-h), x.ndim)
        x_standard = mult1 * x - mult2 * denoised

        h_last = t - (-jnp.log(jnp.maximum(prev_sigma, eps)))
        r = h_last / jnp.where(h == 0, 1.0, h)
        mult3 = append_dims(1 + 1 / (2 * r), x.ndim)
        mult4 = append_dims(1 / (2 * r), x.ndim)
        denoised_d = mult3 * denoised - mult4 * old_denoised
        x_advanced = mult1 * x - mult2 * denoised_d

        first = prev_sigma <= 0.0
        use_std = first | (jnp.sum(next_sigma) < 1e-14)
        out = jnp.where(use_std, x_standard, x_advanced)
        return out, (denoised, sigma[0])


@register(alias="sgm.modules.diffusionmodules.sampling.SDEDPMPP2MSampler")
class SDEDPMPP2MSampler(_EDMBase):
    """Stochastic DPM++ 2M (sampling.py:410-467); carry = (old_denoised,
    prev_sigma, key)."""

    def __init__(self, seed: int = 0, **kw):
        super().__init__(**kw)
        self.seed = seed

    def init_carry(self, x):
        return (jnp.zeros_like(x), jnp.zeros((), jnp.float32),
                jax.random.PRNGKey(self.seed))

    def step(self, call, x, carry, sigma, next_sigma):
        old_denoised, prev_sigma, key = carry
        key, sub = jax.random.split(key)
        denoised = call(x, sigma)
        eps = 1e-20
        t = -jnp.log(jnp.maximum(sigma, eps))
        t_next = -jnp.log(jnp.maximum(next_sigma, eps))
        h = t_next - t
        mult1 = append_dims(jnp.exp(-t_next) / jnp.exp(-t) * jnp.exp(-h), x.ndim)
        mult2 = append_dims(jnp.expm1(-2 * h), x.ndim)
        mult_noise = append_dims(
            next_sigma * jnp.sqrt(jnp.maximum(1 - jnp.exp(-2 * h), 0.0)), x.ndim)
        noise = jax.random.normal(sub, x.shape, x.dtype)

        x_standard = mult1 * x - mult2 * denoised + mult_noise * noise
        h_last = t - (-jnp.log(jnp.maximum(prev_sigma, eps)))
        r = h_last / jnp.where(h == 0, 1.0, h)
        mult3 = append_dims(1 + 1 / (2 * r), x.ndim)
        mult4 = append_dims(1 / (2 * r), x.ndim)
        denoised_d = mult3 * denoised - mult4 * old_denoised
        x_advanced = mult1 * x - mult2 * denoised_d + mult_noise * noise

        use_std = (prev_sigma <= 0.0) | (jnp.sum(next_sigma) < 1e-14)
        out = jnp.where(use_std, x_standard, x_advanced)
        return out, (denoised, sigma[0], key)


@register(alias="sgm.modules.diffusionmodules.sampling.DDIMSampler")
class DDIMSampler(_EDMBase):
    """(sampling.py:140-178): Euler step with optional s_noise stochasticity."""

    def __init__(self, s_noise=0.1, seed: int = 0, **kw):
        super().__init__(**kw)
        self.s_noise = s_noise
        self.seed = seed

    def init_carry(self, x):
        return jax.random.PRNGKey(self.seed)

    def step(self, call, x, carry, sigma, next_sigma):
        key, sub = jax.random.split(carry)
        denoised = call(x, sigma)
        d = _to_d(x, sigma, denoised)
        dt = append_dims(
            next_sigma * (1 - self.s_noise ** 2) ** 0.5 - sigma, x.ndim)
        x = x + dt * d
        if self.s_noise > 0:
            x = x + (self.s_noise * append_dims(next_sigma, x.ndim)
                     * jax.random.normal(sub, x.shape, x.dtype))
        return x, key


@register(alias="sgm.modules.diffusionmodules.sampling.EulerAncestralSampler")
class EulerAncestralSampler(_EDMBase):
    """(sampling.py:284-292) with a deterministic fold-in noise key."""

    def __init__(self, eta=1.0, s_noise=1.0, seed: int = 0, **kw):
        super().__init__(**kw)
        self.eta = eta
        self.s_noise = s_noise
        self.seed = seed

    def init_carry(self, x):
        return jax.random.PRNGKey(self.seed)

    def step(self, call, x, carry, sigma, next_sigma):
        key, sub = jax.random.split(carry)
        sigma_down, sigma_up = _ancestral_step_sigmas(sigma, next_sigma, self.eta)
        denoised = call(x, sigma)
        d = _to_d(x, sigma, denoised)
        x = x + append_dims(sigma_down - sigma, x.ndim) * d
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.where(
            append_dims(next_sigma, x.ndim) > 0.0,
            x + noise * self.s_noise * append_dims(sigma_up, x.ndim), x)
        return x, key


@register(alias="sgm.modules.diffusionmodules.sampling.DPMPP2SAncestralSampler")
class DPMPP2SAncestralSampler(EulerAncestralSampler):
    """(sampling.py:294-331): 2nd-order DPM++ step toward sigma_down, then
    the ancestral up-noise.  The reference skips the second network eval
    when sigma_down == 0; under scan both evals always run and the Euler
    result is selected, which is numerically identical."""

    def step(self, call, x, carry, sigma, next_sigma):
        key, sub = jax.random.split(carry)
        sigma_down, sigma_up = _ancestral_step_sigmas(sigma, next_sigma, self.eta)
        denoised = call(x, sigma)
        x_euler = x + append_dims(sigma_down - sigma, x.ndim) * _to_d(
            x, sigma, denoised)

        safe_down = jnp.maximum(sigma_down, 1e-20)
        t = -jnp.log(sigma)
        t_next = -jnp.log(safe_down)
        h = t_next - t
        s = t + 0.5 * h
        sigma_s = jnp.exp(-s)
        m1 = append_dims(sigma_s / sigma, x.ndim)
        m2 = append_dims(jnp.expm1(-0.5 * h), x.ndim)
        m3 = append_dims(safe_down / sigma, x.ndim)
        m4 = append_dims(jnp.expm1(-h), x.ndim)
        x2 = m1 * x - m2 * denoised
        denoised2 = call(x2, sigma_s)
        x_dpm = m3 * x - m4 * denoised2
        x = jnp.where(append_dims(sigma_down, x.ndim) > 0.0, x_dpm, x_euler)

        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.where(append_dims(next_sigma, x.ndim) > 0.0,
                      x + noise * self.s_noise * append_dims(sigma_up, x.ndim),
                      x)
        return x, key


def _lms_coeff(order: int, t: np.ndarray, i: int, j: int) -> float:
    """Exact polynomial integral of the Lagrange basis product
    (sampling_utils.py:112-124 integrates it numerically with quad)."""
    num = np.poly1d([1.0])
    den = 1.0
    for k in range(order):
        if k == j:
            continue
        num = num * np.poly1d([1.0, -t[i - k]])
        den *= t[i - j] - t[i - k]
    P = num.integ()
    return float((P(t[i + 1]) - P(t[i])) / den)


@register(alias="sgm.modules.diffusionmodules.sampling.LinearMultistepSampler")
class LinearMultistepSampler(_EDMBase):
    """(sampling.py:220-255): Adams-Bashforth-style multistep over the sigma
    ladder.  Coefficients depend only on the (static) schedule, so they are
    precomputed on the host; the derivative history rides the scan carry as
    a fixed (order, ...) buffer, newest first."""

    def __init__(self, order=4, **kw):
        super().__init__(**kw)
        self.order = order

    def __call__(self, denoise_fn, x, cond: Dict, uc: Optional[Dict] = None,
                 num_steps=None, scale=None, **kw):
        uc = default(uc, cond)
        sigmas = np.asarray(self.discretization(default(num_steps, self.num_steps)),
                            np.float32)
        n = len(sigmas) - 1
        coeffs = np.zeros((n, self.order), np.float32)
        for i in range(n):
            cur = min(i + 1, self.order)
            for j in range(cur):
                coeffs[i, j] = _lms_coeff(cur, sigmas.astype(np.float64), i, j)

        cfg_scale = default(scale, getattr(self.guider, "scale", 1.0))
        merged = self.guider.prepare_cond(cond, uc)
        call = self._denoise_fn_wrap(denoise_fn, merged, cfg_scale, kw)
        b = x.shape[0]
        x = x.astype(jnp.float32) * float(np.sqrt(1.0 + sigmas[0] ** 2))

        ds0 = jnp.zeros((self.order,) + x.shape, jnp.float32)
        steps = (jnp.asarray(sigmas[:-1]), jnp.asarray(coeffs))

        def scan_step(state, per):
            x, ds = state
            sigma, coeff = per
            s_in = jnp.full((b,), sigma, jnp.float32)
            d = _to_d(x, s_in, call(x, s_in))
            ds = jnp.concatenate([d[None], ds[:-1]], axis=0)  # newest first
            upd = jnp.tensordot(coeff, ds, axes=1)
            return (x + upd, ds), None

        (x, _), _ = jax.lax.scan(scan_step, (x, ds0), steps)
        return x


@register(alias="sgm.modules.diffusionmodules.sampling.VideoDDIMSampler")
class VideoDDIMSampler(BaseDiffusionSampler):
    """DDIM over alphas_cumprod_sqrt parametrization (sampling.py:529-607,
    CogVideo lineage) — the sampler the PD distillation loss steps with.

    denoise_fn here receives alphas_cumprod_sqrt as its 'sigma' and an
    `idx` kwarg (the VideoScaling c_noise)."""

    def prepare_sampling_loop(self, x, num_steps=None):
        ac_sqrt, timesteps = self.discretization(
            default(num_steps, self.num_steps), return_idx=True)
        ac_sqrt = np.concatenate([np.asarray(ac_sqrt, np.float32), np.ones((1,), np.float32)])
        timesteps = np.concatenate([np.full((1,), -1, np.int64), np.asarray(timesteps)])
        return ac_sqrt, timesteps

    def sampler_step(self, denoise_fn, x, cond, uc, ac, ac_next, timestep,
                     cfg_scale, **kw):
        b = x.shape[0]
        a_in = jnp.full((b,), ac, jnp.float32)
        merged = self.guider.prepare_cond(cond, uc)
        x2 = jnp.concatenate([x, x], axis=0)
        a2 = jnp.concatenate([a_in, a_in], axis=0)
        idx = jnp.full((2 * b,), timestep, jnp.float32)
        out = denoise_fn(x2, a2, merged, idx=idx, cfg_scale=cfg_scale, **kw)
        # DynamicCFG ramps over steps (sampling.py:569-572)
        denoised = self.guider(out.astype(jnp.float32), (1 - ac ** 2) ** 0.5,
                               step_index=max(self.num_steps - timestep, 0),
                               scale=cfg_scale)
        a_t = ((1 - ac_next ** 2) / (1 - ac ** 2)) ** 0.5
        b_t = ac_next - ac * a_t
        return a_t * x + b_t * denoised

    def __call__(self, denoise_fn, x, cond: Dict, uc: Optional[Dict] = None,
                 num_steps=None, scale=None, **kw):
        uc = default(uc, cond)
        cfg_scale = default(scale, getattr(self.guider, "scale", 1.0))
        ac_sqrt, timesteps = self.prepare_sampling_loop(x, num_steps)
        n = default(num_steps, self.num_steps)
        x = x.astype(jnp.float32)
        for i in range(len(ac_sqrt) - 1):
            x = self.sampler_step(
                denoise_fn, x, cond, uc,
                float(ac_sqrt[i]), float(ac_sqrt[i + 1]),
                float(timesteps[-(i + 1)]), cfg_scale, **kw)
        return x


def make_tile_indices(num_frames: int, tile: int, overlap: int) -> List[List[int]]:
    """Overlapping temporal tiles covering [0, num_frames)."""
    assert 0 < overlap < tile
    starts = list(range(0, max(num_frames - tile, 0) + 1, tile - overlap))
    if starts and starts[-1] + tile < num_frames:
        starts.append(num_frames - tile)
    return [list(range(s, s + tile)) for s in starts]
