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

        smpl_tiled = cond["smpl_tiled"]  # (b, n_tiles, T_tile, C, Hp, Wp)
        base_c = {k: v for k, v in cond.items() if k != "smpl_tiled"}
        base_uc = {k: v for k, v in uc.items() if k != "smpl_tiled"}

        seg_len = len(tile_indices[0])
        w = (np.arange(seg_len) + 0.5) * 2.0 / seg_len
        w = np.minimum(w, 2.0 - w).astype(np.float32)  # triangle window
        weight = jnp.asarray(w)

        tiles = [jnp.asarray(np.asarray(t, np.int32)) for t in tile_indices]
        sig_pairs = jnp.asarray(np.stack([sigmas[:-1], sigmas[1:]], axis=1))

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

        def step(x, pair):
            sigma, next_sigma = pair[0], pair[1]
            s_in = jnp.full((b,), sigma, jnp.float32)
            denoised = jnp.zeros_like(x)
            wsum = jnp.zeros((x.shape[1],), jnp.float32)
            for k in range(len(tiles) - 1):
                for tk, idx in ((k, tiles[k]), (k + 1, tiles[k + 1])):
                    v = denoise_tile(x[:, idx], s_in, smpl_tiled[:, tk])
                    denoised = denoised.at[:, idx].add(v * weight[None, :, None, None, None])
                    wsum = wsum.at[idx].add(weight)
            denoised = denoised / wsum[None, :, None, None, None]
            x = x + append_dims(next_sigma - sigma, x.ndim) * denoised
            return x, None

        x, _ = jax.lax.scan(step, x.astype(jnp.float32), sig_pairs)
        return x


def make_tile_indices(num_frames: int, tile: int, overlap: int) -> List[List[int]]:
    """Overlapping temporal tiles covering [0, num_frames)."""
    assert 0 < overlap < tile
    starts = list(range(0, max(num_frames - tile, 0) + 1, tile - overlap))
    if starts and starts[-1] + tile < num_frames:
        starts.append(num_frames - tile)
    return [list(range(s, s + tile)) for s in starts]
