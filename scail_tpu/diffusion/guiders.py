"""Classifier-free-guidance combiners
(reference: sgm/modules/diffusionmodules/guiders.py).

`prepare_cond` merges (cond, uncond) dicts into one batch-doubled dict:
keys in {vector, crossattn, concat} are concatenated [uc; c] on the batch
axis (guiders.py:48-56); every other conditioning tensor is shared and is
tiled to the doubled batch (the reference instead repeats them inside the
DiT forward, dit:1457-1515 -- same result, but tiling up front keeps the
jitted sampling loop shape-static).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax.numpy as jnp

from scail_tpu.utils.misc import append_dims
from scail_tpu.utils.registry import register

CFG_CAT_KEYS = ("vector", "crossattn", "concat")


def _pad_uc_tokens(uc, c):
    """Right-pad uc's token dim with its last token to match c
    (guiders.py:51-53)."""
    if uc.shape[1] == c.shape[1]:
        return uc
    pad = c.shape[1] - uc.shape[1]
    tail = jnp.repeat(uc[:, -1:], pad, axis=1)
    return jnp.concatenate([uc, tail], axis=1)


@register(alias="sgm.modules.diffusionmodules.guiders.VanillaCFG")
class VanillaCFG:
    """(guiders.py:23-56)"""

    def __init__(self, scale: float, dyn_thresh_config=None):
        self.scale = scale

    def scale_at(self, sigma=None, step_index=None) -> float:
        return self.scale

    def prepare_cond(self, c: Dict, uc: Dict) -> Dict:
        out = {}
        for k, v in c.items():
            if k in CFG_CAT_KEYS:
                ucv = _pad_uc_tokens(uc[k], v)
                out[k] = jnp.concatenate([ucv, v], axis=0)
            else:
                out[k] = jnp.concatenate([v, v], axis=0)
        return out

    def prepare_inputs(self, x, s, c: Dict, uc: Dict) -> Tuple:
        return (
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([s, s], axis=0),
            self.prepare_cond(c, uc),
        )

    def __call__(self, x, sigma=None, step_index=None, scale=None):
        x_u, x_c = jnp.split(x, 2, axis=0)
        s = scale if scale is not None else self.scale_at(sigma, step_index)
        return x_u + s * (x_c - x_u)


@register(alias="sgm.modules.diffusionmodules.guiders.DynamicCFG")
class DynamicCFG(VanillaCFG):
    """Cosine-ramped scale over steps (guiders.py:58-76)."""

    def __init__(self, scale, exp, num_steps, dyn_thresh_config=None):
        super().__init__(scale)
        self.exp = exp
        self.num_steps = num_steps

    def scale_at(self, sigma=None, step_index=None) -> float:
        assert step_index is not None
        return 1.0 + self.scale * (
            1 - math.cos(math.pi * (step_index / self.num_steps) ** self.exp)
        ) / 2.0

    def __call__(self, x, sigma=None, step_index=None, scale=None):
        # the reference's DynamicCFG always uses its schedule, ignoring any
        # externally passed scale (guiders.py:71-76)
        x_u, x_c = jnp.split(x, 2, axis=0)
        s = self.scale_at(sigma, step_index)
        return x_u + s * (x_c - x_u)


@register(alias="sgm.modules.diffusionmodules.guiders.IdentityGuider")
class IdentityGuider:
    scale = 1.0

    def scale_at(self, sigma=None, step_index=None):
        return 1.0

    def prepare_cond(self, c, uc):
        return dict(c)

    def prepare_inputs(self, x, s, c, uc):
        return x, s, dict(c)

    def __call__(self, x, sigma=None, step_index=None, scale=None):
        return x


@register(alias="sgm.modules.diffusionmodules.guiders.LinearPredictionGuider")
class LinearPredictionGuider(VanillaCFG):
    """Per-frame linearly ramped scale (guiders.py, SVD-style)."""

    def __init__(self, max_scale, num_frames, min_scale=1.0, **kw):
        super().__init__(max_scale)
        self.min_scale = min_scale
        self.num_frames = num_frames

    def __call__(self, x, sigma=None, step_index=None, scale=None):
        x_u, x_c = jnp.split(x, 2, axis=0)
        # x: (b, t, c, h, w) -- ramp over frames
        ramp = jnp.linspace(self.min_scale, self.scale, self.num_frames)
        ramp = append_dims(ramp, x_u.ndim - 1)[None]
        return x_u + ramp * (x_c - x_u)
