"""Separable bicubic resize with torch-compatible numerics.

torch's `F.interpolate(mode='bicubic')` uses the Keys cubic kernel with
a = -0.75; `jax.image.resize` uses a = -0.5, so outputs differ.  The SCAIL
pipeline leans on torch bicubic twice:
  * CLIP preprocessing: antialias=False (sgm/modules/encoders/clip.py:511-521)
  * video resize/crop: torchvision resize, antialias=True (data_video.py:141-155)

We build the (out, in) interpolation weight matrices on the host (numpy) and
apply them as two matmuls -- exact, deterministic, and MXU-friendly.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    return np.where(
        x <= 1,
        (a + 2) * x3 - (a + 3) * x2 + 1,
        np.where(x < 2, a * x3 - 5 * a * x2 + 8 * a * x - 4 * a, 0.0),
    )


@lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    """Row-stochastic (out_size, in_size) bicubic weight matrix.

    torch has two distinct bicubic paths (verified numerically):
      * antialias=False: a = -0.75 kernel, out-of-range taps clamped to the
        border (replicate padding);
      * antialias=True: the PIL-compatible path -- a = -0.5 kernel scaled by
        the downscale factor, out-of-range taps EXCLUDED and remaining
        weights renormalized.
    """
    scale = in_size / out_size
    a = -0.5 if antialias else -0.75
    ks = max(scale, 1.0) if antialias else 1.0
    support = 2.0 * ks
    out = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center - support)) + 1
        hi = int(np.ceil(center + support))
        idx = np.arange(lo, hi + 1)
        w = _cubic((idx - center) / ks, a)
        if antialias:
            m = (idx >= 0) & (idx < in_size)
            out[i, idx[m]] = w[m] / w[m].sum()
        else:
            w = w / w.sum()
            np.add.at(out[i], np.clip(idx, 0, in_size - 1), w)
    return out.astype(np.float32)


def resize_bicubic(x, out_h: int, out_w: int, *, antialias: bool = False):
    """x: (..., H, W) -> (..., out_h, out_w), float compute."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if in_h != out_h:
        wh = jnp.asarray(_resize_matrix(in_h, out_h, antialias))
        xf = jnp.einsum("oh,...hw->...ow", wh, xf)
    if in_w != out_w:
        ww = jnp.asarray(_resize_matrix(in_w, out_w, antialias))
        xf = jnp.einsum("ow,...hw->...ho", ww, xf)
    return xf.astype(dtype)


@lru_cache(maxsize=256)
def _lin_matrix(in_size: int, out_size: int, antialias: bool, align_corners: bool):
    scale = in_size / out_size
    ks = max(scale, 1.0) if antialias else 1.0
    out = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        if align_corners and out_size > 1:
            center = i * (in_size - 1) / (out_size - 1)
        else:
            center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center - ks)) + 1
        hi = int(np.ceil(center + ks))
        idx = np.arange(lo, hi + 1)
        w = np.maximum(0.0, 1.0 - np.abs((idx - center) / ks))
        s = w.sum()
        if s > 0:
            w = w / s
        np.add.at(out[i], np.clip(idx, 0, in_size - 1), w)
    return out.astype(np.float32)


def resize_bilinear(x, out_h: int, out_w: int, *, antialias: bool = False,
                    align_corners: bool = False):
    """torch-compatible bilinear (used for smpl 0.5x downsample,
    sample_video.py:351)."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if in_h != out_h:
        wh = jnp.asarray(_lin_matrix(in_h, out_h, antialias, align_corners))
        xf = jnp.einsum("oh,...hw->...ow", wh, xf)
    if in_w != out_w:
        ww = jnp.asarray(_lin_matrix(in_w, out_w, antialias, align_corners))
        xf = jnp.einsum("ow,...hw->...ho", ww, xf)
    return xf.astype(dtype)
