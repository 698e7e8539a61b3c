"""Separable bicubic/bilinear resize with torch-compatible numerics (device).

The (out, in) interpolation weight matrices are built on the host by
scail_tpu/native/resize_kernels.py (shared with the native host loader
path) and applied as two matmuls -- exact, deterministic, and
MXU-friendly.  See that module for the torch-parity notes.
"""

from __future__ import annotations

import jax.numpy as jnp

from scail_tpu.native.resize_kernels import lin_matrix as _lin_matrix
from scail_tpu.native.resize_kernels import resize_matrix as _resize_matrix


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
