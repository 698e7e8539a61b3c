"""torch-exact separable resize weight matrices (numpy only, no jax).

Single source of truth for both resize paths:
  * device: scail_tpu/ops/resize.py applies these matrices as two einsums
    on the accelerator (MXU-friendly);
  * host: scail_tpu/native applies the banded form via the multithreaded
    C++ kernel (csrc/frameproc.cpp resize_separable_f32) so the data
    loader never touches the device.

torch's `F.interpolate(mode='bicubic')` uses the Keys cubic kernel with
a = -0.75; `jax.image.resize` uses a = -0.5, so outputs differ.  The SCAIL
pipeline leans on torch bicubic twice:
  * CLIP preprocessing: antialias=False (sgm/modules/encoders/clip.py:511-521)
  * video resize/crop: torchvision resize, antialias=True (data_video.py:141-155)
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

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
def resize_matrix(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
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


@lru_cache(maxsize=256)
def lin_matrix(in_size: int, out_size: int, antialias: bool,
               align_corners: bool) -> np.ndarray:
    """torch-compatible bilinear weight matrix (same banded layout)."""
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


@lru_cache(maxsize=256)
def _banded_cached(key) -> Tuple[np.ndarray, np.ndarray]:
    kind, in_size, out_size, antialias, align_corners = key
    if kind == "bicubic":
        mat = resize_matrix(in_size, out_size, antialias)
    else:
        mat = lin_matrix(in_size, out_size, antialias, align_corners)
    return banded(mat)


def banded(mat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Dense (out, in) row-banded matrix -> (lo int32 (out,), w (out, taps)).

    Every row's nonzeros sit in one contiguous span (resize kernels are
    compactly supported); pad all rows to the widest span so the C kernel
    gets a uniform band.  lo is shifted left where needed to keep the
    padded window in-bounds (the padding weights are zero, so the result
    is unchanged).
    """
    out_size, in_size = mat.shape
    nz = mat != 0.0
    assert nz.any(axis=1).all(), "resize matrix has an all-zero row"
    lo = nz.argmax(axis=1)
    hi = in_size - nz[:, ::-1].argmax(axis=1)  # one past the last nonzero
    taps = int((hi - lo).max())
    lo = np.minimum(lo, in_size - taps).astype(np.int64)
    w = np.zeros((out_size, taps), np.float32)
    for i in range(out_size):
        w[i] = mat[i, lo[i] : lo[i] + taps]
    return lo.astype(np.int32), np.ascontiguousarray(w)


def banded_bicubic(in_size: int, out_size: int, antialias: bool):
    return _banded_cached(("bicubic", in_size, out_size, bool(antialias), False))


def banded_bilinear(in_size: int, out_size: int, antialias: bool,
                    align_corners: bool):
    return _banded_cached(("bilinear", in_size, out_size, bool(antialias),
                           bool(align_corners)))


IDENTITY_CACHE: dict = {}


def banded_identity(size: int) -> Tuple[np.ndarray, np.ndarray]:
    got = IDENTITY_CACHE.get(size)
    if got is None:
        got = (np.arange(size, dtype=np.int32), np.ones((size, 1), np.float32))
        IDENTITY_CACHE[size] = got
    return got
