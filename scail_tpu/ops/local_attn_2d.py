"""2D local attention primitives for the CogView cuda2d model family.

TPU-native reconstruction of the external `localAttention` CUDA
extension the reference wraps in sat/ops/local_attention_function.py
(f_similar / f_weighting, the Image-Local-Attention kernels).  The
contract is pinned down by the call sites in
sat/model/official/cuda2d_model.py:151-213:

  * feature maps are channels-first spatial grids (N, C, H, W)
  * `f_similar(q, k, kH, kW, causal)` scores each query position (i, j)
    against keys in a kH x kW window centred on its corresponding key
    position; output (N, H, W, field)
  * the key map may have a coarser grid (H = r * Hk): query (i, j)
    centres on (i // r, j // r) (the scores_1_to_0 cross-resolution
    call, cuda2d_model.py:186-187)
  * out-of-bounds window positions contribute a zero score (zero
    padding) and zero value in weighting -- they still take part in
    the softmax, matching the CUDA kernels' padded reads
  * `causal=True` keeps only window offsets at or before the centre in
    raster order: field = (kH*kW + 1) // 2.  With the model's
    (2k-1, k) window this is "all previous rows within +-(k-1), plus
    the current row up to the query column" (cuda2d_model.py:183)
  * `f_weighting(v, w, kH, kW, causal)` is the adjoint gather: output
    (N, C, H, W) with out[i, j] = sum_f w[i, j, f] * v[window_f(i, j)]

Both ops are pure gathers + einsum contractions, so XLA fuses them and
grads come from autodiff (the reference ships four hand-written CUDA
backward kernels for the same thing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_patches(x, kH, kW):
    """x: (N, C, H, W) -> (N, C, kH*kW, H, W): for each position the
    zero-padded kH x kW neighbourhood, raster-ordered, centred at
    (kH//2, kW//2)."""
    n, c, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0),
                     (kH // 2, kH - 1 - kH // 2),
                     (kW // 2, kW - 1 - kW // 2)))
    rows = []
    for ki in range(kH):
        for kj in range(kW):
            rows.append(jax.lax.dynamic_slice(
                xp, (0, 0, ki, kj), (n, c, h, w)))
    return jnp.stack(rows, axis=2)


def _upsample_field(p, r):
    """(N, C, F, h, w) -> (N, C, F, r*h, r*w) nearest (each fine query
    shares its coarse cell's window)."""
    if r == 1:
        return p
    p = jnp.repeat(p, r, axis=3)
    return jnp.repeat(p, r, axis=4)


def causal_field(kH, kW):
    return (kH * kW + 1) // 2


def f_similar(q, k, kH, kW, causal=False):
    """q: (N, C, H, W); k: (N, C, Hk, Wk) with H == r * Hk.
    Returns (N, H, W, field) raw dot-product scores (caller scales)."""
    r = q.shape[2] // k.shape[2]
    patches = _upsample_field(_window_patches(k, kH, kW), r)
    if causal:
        patches = patches[:, :, : causal_field(kH, kW)]
    return jnp.einsum("nchw,ncfhw->nhwf", q, patches,
                      preferred_element_type=jnp.float32)


def f_weighting(v, w, kH, kW, causal=False):
    """v: (N, C, Hv, Wv); w: (N, H, W, field) with H == r * Hv.
    Returns (N, C, H, W) window-weighted sums of v."""
    r = w.shape[1] // v.shape[2]
    patches = _upsample_field(_window_patches(v, kH, kW), r)
    if causal:
        patches = patches[:, :, : causal_field(kH, kW)]
    return jnp.einsum("nhwf,ncfhw->nchw", w.astype(patches.dtype), patches)
