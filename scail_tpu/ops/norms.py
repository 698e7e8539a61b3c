"""Normalization + AdaLN modulation primitives.

TPU-native equivalents of the reference's RMSNorm
(dit_video_crossattn_sc_xc.py:48-68), apex/torch LayerNorm
(sat/ops/layernorm.py) and `modulate` (dit_video_crossattn_sc_xc.py:760).
Statistics are computed in float32 and cast back to the input dtype,
matching the reference's explicit fp32 upcast.  XLA fuses these elementwise
chains into the surrounding matmuls, so no hand-written kernel is needed
for the norm itself; the fused AdaLN(LN(x)) path is a single fusion too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, scale=None, *, eps: float = 1e-6):
    """RMS norm over the last dim.  `scale` of shape (x.shape[-1],) or None.

    Matches dit RMSNorm: fp32 variance, optional elementwise affine, cast
    back to input dtype.  NOTE: the SCAIL config applies this over the FULL
    fused qkv-projection hidden dim (hidden_size_head=5120 in the YAML),
    i.e. the q/k norm is a whole-vector RMS norm, not per-head.
    """
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    if scale is not None:
        xf = scale.astype(jnp.float32) * xf
    return xf.astype(in_dtype)


def layer_norm(x, scale=None, bias=None, *, eps: float = 1e-6):
    """LayerNorm over the last dim with optional affine (reference layers use
    elementwise_affine=False; AdaLN provides scale/shift instead)."""
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        xf = xf * scale.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    return xf.astype(in_dtype)


def modulate(x, shift, scale):
    """AdaLN modulation: x * (1 + scale) + shift
    (dit_video_crossattn_sc_xc.py:760-761)."""
    return x * (1 + scale) + shift


def channel_rms_norm(x, gamma, *, axis: int = 1, scale_by_sqrt_dim: bool = True):
    """F.normalize-style RMS norm over `axis` used by the Wan VAE
    (sgm/models/wan_vae.py:39-54): x / ||x||_2 * sqrt(dim) * gamma.

    F.normalize divides by the L2 norm (not the RMS), then the reference
    multiplies by sqrt(dim) -- equivalent to an RMS norm without eps.
    """
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # F.normalize uses eps=1e-12 as a clamp on the norm
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=axis, keepdims=True))
    norm = jnp.maximum(norm, 1e-12)
    xf = xf / norm
    if scale_by_sqrt_dim:
        xf = xf * (x.shape[axis] ** 0.5)
    return (xf * gamma.astype(jnp.float32)).astype(in_dtype)
