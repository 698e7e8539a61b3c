"""Fused Pallas kernels for AdaLN-LayerNorm and rotary application.

TPU-native equivalents of the reference's fused-norm native ops (SURVEY.md
native tally: apex FusedLayerNorm -> fused norm kernel; Triton rotary
kernels sat/model/position_embedding/triton_rotary*.py -> Pallas rotary).

XLA usually fuses these elementwise chains well on its own; the kernels
exist for parity and for cases where hand control wins (e.g. fusing the
AdaLN modulate into the same VMEM pass as the LN statistics).  Both have
exact-match tests against the XLA reference ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Fused LayerNorm + AdaLN modulate: y = LN(x) * (1 + scale) + shift
# (the per-layer block entry, dit_video_crossattn_sc_xc.py:1030-1032)
# ---------------------------------------------------------------------------
def _adaln_ln_kernel(x_ref, shift_ref, scale_ref, o_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)          # (bs, d)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    shift = shift_ref[0].astype(jnp.float32)  # (1, d)
    scale = scale_ref[0].astype(jnp.float32)
    o_ref[0] = (y * (1.0 + scale) + shift).astype(o_ref.dtype)


def adaln_layer_norm(x, shift, scale, *, eps: float = 1e-6, block_s: int = 256,
                     impl: str = "auto"):
    """x: (b, s, d); shift/scale: (b, 1, d).  One VMEM pass computes the LN
    statistics and applies the AdaLN modulation."""
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "xla":
        from scail_tpu.ops.norms import layer_norm, modulate

        return modulate(layer_norm(x, eps=eps), shift, scale)

    b, s, d = x.shape
    ps = (-s) % block_s
    xp = jnp.pad(x, ((0, 0), (0, ps), (0, 0))) if ps else x
    ns = xp.shape[1] // block_s
    out = pl.pallas_call(
        functools.partial(_adaln_ln_kernel, eps=eps),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, block_s, d), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_s, d), lambda bi, si: (bi, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(xp, shift, scale)
    return out[:, :s]


# ---------------------------------------------------------------------------
# Pallas rotary: out = x*cos + rotate_half_interleaved(x)*sin
# Pairwise lane swap is expressed with two rolls + parity masks (VPU-only,
# no strided gathers): swapped[2i] = x[2i+1], swapped[2i+1] = x[2i].
# ---------------------------------------------------------------------------
def _rotary_kernel(x_ref, cos_ref, sin_ref, o_ref):
    x = x_ref[0]
    d = x.shape[-1]
    parity = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 2  # 0 even, 1 odd
    even = (parity == 0)
    # roll requires non-negative shifts: roll(-1) == roll(d-1)
    swapped = jnp.where(even, pltpu.roll(x, d - 1, 1), pltpu.roll(x, 1, 1))
    sign = jnp.where(even, -1.0, 1.0).astype(x.dtype)
    cos = cos_ref[:].astype(x.dtype)   # (block_s, d)
    sin = sin_ref[:].astype(x.dtype)
    o_ref[0] = x * cos + swapped * sign * sin


def apply_rotary_pallas(x, cos, sin, *, block_s: int = 2048, impl: str = "auto"):
    """x: (B, s, d) with interleaved pair layout; cos/sin: (s, d)."""
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "xla":
        from scail_tpu.ops.rotary import apply_rotary

        return apply_rotary(x, cos[None], sin[None], interleaved=True)

    B, s, d = x.shape
    ps = (-s) % block_s
    xp = jnp.pad(x, ((0, 0), (0, ps), (0, 0))) if ps else x
    cs = jnp.pad(cos, ((0, ps), (0, 0))) if ps else cos
    sn = jnp.pad(sin, ((0, ps), (0, 0))) if ps else sin
    ns = xp.shape[1] // block_s
    out = pl.pallas_call(
        _rotary_kernel,
        grid=(B, ns),
        in_specs=[
            pl.BlockSpec((1, block_s, d), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), lambda bi, si: (si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), lambda bi, si: (si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_s, d), lambda bi, si: (bi, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(xp, cs, sn)
    return out[:, :s]
