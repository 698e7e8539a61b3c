"""Weight quantization: W8A16 and int4 matmuls
(reference: sat/quantization/kernels.py -- prebuilt CUDA fatbin int8/int4
kernels + QuantizedLinear).

TPU-native design: weights stored int8 (or int4 packed two-per-byte) with
per-output-channel symmetric scales; a Pallas kernel streams int8 tiles from
HBM, dequantizes to bf16 in VMEM and feeds the MXU -- halving (or
quartering) weight memory traffic, which is what W8A16 buys on memory-bound
layers.  An XLA fallback keeps CPU/tests working.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Quantize / pack (reference: kernels.py compress_int4_weight & scale calc)
# ---------------------------------------------------------------------------
def quantize_int8(w):
    """w: (..., in, out) float -> (int8 same shape, scale (..., out)).
    Symmetric per-output-channel, scale = absmax/127 like W8A16Linear.
    Leading dims (stacked transformer layers) quantize independently."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_int4(w):
    """-> (packed uint8 (in/2, out), scale (out,)): two 4-bit codes per byte
    along the input dim (reference compress_int4_weight packs adjacent
    elements, kernels.py:70-90)."""
    w = jnp.asarray(w, jnp.float32)
    assert w.shape[0] % 2 == 0
    scale = jnp.max(jnp.abs(w), axis=0) / 7.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale[None, :]), -7, 7).astype(jnp.int8)
    lo = q[0::2] & 0xF
    hi = q[1::2] & 0xF
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale


def unpack_int4(packed):
    """inverse of quantize_int4 packing -> int8 (in, out) codes in [-7, 7]."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = ((packed >> 4) & 0xF).astype(jnp.int8)
    # sign-extend 4-bit two's complement
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    stacked = jnp.stack([lo, hi], axis=1)  # (in/2, 2, out)
    return stacked.reshape(packed.shape[0] * 2, packed.shape[1])


# ---------------------------------------------------------------------------
# Pallas W8A16 matmul
# ---------------------------------------------------------------------------
def _w8a16_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                     # (bm, bk) bf16
    w = q_ref[:].astype(x.dtype)     # (bk, bn) int8 -> dequant in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[0] = (acc_ref[:] * s_ref[0][None, :].astype(jnp.float32)).astype(o_ref.dtype)


def _matmul_w8a16_pallas(x, qw, scale, block_m=256, block_n=512, block_k=512):
    """x: (B, M, K) bf16; qw: (K, N) int8; scale: (N,) f32 -> (B, M, N)."""
    B, M, K = x.shape
    N = qw.shape[1]
    pm, pk, pn = (-M) % block_m, (-K) % block_k, (-N) % block_n
    if pm or pk:
        x = jnp.pad(x, ((0, 0), (0, pm), (0, pk)))
    if pk or pn:
        qw = jnp.pad(qw, ((0, pk), (0, pn)))
    if pn:
        scale = jnp.pad(scale, (0, pn))
    # 2D scale: 1D operands hit XLA/Mosaic layout mismatches on some shapes
    scale2 = scale.astype(jnp.float32).reshape(1, -1)
    nm, nk, nn = x.shape[1] // block_m, x.shape[2] // block_k, qw.shape[1] // block_n

    out = pl.pallas_call(
        functools.partial(_w8a16_kernel, n_k=nk),
        grid=(B * nm, nn, nk),
        in_specs=[
            pl.BlockSpec((1, block_m, block_k),
                         lambda bm, ni, ki: (bm // nm, bm % nm, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda bm, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda bm, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_m, block_n),
                               lambda bm, ni, ki: (bm // nm, bm % nm, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, x.shape[1], qw.shape[1]), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, qw, scale2)
    return out[:, :M, :N]


def _matmul_w8a16_xla(x, qw, scale):
    w = qw.astype(x.dtype) * scale.astype(x.dtype)[..., None, :]
    return jnp.dot(x, w)


def matmul_w8a16(x, qw, scale, impl: str = "auto"):
    """x @ dequant(qw): W8A16 linear (QuantizedLinear forward,
    kernels.py:47-67).  x: (..., K); qw: (K, N) int8; scale: (N,)."""
    lead = x.shape[:-1]
    x3 = x.reshape((-1,) + x.shape[-2:]) if x.ndim >= 3 else x.reshape(1, -1, x.shape[-1])
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "pallas":
        out = _matmul_w8a16_pallas(x3, qw, scale)
    else:
        out = _matmul_w8a16_xla(x3, qw, scale)
    return out.reshape(lead + (qw.shape[1],))


def matmul_w4a16(x, packed, scale, impl: str = "auto"):
    """int4 variant: unpack (cheap, XLA-fused) then W8-style matmul."""
    q = unpack_int4(packed)
    return matmul_w8a16(x, q, scale, impl=impl)


def quantize_dense_params(p, bits: int = 8):
    """Convert a {'kernel','bias'} dense param into quantized form."""
    if bits == 8:
        q, s = quantize_int8(p["kernel"])
        out = {"qweight": q, "scale": s}
    elif bits == 4:
        q, s = quantize_int4(p["kernel"])
        out = {"qweight4": q, "scale": s}
    else:
        raise ValueError(bits)
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def dense_quantized(qp, x, impl: str = "auto"):
    if "qweight" in qp:
        y = matmul_w8a16(x, qp["qweight"], qp["scale"], impl=impl)
    else:
        y = matmul_w4a16(x, qp["qweight4"], qp["scale"], impl=impl)
    if "bias" in qp:
        y = y + qp["bias"].astype(y.dtype)
    return y


def quantize_model_params(params, targets=("layers/",), bits: int = 8):
    """Quantize every dense kernel whose path matches a target substring --
    the model-level analogue of the reference's quantize() pass replacing
    Linears with QuantizedLinear (sat/quantization/__init__.py).

    Stacked-layer kernels (L, in, out) keep their leading dim; per-layer
    per-channel scales.  int4 packs along the input dim (requires even)."""

    def visit(node, path=""):
        if isinstance(node, dict) and "kernel" in node:
            if any(t in path for t in targets) and node["kernel"].ndim >= 2:
                k = node["kernel"]
                out = {kk: vv for kk, vv in node.items() if kk != "kernel"}
                if bits == 8:
                    q, s = quantize_int8(k)
                    out["qweight"], out["scale"] = q, s
                else:
                    lead = k.shape[:-2]
                    kk2 = k.reshape((-1,) + k.shape[-2:])
                    qs = [quantize_int4(kk2[i]) for i in range(kk2.shape[0])]
                    out["qweight4"] = jnp.stack([q for q, _ in qs]).reshape(
                        lead + qs[0][0].shape)
                    out["scale"] = jnp.stack([s for _, s in qs]).reshape(
                        lead + qs[0][1].shape)
                return out
            return node
        if isinstance(node, dict):
            return {k: visit(v, f"{path}{k}/") for k, v in node.items()}
        return node

    return visit(params)
