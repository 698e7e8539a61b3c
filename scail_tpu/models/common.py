"""Shared functional building blocks for all models.

Everything is params-pytree + pure function; initializers mirror the
reference's effective init (xavier-uniform patch/final, N(0, 0.02) linears,
zeroed AdaLN projections -- dit_video_crossattn_sc_xc.py:132-136, :837-841,
:1053-1056).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def dense(params, x):
    """x @ kernel + bias.  kernel: (in, out); computed in x.dtype with f32
    accumulation on the MXU.

    If the param dict carries LoRA factors ('lora_a' (in, r), 'lora_b'
    (r, out), scalar 'lora_scale'), the low-rank delta is added -- the
    TPU-native form of the reference's LoraLinear (sat/model/finetune/
    lora2.py:137-220).  Quantized kernels ('qweight'+'scale') dispatch to
    the W8A16 path.
    """
    if "qweight" in params or "qweight4" in params:
        from scail_tpu.ops.quant import dense_quantized

        y = dense_quantized(params, x)
    else:
        y = jnp.dot(x, params["kernel"].astype(x.dtype))
        if "bias" in params and params["bias"] is not None:
            y = y + params["bias"].astype(x.dtype)
    if "lora_a" in params:
        delta = jnp.dot(jnp.dot(x, params["lora_a"].astype(x.dtype)),
                        params["lora_b"].astype(x.dtype))
        y = y + params["lora_scale"].astype(x.dtype) * delta
    return y


def gelu_tanh(x):
    """nn.GELU(approximate='tanh') -- used by the DiT MLP, text embedding,
    and umt5 feed-forward."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    """nn.GELU() default (erf) -- used by MLPProj (clip projection)."""
    return jax.nn.gelu(x, approximate=False)


def silu(x):
    return jax.nn.silu(x)


def quick_gelu(x):
    """x * sigmoid(1.702 x) -- CLIP-style activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0, dtype=jnp.float32):
    """Sinusoidal embedding, [cos | sin] order (NOTE: cos first) --
    sgm/modules/diffusionmodules/util.py:207-231."""
    half = dim // 2
    # torch computes the exponent grid in float64; at these magnitudes the
    # f32 result is bit-identical after exp
    freqs = jnp.exp(
        jnp.asarray(-math.log(max_period) * np.arange(half, dtype=np.float64) / half,
                    dtype=jnp.float32)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


# ---------------------------------------------------------------------------
# Initializers (numpy, fp32; cast at shard/placement time)
# ---------------------------------------------------------------------------
def normal_init(key, shape, std=0.02):
    return std * jax.random.normal(key, shape, dtype=jnp.float32)


def xavier_uniform(key, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    lim = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-lim, maxval=lim, dtype=jnp.float32)


def dense_init(key, d_in, d_out, *, std=0.02, bias=True, zero=False, prefix_shape=()):
    kkernel, = jax.random.split(key, 1)
    shape = (*prefix_shape, d_in, d_out)
    if zero:
        kernel = jnp.zeros(shape, jnp.float32)
    else:
        kernel = normal_init(kkernel, shape, std)
    p = {"kernel": kernel}
    if bias:
        p["bias"] = jnp.zeros((*prefix_shape, d_out), jnp.float32)
    return p
