"""Legacy SD-family UNet in functional JAX (channels-last).

Reference: sgm/modules/diffusionmodules/openaimodel.py:123-1057 (UNetModel,
ResBlock, Up/Downsample, AttentionBlock + both QKV orders) composed with
sgm/modules/attention.py:82-633 (GEGLU FeedForward, CrossAttention,
BasicTransformerBlock, SpatialTransformer).  This closes the last scoped-out
sgm rows: the UNet stacks are unused by every SCAIL config but are part of
the sgm library surface users of the reference may hold.

Design notes (TPU-first, not a translation):
- NHWC layout throughout (torch is NCHW); convs lower to XLA convolutions
  that tile directly onto the MXU.
- The model is a static *plan* (layer-kind list derived from the config the
  same way the torch constructor derives its ModuleLists) + a params pytree
  of arrays; forward is pure and jittable, all control flow static.
- Attention is plain einsum+softmax: these legacy stacks are library
  surface, not the SCAIL hot path (the DiT uses ops/attention.py's Pallas
  flash kernel); XLA fuses the short-sequence UNet attention fine.
- ``unet_params_from_torch`` ingests a reference state_dict for golden
  parity tests and weights-day conversion of SD-era checkpoints.

Dropout is supported via an explicit ``rng`` argument (None = inference,
matching the repo-wide convention); the reference's activation
checkpointing knobs map to ``jax.checkpoint`` at the caller's discretion.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import timestep_embedding
from scail_tpu.utils.registry import register

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------
def _silu(x):
    return jax.nn.silu(x)


def _group_norm(p, x, *, groups: int = 32, eps: float = 1e-5):
    """GroupNorm over channels-last input of any spatial rank.

    openaimodel normalization() = GroupNorm32(32, ch) (eps 1e-5, fp32
    compute -- util.py GroupNorm32 casts to float()); attention.Normalize
    uses eps 1e-6 (passed by callers)."""
    c = x.shape[-1]
    spatial = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], groups, c // groups)
    mean = xf.mean(axis=spatial + (x.ndim,), keepdims=True)
    var = xf.var(axis=spatial + (x.ndim,), keepdims=True)
    xf = ((xf - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _layer_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (((xf - mean) / jnp.sqrt(var + eps)) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _dense(p, x):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _conv(p, x, *, stride=1, padding="same"):
    """N-d conv, channels last.  Kernel layout (*k, I, O); x (B, *sp, C)."""
    nd = x.ndim - 2
    k = p["kernel"]
    if isinstance(stride, int):
        stride = (stride,) * nd
    if padding == "same":
        padding = tuple((d // 2, d // 2) for d in k.shape[:nd])
    dn_map = {1: ("NHC", "HIO", "NHC"),
              2: ("NHWC", "HWIO", "NHWC"),
              3: ("NDHWC", "DHWIO", "NDHWC")}
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=dn_map[nd])
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _dropout(x, rate: float, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


# -- torch-parity initializers ----------------------------------------------
def _uconv(key, kshape: Tuple[int, ...], zero: bool = False) -> Params:
    """torch Conv default init (kaiming_uniform_(a=sqrt(5)) == U(+-1/sqrt(fan_in)))
    in channels-last layout (*k, I, O)."""
    fan_in = int(np.prod(kshape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)
    kk, kb = jax.random.split(key)
    if zero:
        return {"kernel": jnp.zeros(kshape, jnp.float32),
                "bias": jnp.zeros((kshape[-1],), jnp.float32)}
    return {"kernel": jax.random.uniform(kk, kshape, jnp.float32, -bound, bound),
            "bias": jax.random.uniform(kb, (kshape[-1],), jnp.float32,
                                       -bound, bound)}


def _ulinear(key, d_in: int, d_out: int, bias: bool = True,
             zero: bool = False) -> Params:
    fan_in = d_in
    bound = 1.0 / math.sqrt(fan_in)
    kk, kb = jax.random.split(key)
    if zero:
        p = {"kernel": jnp.zeros((d_in, d_out), jnp.float32)}
    else:
        p = {"kernel": jax.random.uniform(kk, (d_in, d_out), jnp.float32,
                                          -bound, bound)}
    if bias:
        p["bias"] = (jnp.zeros((d_out,), jnp.float32) if zero else
                     jax.random.uniform(kb, (d_out,), jnp.float32,
                                        -bound, bound))
    return p


def _norm_p(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _sdpa(q, k, v):
    """torch F.scaled_dot_product_attention parity: scale 1/sqrt(d),
    f32 softmax.  q/k/v (B, H, S, D)."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


# ---------------------------------------------------------------------------
# Up/Down sample (openaimodel.py:123-218)
# ---------------------------------------------------------------------------
def _nearest_up(x, t_factor: int = 1):
    """F.interpolate(mode='nearest', scale 2x spatial [, t_factor temporal])."""
    if x.ndim == 4:                       # (B, H, W, C)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return x
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)   # (B, T, H, W, C)
    if t_factor == 2:
        x = jnp.repeat(x, 2, axis=1)
    return x


def init_upsample(key, c_in: int, c_out: int, use_conv: bool,
                  dims: int = 2) -> Params:
    if not use_conv:
        return {}
    return {"conv": _uconv(key, (3,) * dims + (c_in, c_out))}


def upsample(p: Params, x, *, third_up: bool = False):
    x = _nearest_up(x, t_factor=2 if third_up else 1)
    if "conv" in p:
        x = _conv(p["conv"], x)
    return x


def init_downsample(key, c_in: int, c_out: int, use_conv: bool,
                    dims: int = 2) -> Params:
    if not use_conv:
        assert c_in == c_out
        return {}
    return {"op": _uconv(key, (3,) * dims + (c_in, c_out))}


def downsample(p: Params, x, *, third_down: bool = False):
    nd = x.ndim - 2
    if nd == 3:
        stride = (2, 2, 2) if third_down else (1, 2, 2)
    else:
        stride = (2,) * nd
    if "op" in p:
        return _conv(p["op"], x, stride=stride)
    # avg_pool_nd(kernel=stride, stride=stride)
    window = (1,) + stride + (1,)
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window, window, "VALID") / float(np.prod(stride))


# ---------------------------------------------------------------------------
# ResBlock (openaimodel.py:221-364)
# ---------------------------------------------------------------------------
def init_res_block(key, c_in: int, emb_ch: int, c_out: Optional[int] = None,
                   *, use_conv: bool = False, use_scale_shift_norm: bool = False,
                   dims: int = 2, up: bool = False, down: bool = False,
                   kernel_size: Union[int, Sequence[int]] = 3,
                   skip_t_emb: bool = False) -> Params:
    c_out = c_out or c_in
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * dims
    ks = tuple(kernel_size)
    k = jax.random.split(key, 4)
    p: Params = {
        "in_norm": _norm_p(c_in),
        "in_conv": _uconv(k[0], ks + (c_in, c_out)),
        "out_norm": _norm_p(c_out),
        "out_conv": _uconv(k[1], ks + (c_out, c_out), zero=True),
    }
    if not skip_t_emb:
        emb_out = 2 * c_out if use_scale_shift_norm else c_out
        p["emb"] = _ulinear(k[2], emb_ch, emb_out)
    if c_out != c_in:
        p["skip"] = _uconv(k[3], (ks if use_conv else (1,) * dims) + (c_in, c_out))
    return p


def res_block(p: Params, x, emb, *, use_scale_shift_norm: bool = False,
              up: bool = False, down: bool = False, dropout: float = 0.0,
              rng=None, exchange_temb_dims: bool = False,
              third: bool = False):
    """emb: (B, emb_ch), or (B, T, emb_ch) with exchange_temb_dims (the
    VideoResBlock time_stack path, openaimodel.py:360-361)."""
    h = _silu(_group_norm(p["in_norm"], x))
    if up:
        h = _nearest_up(h, 2 if third else 1)
        x = _nearest_up(x, 2 if third else 1)
    elif down:
        h = downsample({}, h, third_down=third)
        x = downsample({}, x, third_down=third)
    h = _conv(p["in_conv"], h)

    if "emb" not in p:
        emb_out = jnp.zeros_like(h)
    else:
        emb_out = _dense(p["emb"], _silu(emb)).astype(h.dtype)
        if exchange_temb_dims:
            # torch: (b, t, c) -> (b, c, t) then broadcast over trailing
            # spatial dims; channels-last that is (b, t, 1, 1, c): a no-op
            # transpose, just insert the spatial axes.
            emb_out = emb_out[:, :, None, None, :]
        else:
            while emb_out.ndim < h.ndim:
                emb_out = emb_out[:, None]
    if use_scale_shift_norm:
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = _group_norm(p["out_norm"], h) * (1 + scale) + shift
        h = _dropout(_silu(h), dropout, rng)
    else:
        h = h + emb_out
        h = _dropout(_silu(_group_norm(p["out_norm"], h)), dropout, rng)
    h = _conv(p["out_conv"], h)
    skip = _conv(p["skip"], x) if "skip" in p else x
    return skip + h


# ---------------------------------------------------------------------------
# AttentionBlock (openaimodel.py:367-502) -- pure conv-UNet attention
# ---------------------------------------------------------------------------
def init_attention_block(key, c: int) -> Params:
    k = jax.random.split(key, 2)
    return {"norm": _norm_p(c),
            "qkv": _uconv(k[0], (1, c, 3 * c)),
            "proj_out": _uconv(k[1], (1, c, c), zero=True)}


def attention_block(p: Params, x, *, num_heads: int, legacy_order: bool):
    """legacy_order=True -> QKVAttentionLegacy (heads split before qkv);
    False -> QKVAttention (use_new_attention_order)."""
    b = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    t = int(np.prod(spatial))
    xs = x.reshape(b, t, c)
    qkv = _conv(p["qkv"], xs)                       # (b, t, 3c)
    ch = c // num_heads
    if legacy_order:
        # torch (b, H*3C, T): per head q|k|v contiguous
        qkv = qkv.reshape(b, t, num_heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        # (b, 3*H*C, T): q|k|v each H*C
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, num_heads, ch)
        k = k.reshape(b, t, num_heads, ch)
        v = v.reshape(b, t, num_heads, ch)
    q = jnp.moveaxis(q.reshape(b, t, num_heads, ch), 1, 2)
    k = jnp.moveaxis(k.reshape(b, t, num_heads, ch), 1, 2)
    v = jnp.moveaxis(v.reshape(b, t, num_heads, ch), 1, 2)
    # both reference orders scale q and k by ch**-0.25 before the matmul
    h = _sdpa(q, k, v)
    h = jnp.moveaxis(h, 2, 1).reshape(b, t, c)
    h = _conv(p["proj_out"], h)
    return (xs + h).reshape(b, *spatial, c)


# ---------------------------------------------------------------------------
# CrossAttention / FeedForward / BasicTransformerBlock (attention.py:82-484)
# ---------------------------------------------------------------------------
def init_cross_attention(key, query_dim: int, context_dim: Optional[int],
                         heads: int, dim_head: int) -> Params:
    context_dim = context_dim or query_dim
    inner = heads * dim_head
    k = jax.random.split(key, 4)
    return {"to_q": _ulinear(k[0], query_dim, inner, bias=False),
            "to_k": _ulinear(k[1], context_dim, inner, bias=False),
            "to_v": _ulinear(k[2], context_dim, inner, bias=False),
            "to_out": _ulinear(k[3], inner, query_dim)}


def cross_attention(p: Params, x, context=None, *, heads: int):
    context = x if context is None else context
    q = _dense(p["to_q"], x)
    k = _dense(p["to_k"], context)
    v = _dense(p["to_v"], context)
    b, s, inner = q.shape
    d = inner // heads
    q = jnp.moveaxis(q.reshape(b, s, heads, d), 1, 2)
    k = jnp.moveaxis(k.reshape(b, -1, heads, d), 1, 2)
    v = jnp.moveaxis(v.reshape(b, -1, heads, d), 1, 2)
    out = _sdpa(q, k, v)
    out = jnp.moveaxis(out, 2, 1).reshape(b, s, inner)
    return _dense(p["to_out"], out)


def init_feed_forward(key, dim: int, dim_out: Optional[int] = None,
                      mult: int = 4, glu: bool = True) -> Params:
    inner = int(dim * mult)
    k = jax.random.split(key, 2)
    return {"proj_in": _ulinear(k[0], dim, 2 * inner if glu else inner),
            "proj_out": _ulinear(k[1], inner, dim_out or dim)}


def feed_forward(p: Params, x, *, glu: bool = True):
    h = _dense(p["proj_in"], x)
    if glu:
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
    else:
        h = jax.nn.gelu(h, approximate=False)
    return _dense(p["proj_out"], h)


def init_basic_transformer_block(key, dim: int, n_heads: int, d_head: int,
                                 context_dim: Optional[int] = None,
                                 disable_self_attn: bool = False) -> Params:
    k = jax.random.split(key, 3)
    return {
        "attn1": init_cross_attention(
            k[0], dim, context_dim if disable_self_attn else None,
            n_heads, d_head),
        "attn2": init_cross_attention(k[1], dim, context_dim, n_heads, d_head),
        "ff": init_feed_forward(k[2], dim),
        "norm1": _norm_p(dim), "norm2": _norm_p(dim), "norm3": _norm_p(dim),
    }


def basic_transformer_block(p: Params, x, context=None, *, n_heads: int,
                            disable_self_attn: bool = False):
    x = cross_attention(p["attn1"], _layer_norm(p["norm1"], x),
                        context if disable_self_attn else None,
                        heads=n_heads) + x
    x = cross_attention(p["attn2"], _layer_norm(p["norm2"], x), context,
                        heads=n_heads) + x
    x = feed_forward(p["ff"], _layer_norm(p["norm3"], x)) + x
    return x


# ---------------------------------------------------------------------------
# SpatialTransformer (attention.py:531-633)
# ---------------------------------------------------------------------------
def init_spatial_transformer(key, c_in: int, n_heads: int, d_head: int,
                             depth: int = 1, context_dim=None,
                             disable_self_attn: bool = False,
                             use_linear: bool = False) -> Params:
    inner = n_heads * d_head
    if context_dim is not None and not isinstance(context_dim, (list, tuple)):
        context_dim = [context_dim]
    if context_dim is not None and len(context_dim) != depth:
        context_dim = depth * [context_dim[0]]
    if context_dim is None:
        context_dim = [None] * depth
    k = jax.random.split(key, depth + 2)
    if use_linear:
        proj_in = _ulinear(k[0], c_in, inner)
        proj_out = _ulinear(k[1], inner, c_in, zero=True)
    else:
        proj_in = _uconv(k[0], (1, 1, c_in, inner))
        proj_out = _uconv(k[1], (1, 1, inner, c_in), zero=True)
    return {
        "norm": _norm_p(c_in),
        "proj_in": proj_in,
        "proj_out": proj_out,
        "blocks": [init_basic_transformer_block(
            k[2 + d], inner, n_heads, d_head, context_dim[d],
            disable_self_attn) for d in range(depth)],
    }


def spatial_transformer(p: Params, x, context=None, *, n_heads: int,
                        disable_self_attn: bool = False,
                        use_linear: bool = False):
    if not isinstance(context, list):
        context = [context]
    b, h, w, c = x.shape
    x_in = x
    x = _group_norm(p["norm"], x, eps=1e-6)
    if not use_linear:
        x = _conv(p["proj_in"], x, padding=((0, 0), (0, 0)))
    x = x.reshape(b, h * w, -1)
    if use_linear:
        x = _dense(p["proj_in"], x)
    for i, blk in enumerate(p["blocks"]):
        ctx = context[0 if len(context) == 1 else i]
        x = basic_transformer_block(blk, x, ctx, n_heads=n_heads,
                                    disable_self_attn=disable_self_attn)
    if use_linear:
        x = _dense(p["proj_out"], x)
    x = x.reshape(b, h, w, -1)
    if not use_linear:
        x = _conv(p["proj_out"], x, padding=((0, 0), (0, 0)))
    return x + x_in


# ---------------------------------------------------------------------------
# UNetModel (openaimodel.py:520-1057)
# ---------------------------------------------------------------------------
def _heads_for(ch: int, num_heads: int, num_head_channels: int,
               use_spatial_transformer: bool, legacy: bool):
    """The reference's head/dim_head resolution (openaimodel.py:750-761).
    NOTE: when num_head_channels is set, `num_heads` mutates in the torch
    constructor loop; we re-derive it per site, which is equivalent."""
    if num_head_channels == -1:
        heads, dim_head = num_heads, ch // num_heads
    else:
        heads, dim_head = ch // num_head_channels, num_head_channels
    if legacy:
        dim_head = ch // heads if use_spatial_transformer else num_head_channels
    return heads, dim_head


@register(alias=("sgm.modules.diffusionmodules.openaimodel.UNetModel",))
class UNetModel:
    """SD-style 2D UNet.  Static plan + pure functional apply.

    Unsupported reference knobs (each asserts loudly):
    ``n_embed`` id_predictor (openaimodel.py:1053 asserts False itself),
    fairscale checkpointing (CUDA-era), lora_init (LoRA lives in
    scail_tpu.models.zoo.lora as a generic param transform), dims!=2.
    """

    def __init__(self, in_channels: int, model_channels: int,
                 out_channels: int, num_res_blocks,
                 attention_resolutions, dropout: float = 0.0,
                 channel_mult=(1, 2, 4, 8), conv_resample: bool = True,
                 dims: int = 2, num_classes=None, use_checkpoint: bool = False,
                 num_heads: int = -1, num_head_channels: int = -1,
                 num_heads_upsample: int = -1,
                 use_scale_shift_norm: bool = False,
                 resblock_updown: bool = False,
                 use_new_attention_order: bool = False,
                 use_spatial_transformer: bool = False,
                 transformer_depth=1, context_dim=None, legacy: bool = True,
                 disable_self_attentions=None, num_attention_blocks=None,
                 disable_middle_self_attn: bool = False,
                 use_linear_in_transformer: bool = False,
                 adm_in_channels: Optional[int] = None,
                 transformer_depth_middle: Optional[int] = None,
                 dtype: str = "fp32", **_ignored):
        assert dims == 2, "only 2D UNets exist in the reference config zoo"
        if use_spatial_transformer:
            assert context_dim is not None
        if context_dim is not None:
            assert use_spatial_transformer
        if num_heads_upsample == -1:
            num_heads_upsample = num_heads
        if num_heads == -1:
            assert num_head_channels != -1
        if isinstance(transformer_depth, int):
            transformer_depth = len(channel_mult) * [transformer_depth]
        if transformer_depth_middle is None:
            transformer_depth_middle = transformer_depth[-1]
        if isinstance(num_res_blocks, int):
            num_res_blocks = len(channel_mult) * [num_res_blocks]
        assert len(num_res_blocks) == len(channel_mult)

        self.in_channels = in_channels
        self.model_channels = model_channels
        self.out_channels = out_channels
        self.dropout = dropout
        self.num_classes = num_classes
        self.adm_in_channels = adm_in_channels
        self.use_scale_shift_norm = use_scale_shift_norm
        self.use_spatial_transformer = use_spatial_transformer
        self.use_linear_in_transformer = use_linear_in_transformer
        self.use_new_attention_order = use_new_attention_order
        self.dtype = {"fp32": jnp.float32, "fp16": jnp.float16,
                      "bf16": jnp.bfloat16}[dtype]
        time_embed_dim = model_channels * 4
        self.time_embed_dim = time_embed_dim

        # ---- build the static plan, mirroring the torch constructor ------
        def attn_spec(ch, level, up: bool):
            heads, dim_head = _heads_for(
                ch, num_heads_upsample if (up and not use_spatial_transformer)
                else num_heads,
                num_head_channels, use_spatial_transformer, legacy)
            disabled_sa = (disable_self_attentions[level]
                           if disable_self_attentions is not None else False)
            if use_spatial_transformer:
                return {"kind": "st", "ch": ch, "heads": heads,
                        "dim_head": dim_head,
                        "depth": transformer_depth[level],
                        "context_dim": context_dim,
                        "disable_self_attn": disabled_sa}
            return {"kind": "attn", "ch": ch, "heads": heads,
                    "dim_head": dim_head}

        def res_spec(c_in, c_out, up=False, down=False):
            return {"kind": "res", "c_in": c_in, "c_out": c_out,
                    "up": up, "down": down}

        input_blocks: List[List[dict]] = [[{"kind": "in_conv"}]]
        input_block_chans = [model_channels]
        ch = model_channels
        ds = 1
        for level, mult in enumerate(channel_mult):
            for nr in range(num_res_blocks[level]):
                layers = [res_spec(ch, mult * model_channels)]
                ch = mult * model_channels
                if ds in attention_resolutions and (
                        num_attention_blocks is None
                        or nr < num_attention_blocks[level]):
                    layers.append(attn_spec(ch, level, up=False))
                input_blocks.append(layers)
                input_block_chans.append(ch)
            if level != len(channel_mult) - 1:
                if resblock_updown:
                    input_blocks.append([res_spec(ch, ch, down=True)])
                else:
                    input_blocks.append([{"kind": "down", "c_in": ch,
                                          "c_out": ch,
                                          "use_conv": conv_resample}])
                input_block_chans.append(ch)
                ds *= 2
        heads, dim_head = _heads_for(ch, num_heads, num_head_channels,
                                     use_spatial_transformer, legacy)
        if use_spatial_transformer:
            mid_attn = {"kind": "st", "ch": ch, "heads": heads,
                        "dim_head": dim_head,
                        "depth": transformer_depth_middle,
                        "context_dim": context_dim,
                        "disable_self_attn": disable_middle_self_attn}
        else:
            mid_attn = {"kind": "attn", "ch": ch, "heads": heads,
                        "dim_head": dim_head}
        middle_block = [res_spec(ch, ch), mid_attn, res_spec(ch, ch)]

        output_blocks: List[List[dict]] = []
        for level, mult in list(enumerate(channel_mult))[::-1]:
            for i in range(num_res_blocks[level] + 1):
                ich = input_block_chans.pop()
                layers = [res_spec(ch + ich, model_channels * mult)]
                ch = model_channels * mult
                if ds in attention_resolutions and (
                        num_attention_blocks is None
                        or i < num_attention_blocks[level]):
                    layers.append(attn_spec(ch, level, up=True))
                if level and i == num_res_blocks[level]:
                    if resblock_updown:
                        layers.append(res_spec(ch, ch, up=True))
                    else:
                        layers.append({"kind": "up", "c_in": ch, "c_out": ch,
                                       "use_conv": conv_resample})
                    ds //= 2
                output_blocks.append(layers)
        self.plan = {"input": input_blocks, "middle": middle_block,
                     "output": output_blocks, "out_ch": ch}

    # ---- init --------------------------------------------------------------
    def _init_layer(self, key, spec) -> Params:
        kind = spec["kind"]
        if kind == "in_conv":
            return _uconv(key, (3, 3, self.in_channels, self.model_channels))
        if kind == "res":
            return init_res_block(
                key, spec["c_in"], self.time_embed_dim, spec["c_out"],
                use_scale_shift_norm=self.use_scale_shift_norm,
                up=spec["up"], down=spec["down"])
        if kind == "attn":
            return init_attention_block(key, spec["ch"])
        if kind == "st":
            return init_spatial_transformer(
                key, spec["ch"], spec["heads"], spec["dim_head"],
                depth=spec["depth"], context_dim=spec["context_dim"],
                disable_self_attn=spec["disable_self_attn"],
                use_linear=self.use_linear_in_transformer)
        if kind == "down":
            return init_downsample(key, spec["c_in"], spec["c_out"],
                                   spec["use_conv"])
        if kind == "up":
            return init_upsample(key, spec["c_in"], spec["c_out"],
                                 spec["use_conv"])
        raise ValueError(kind)

    def init(self, key) -> Params:
        mc, ted = self.model_channels, self.time_embed_dim
        n_in = sum(len(b) for b in self.plan["input"])
        n_out = sum(len(b) for b in self.plan["output"])
        keys = iter(jax.random.split(key, n_in + n_out + 16))
        p: Params = {
            "time_embed": [_ulinear(next(keys), mc, ted),
                           _ulinear(next(keys), ted, ted)],
            "input": [[self._init_layer(next(keys), s) for s in blk]
                      for blk in self.plan["input"]],
            "middle": [self._init_layer(next(keys), s)
                       for s in self.plan["middle"]],
            "output": [[self._init_layer(next(keys), s) for s in blk]
                       for blk in self.plan["output"]],
            "out_norm": _norm_p(self.plan["out_ch"]),
            "out_conv": _uconv(next(keys), (3, 3, mc, self.out_channels),
                               zero=True),
        }
        if self.num_classes is not None:
            if isinstance(self.num_classes, int):
                p["label_emb"] = {"embedding": 1e-0 * jax.random.normal(
                    next(keys), (self.num_classes, ted), jnp.float32)}
            elif self.num_classes == "continuous":
                p["label_emb"] = _ulinear(next(keys), 1, ted)
            elif self.num_classes in ("timestep", "sequential"):
                d_in = (self.model_channels if self.num_classes == "timestep"
                        else self.adm_in_channels)
                p["label_emb"] = [_ulinear(next(keys), d_in, ted),
                                  _ulinear(next(keys), ted, ted)]
            else:
                raise ValueError(self.num_classes)
        return p

    # ---- apply ---------------------------------------------------------------
    def _apply_layer(self, lp: Params, spec, h, emb, context, rng):
        kind = spec["kind"]
        if kind == "in_conv":
            return _conv(lp, h)
        if kind == "res":
            return res_block(lp, h, emb,
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             up=spec["up"], down=spec["down"],
                             dropout=self.dropout, rng=rng)
        if kind == "attn":
            return attention_block(
                lp, h, num_heads=spec["heads"],
                legacy_order=not self.use_new_attention_order)
        if kind == "st":
            return spatial_transformer(
                lp, h, context, n_heads=spec["heads"],
                disable_self_attn=spec["disable_self_attn"],
                use_linear=self.use_linear_in_transformer)
        if kind == "down":
            return downsample(lp, h)
        if kind == "up":
            return upsample(lp, h)
        raise ValueError(kind)

    def __call__(self, params: Params, x, timesteps, context=None, y=None,
                 rng=None):
        """x (B, H, W, C) channels-last; timesteps (B,); context
        (B, S, context_dim); y labels/adm vector when class-conditional."""
        assert (y is not None) == (self.num_classes is not None)
        t_emb = timestep_embedding(timesteps, self.model_channels,
                                   dtype=self.dtype)
        emb = _dense(params["time_embed"][1],
                     _silu(_dense(params["time_embed"][0], t_emb)))
        if self.num_classes is not None:
            le = params["label_emb"]
            if isinstance(self.num_classes, int):
                emb = emb + le["embedding"][y].astype(emb.dtype)
            elif self.num_classes == "continuous":
                emb = emb + _dense(le, y.reshape(-1, 1).astype(emb.dtype))
            else:
                z = (timestep_embedding(y, self.model_channels,
                                        dtype=self.dtype)
                     if self.num_classes == "timestep" else y.astype(emb.dtype))
                emb = emb + _dense(le[1], _silu(_dense(le[0], z)))

        hs = []
        h = x
        for blk_p, blk_s in zip(params["input"], self.plan["input"]):
            for lp, spec in zip(blk_p, blk_s):
                h = self._apply_layer(lp, spec, h, emb, context, rng)
            hs.append(h)
        for lp, spec in zip(params["middle"], self.plan["middle"]):
            h = self._apply_layer(lp, spec, h, emb, context, rng)
        for blk_p, blk_s in zip(params["output"], self.plan["output"]):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for lp, spec in zip(blk_p, blk_s):
                h = self._apply_layer(lp, spec, h, emb, context, rng)
        h = h.astype(x.dtype)
        h = _silu(_group_norm(params["out_norm"], h))
        return _conv(params["out_conv"], h)


@register(alias=("sgm.modules.diffusionmodules.openaimodel.NoTimeUNetModel",))
class NoTimeUNetModel(UNetModel):
    """openaimodel.py:1059-1063: zeroes timesteps before the forward."""

    def __call__(self, params, x, timesteps, context=None, y=None, rng=None):
        timesteps = jnp.zeros_like(timesteps)
        return super().__call__(params, x, timesteps, context, y, rng)


# ---------------------------------------------------------------------------
# torch state_dict ingestion (golden tests + SD-era checkpoint conversion)
# ---------------------------------------------------------------------------
def _t(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _t_conv(sd, name):
    w = _t(sd[f"{name}.weight"])           # (O, I, *k) -> (*k, I, O)
    nd = w.ndim - 2
    w = np.moveaxis(w, (0, 1), (-1, -2))
    p = {"kernel": jnp.asarray(w)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(_t(sd[f"{name}.bias"]))
    return p


def _t_lin(sd, name):
    p = {"kernel": jnp.asarray(_t(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(_t(sd[f"{name}.bias"]))
    return p


def _t_norm(sd, name):
    return {"scale": jnp.asarray(_t(sd[f"{name}.weight"])),
            "bias": jnp.asarray(_t(sd[f"{name}.bias"]))}


def _t_res(sd, pfx):
    p = {"in_norm": _t_norm(sd, f"{pfx}.in_layers.0"),
         "in_conv": _t_conv(sd, f"{pfx}.in_layers.2"),
         "out_norm": _t_norm(sd, f"{pfx}.out_layers.0"),
         "out_conv": _t_conv(sd, f"{pfx}.out_layers.3")}
    if f"{pfx}.emb_layers.1.weight" in sd:
        p["emb"] = _t_lin(sd, f"{pfx}.emb_layers.1")
    if f"{pfx}.skip_connection.weight" in sd:
        p["skip"] = _t_conv(sd, f"{pfx}.skip_connection")
    return p


def _t_attn_block(sd, pfx):
    return {"norm": _t_norm(sd, f"{pfx}.norm"),
            "qkv": _t_conv(sd, f"{pfx}.qkv"),
            "proj_out": _t_conv(sd, f"{pfx}.proj_out")}


def _t_xattn(sd, pfx):
    return {"to_q": _t_lin(sd, f"{pfx}.to_q"),
            "to_k": _t_lin(sd, f"{pfx}.to_k"),
            "to_v": _t_lin(sd, f"{pfx}.to_v"),
            "to_out": _t_lin(sd, f"{pfx}.to_out.0")}


def _t_btb(sd, pfx):
    return {"attn1": _t_xattn(sd, f"{pfx}.attn1"),
            "attn2": _t_xattn(sd, f"{pfx}.attn2"),
            "ff": {"proj_in": _t_lin(sd, f"{pfx}.ff.net.0.proj"),
                   "proj_out": _t_lin(sd, f"{pfx}.ff.net.2")},
            "norm1": _t_norm(sd, f"{pfx}.norm1"),
            "norm2": _t_norm(sd, f"{pfx}.norm2"),
            "norm3": _t_norm(sd, f"{pfx}.norm3")}


def _t_spatial_transformer(sd, pfx, use_linear: bool):
    proj = _t_lin if use_linear else _t_conv
    blocks = []
    d = 0
    while f"{pfx}.transformer_blocks.{d}.norm1.weight" in sd:
        blocks.append(_t_btb(sd, f"{pfx}.transformer_blocks.{d}"))
        d += 1
    return {"norm": _t_norm(sd, f"{pfx}.norm"),
            "proj_in": proj(sd, f"{pfx}.proj_in"),
            "proj_out": proj(sd, f"{pfx}.proj_out"),
            "blocks": blocks}


def _t_unet_layer(sd, pfx, spec, use_linear: bool):
    kind = spec["kind"]
    if kind == "in_conv":
        return _t_conv(sd, pfx)
    if kind == "res":
        return _t_res(sd, pfx)
    if kind == "attn":
        return _t_attn_block(sd, pfx)
    if kind == "st":
        return _t_spatial_transformer(sd, pfx, use_linear)
    if kind == "down":
        return {"op": _t_conv(sd, f"{pfx}.op")} \
            if f"{pfx}.op.weight" in sd else {}
    if kind == "up":
        return {"conv": _t_conv(sd, f"{pfx}.conv")} \
            if f"{pfx}.conv.weight" in sd else {}
    raise ValueError(kind)


def unet_params_from_torch(sd: Dict, model: UNetModel) -> Params:
    """Map a reference UNetModel state_dict (openaimodel.py layout:
    input_blocks.N.M.*, middle_block.M.*, output_blocks.N.M.*, out.{0,2})
    onto the plan-structured pytree."""
    ul = model.use_linear_in_transformer
    p: Params = {
        "time_embed": [_t_lin(sd, "time_embed.0"), _t_lin(sd, "time_embed.2")],
        "input": [[_t_unet_layer(sd, f"input_blocks.{n}.{m}", spec, ul)
                   for m, spec in enumerate(blk)]
                  for n, blk in enumerate(model.plan["input"])],
        "middle": [_t_unet_layer(sd, f"middle_block.{m}", spec, ul)
                   for m, spec in enumerate(model.plan["middle"])],
        "output": [[_t_unet_layer(sd, f"output_blocks.{n}.{m}", spec, ul)
                    for m, spec in enumerate(blk)]
                   for n, blk in enumerate(model.plan["output"])],
        "out_norm": _t_norm(sd, "out.0"),
        "out_conv": _t_conv(sd, "out.2"),
    }
    if model.num_classes is not None:
        if isinstance(model.num_classes, int):
            p["label_emb"] = {"embedding":
                              jnp.asarray(_t(sd["label_emb.weight"]))}
        elif model.num_classes == "continuous":
            p["label_emb"] = _t_lin(sd, "label_emb")
        elif model.num_classes == "timestep":
            p["label_emb"] = [_t_lin(sd, "label_emb.1.0"),
                              _t_lin(sd, "label_emb.1.2")]
        else:                              # sequential
            p["label_emb"] = [_t_lin(sd, "label_emb.0.0"),
                              _t_lin(sd, "label_emb.0.2")]
    return p
