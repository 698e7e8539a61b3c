"""SVD-style spatio-temporal video UNet in functional JAX (channels-last).

Reference: sgm/modules/diffusionmodules/video_model.py (VideoResBlock,
VideoUNet), sgm/modules/video_attention.py (VideoTransformerBlock,
SpatialVideoTransformer), sgm/modules/diffusionmodules/util.py:312-369
(AlphaBlender).  Library surface -- no SCAIL config instantiates these --
completing the sgm legacy-UNet row alongside models/unet.py.

Layout: frames are folded into the batch, x is (B*T, H, W, C) channels-last
(torch: (B*T, C, H, W)); the temporal stacks reshape to (B, T, H, W, C) /
(B*S, T, C) around their 3D convs / time attention.  ``num_video_frames``
is static, so everything jits with fixed shapes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import timestep_embedding
from scail_tpu.models.unet import (_conv, _dense, _group_norm, _layer_norm,
                                   _norm_p, _sdpa, _silu, _t, _t_conv,
                                   _t_lin, _t_norm, _t_res, _t_xattn,
                                   _uconv, _ulinear, cross_attention,
                                   downsample, feed_forward,
                                   init_cross_attention, init_downsample,
                                   init_feed_forward, init_res_block,
                                   init_spatial_transformer, init_upsample,
                                   res_block, spatial_transformer, upsample)
from scail_tpu.utils.registry import register

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# AlphaBlender (diffusionmodules/util.py:312-369)
# ---------------------------------------------------------------------------
def init_alpha_blender(alpha: float) -> Params:
    # both the 'fixed' buffer and the learned parameter live in the torch
    # state_dict under .mix_factor; keep one layout for all strategies
    return {"mix_factor": jnp.asarray([alpha], jnp.float32)}


def alpha_blend(p: Params, x_spatial, x_temporal, *, merge_strategy: str,
                image_only_indicator=None, token_space: bool):
    """token_space=True: inputs (B*T, S, C), alpha per (b t) sample
    (rearrange 'b t -> (b t) 1 1'); False: inputs (B, T, H, W, C), alpha
    'b t -> b 1 t 1 1' in torch NCTHW == (b, t, 1, 1, 1) channels-last."""
    if merge_strategy == "fixed":
        alpha = p["mix_factor"]
    elif merge_strategy == "learned":
        alpha = jax.nn.sigmoid(p["mix_factor"])
    elif merge_strategy == "learned_with_images":
        assert image_only_indicator is not None, "need image_only_indicator"
        alpha = jnp.where(image_only_indicator.astype(bool),
                          jnp.ones((1, 1), x_spatial.dtype),
                          jax.nn.sigmoid(p["mix_factor"]))      # (b, t)
        if token_space:
            alpha = alpha.reshape(-1, 1, 1)
        else:
            alpha = alpha[:, :, None, None, None]
    else:
        raise ValueError(merge_strategy)
    alpha = alpha.astype(x_spatial.dtype)
    return alpha * x_spatial + (1.0 - alpha) * x_temporal


# ---------------------------------------------------------------------------
# VideoTransformerBlock (video_attention.py:15-143)
# ---------------------------------------------------------------------------
def init_video_transformer_block(key, dim: int, n_heads: int, d_head: int,
                                 context_dim: Optional[int] = None,
                                 ff_in: bool = False,
                                 disable_self_attn: bool = False,
                                 disable_temporal_crossattention: bool = False
                                 ) -> Params:
    inner = n_heads * d_head
    assert inner == dim, "VideoUNet always builds time blocks at inner==dim"
    k = jax.random.split(key, 4)
    p: Params = {
        "attn1": init_cross_attention(
            k[0], inner, context_dim if disable_self_attn else None,
            n_heads, d_head),
        "ff": init_feed_forward(k[1], inner, dim_out=dim),
        "norm1": _norm_p(inner), "norm3": _norm_p(inner),
    }
    if ff_in:
        p["norm_in"] = _norm_p(dim)
        p["ff_in"] = init_feed_forward(k[2], dim, dim_out=inner)
    if not disable_temporal_crossattention:
        p["norm2"] = _norm_p(inner)
        p["attn2"] = init_cross_attention(k[3], inner, context_dim,
                                          n_heads, d_head)
    return p


def video_transformer_block(p: Params, x, context=None, *, timesteps: int,
                            n_heads: int, disable_self_attn: bool = False):
    """x (B*T, S, C) -> time attention over T at every token position."""
    bt, s, c = x.shape
    b = bt // timesteps
    # (b t) s c -> (b s) t c
    x = x.reshape(b, timesteps, s, c).transpose(0, 2, 1, 3).reshape(
        b * s, timesteps, c)
    if "ff_in" in p:
        x_skip = x
        x = feed_forward(p["ff_in"], _layer_norm(p["norm_in"], x))
        x = x + x_skip                               # is_res (inner == dim)
    x = cross_attention(p["attn1"], _layer_norm(p["norm1"], x),
                        context if disable_self_attn else None,
                        heads=n_heads) + x
    if "attn2" in p:
        x = cross_attention(p["attn2"], _layer_norm(p["norm2"], x), context,
                            heads=n_heads) + x
    x_skip = x
    x = feed_forward(p["ff"], _layer_norm(p["norm3"], x))
    x = x + x_skip
    return x.reshape(b, s, timesteps, c).transpose(0, 2, 1, 3).reshape(
        bt, s, c)


# ---------------------------------------------------------------------------
# SpatialVideoTransformer (video_attention.py:151-309)
# ---------------------------------------------------------------------------
def init_spatial_video_transformer(key, c_in: int, n_heads: int, d_head: int,
                                   *, depth: int = 1, context_dim=None,
                                   time_context_dim=None, ff_in: bool = False,
                                   use_spatial_context: bool = False,
                                   merge_factor: float = 0.5,
                                   use_linear: bool = False,
                                   disable_self_attn: bool = False,
                                   disable_temporal_crossattention: bool = False
                                   ) -> Params:
    inner = n_heads * d_head
    if use_spatial_context:
        time_context_dim = context_dim
    k = jax.random.split(key, depth + 3)
    p = init_spatial_transformer(k[0], c_in, n_heads, d_head, depth=depth,
                                 context_dim=context_dim,
                                 disable_self_attn=disable_self_attn,
                                 use_linear=use_linear)
    p["time_stack"] = [init_video_transformer_block(
        k[1 + d], inner, n_heads, d_head, context_dim=time_context_dim,
        ff_in=ff_in, disable_self_attn=disable_self_attn,
        disable_temporal_crossattention=disable_temporal_crossattention)
        for d in range(depth)]
    p["time_pos_embed"] = [_ulinear(k[depth + 1], c_in, 4 * c_in),
                           _ulinear(k[depth + 2], 4 * c_in, c_in)]
    p["time_mixer"] = init_alpha_blender(merge_factor)
    return p


def spatial_video_transformer(p: Params, x, context=None, *,
                              time_context=None, timesteps: int,
                              image_only_indicator=None, n_heads: int,
                              use_spatial_context: bool = False,
                              merge_strategy: str = "fixed",
                              max_time_embed_period: int = 10000,
                              disable_self_attn: bool = False,
                              use_linear: bool = False):
    bt, h, w, c = x.shape
    x_in = x
    spatial_context = context
    if use_spatial_context:
        assert context is not None and context.ndim == 3
        # first-frame context, repeated to every spatial position
        time_context = jnp.repeat(context[::timesteps], h * w, axis=0)
    elif time_context is not None:
        time_context = jnp.repeat(time_context, h * w, axis=0)
        if time_context.ndim == 2:
            time_context = time_context[:, None, :]

    x = _group_norm(p["norm"], x, eps=1e-6)
    if not use_linear:
        x = _conv(p["proj_in"], x, padding=((0, 0), (0, 0)))
    x = x.reshape(bt, h * w, -1)
    if use_linear:
        x = _dense(p["proj_in"], x)

    frames = jnp.tile(jnp.arange(timesteps), bt // timesteps)
    t_emb = timestep_embedding(frames, c, max_period=max_time_embed_period,
                               dtype=x.dtype)
    emb = _dense(p["time_pos_embed"][1],
                 _silu(_dense(p["time_pos_embed"][0], t_emb)))[:, None, :]

    from scail_tpu.models.unet import basic_transformer_block
    for blk, mix_blk in zip(p["blocks"], p["time_stack"]):
        x = basic_transformer_block(blk, x, spatial_context, n_heads=n_heads,
                                    disable_self_attn=disable_self_attn)
        x_mix = video_transformer_block(
            mix_blk, x + emb, time_context, timesteps=timesteps,
            n_heads=n_heads, disable_self_attn=disable_self_attn)
        x = alpha_blend(p["time_mixer"], x, x_mix,
                        merge_strategy=merge_strategy,
                        image_only_indicator=image_only_indicator,
                        token_space=True)
    if use_linear:
        x = _dense(p["proj_out"], x)
    x = x.reshape(bt, h, w, -1)
    if not use_linear:
        x = _conv(p["proj_out"], x, padding=((0, 0), (0, 0)))
    return x + x_in


# ---------------------------------------------------------------------------
# VideoResBlock (video_model.py:12-81)
# ---------------------------------------------------------------------------
def init_video_res_block(key, c_in: int, emb_ch: int,
                         c_out: Optional[int] = None, *,
                         video_kernel_size: Union[int, Sequence[int]] = 3,
                         merge_factor: float = 0.5,
                         use_scale_shift_norm: bool = False,
                         up: bool = False, down: bool = False) -> Params:
    c_out = c_out or c_in
    k = jax.random.split(key, 2)
    return {
        "spatial": init_res_block(k[0], c_in, emb_ch, c_out,
                                  use_scale_shift_norm=use_scale_shift_norm,
                                  up=up, down=down),
        "time_stack": init_res_block(k[1], c_out, emb_ch, c_out, dims=3,
                                     kernel_size=video_kernel_size),
        "time_mixer": init_alpha_blender(merge_factor),
    }


def video_res_block(p: Params, x, emb, *, num_video_frames: int,
                    image_only_indicator=None, merge_strategy: str = "fixed",
                    use_scale_shift_norm: bool = False,
                    up: bool = False, down: bool = False):
    """x (B*T, H, W, C); emb (B*T, emb_ch)."""
    x = res_block(p["spatial"], x, emb,
                  use_scale_shift_norm=use_scale_shift_norm, up=up, down=down)
    bt, h, w, c = x.shape
    b = bt // num_video_frames
    x5 = x.reshape(b, num_video_frames, h, w, c)
    x_mix = x5
    x5 = res_block(p["time_stack"], x5,
                   emb.reshape(b, num_video_frames, -1),
                   exchange_temb_dims=True)
    x5 = alpha_blend(p["time_mixer"], x_mix, x5,
                     merge_strategy=merge_strategy,
                     image_only_indicator=image_only_indicator,
                     token_space=False)
    return x5.reshape(bt, h, w, c)


# ---------------------------------------------------------------------------
# VideoUNet (video_model.py:89-505)
# ---------------------------------------------------------------------------
@register(alias=("sgm.modules.diffusionmodules.video_model.VideoUNet",))
class VideoUNet:
    def __init__(self, in_channels: int, model_channels: int,
                 out_channels: int, num_res_blocks: int,
                 attention_resolutions, dropout: float = 0.0,
                 channel_mult=(1, 2, 4, 8), conv_resample: bool = True,
                 dims: int = 2, num_classes=None, use_checkpoint: bool = False,
                 num_heads: int = -1, num_head_channels: int = -1,
                 num_heads_upsample: int = -1,
                 use_scale_shift_norm: bool = False,
                 resblock_updown: bool = False, transformer_depth=1,
                 transformer_depth_middle: Optional[int] = None,
                 context_dim: Optional[int] = None,
                 time_downup: bool = False,
                 time_context_dim: Optional[int] = None,
                 extra_ff_mix_layer: bool = False,
                 use_spatial_context: bool = False,
                 merge_strategy: str = "fixed", merge_factor: float = 0.5,
                 video_kernel_size: Union[int, Sequence[int]] = 3,
                 use_linear_in_transformer: bool = False,
                 adm_in_channels: Optional[int] = None,
                 disable_temporal_crossattention: bool = False,
                 max_ddpm_temb_period: int = 10000, dtype: str = "fp32",
                 **_ignored):
        assert context_dim is not None
        assert dims == 2
        if num_heads_upsample == -1:
            num_heads_upsample = num_heads
        if num_heads == -1:
            assert num_head_channels != -1
        if isinstance(transformer_depth, int):
            transformer_depth = len(channel_mult) * [transformer_depth]
        if transformer_depth_middle is None:
            transformer_depth_middle = transformer_depth[-1]

        self.in_channels = in_channels
        self.model_channels = model_channels
        self.out_channels = out_channels
        self.num_classes = num_classes
        self.adm_in_channels = adm_in_channels
        self.use_scale_shift_norm = use_scale_shift_norm
        self.use_linear_in_transformer = use_linear_in_transformer
        self.use_spatial_context = use_spatial_context
        self.merge_strategy = merge_strategy
        self.merge_factor = merge_factor
        self.video_kernel_size = video_kernel_size
        self.time_context_dim = time_context_dim
        self.extra_ff_mix_layer = extra_ff_mix_layer
        self.disable_temporal_crossattention = disable_temporal_crossattention
        self.max_ddpm_temb_period = max_ddpm_temb_period
        self.time_downup = time_downup
        self.dtype = {"fp32": jnp.float32, "fp16": jnp.float16,
                      "bf16": jnp.bfloat16}[dtype]
        self.time_embed_dim = model_channels * 4

        def heads_for(ch):
            if num_head_channels == -1:
                return num_heads, ch // num_heads
            return ch // num_head_channels, num_head_channels

        def res_spec(c_in, c_out, up=False, down=False):
            return {"kind": "vres", "c_in": c_in, "c_out": c_out,
                    "up": up, "down": down}

        def attn_spec(ch, depth):
            heads, dim_head = heads_for(ch)
            return {"kind": "svt", "ch": ch, "heads": heads,
                    "dim_head": dim_head, "depth": depth,
                    "context_dim": context_dim}

        input_blocks: List[List[dict]] = [[{"kind": "in_conv"}]]
        input_block_chans = [model_channels]
        ch = model_channels
        ds = 1
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                layers = [res_spec(ch, mult * model_channels)]
                ch = mult * model_channels
                if ds in attention_resolutions:
                    layers.append(attn_spec(ch, transformer_depth[level]))
                input_blocks.append(layers)
                input_block_chans.append(ch)
            if level != len(channel_mult) - 1:
                ds *= 2
                if resblock_updown:
                    input_blocks.append([res_spec(ch, ch, down=True)])
                else:
                    input_blocks.append([{"kind": "down", "c_in": ch,
                                          "c_out": ch,
                                          "use_conv": conv_resample}])
                input_block_chans.append(ch)
        middle_block = [res_spec(ch, ch),
                        attn_spec(ch, transformer_depth_middle),
                        res_spec(ch, ch)]

        output_blocks: List[List[dict]] = []
        for level, mult in list(enumerate(channel_mult))[::-1]:
            for i in range(num_res_blocks + 1):
                ich = input_block_chans.pop()
                layers = [res_spec(ch + ich, model_channels * mult)]
                ch = model_channels * mult
                if ds in attention_resolutions:
                    layers.append(attn_spec(ch, transformer_depth[level]))
                if level and i == num_res_blocks:
                    ds //= 2
                    if resblock_updown:
                        layers.append(res_spec(ch, ch, up=True))
                    else:
                        layers.append({"kind": "up", "c_in": ch, "c_out": ch,
                                       "use_conv": conv_resample})
                output_blocks.append(layers)
        self.plan = {"input": input_blocks, "middle": middle_block,
                     "output": output_blocks, "out_ch": ch}

    # ---- init ---------------------------------------------------------------
    def _init_layer(self, key, spec) -> Params:
        kind = spec["kind"]
        if kind == "in_conv":
            return _uconv(key, (3, 3, self.in_channels, self.model_channels))
        if kind == "vres":
            return init_video_res_block(
                key, spec["c_in"], self.time_embed_dim, spec["c_out"],
                video_kernel_size=self.video_kernel_size,
                merge_factor=self.merge_factor,
                use_scale_shift_norm=self.use_scale_shift_norm,
                up=spec["up"], down=spec["down"])
        if kind == "svt":
            return init_spatial_video_transformer(
                key, spec["ch"], spec["heads"], spec["dim_head"],
                depth=spec["depth"], context_dim=spec["context_dim"],
                time_context_dim=self.time_context_dim,
                ff_in=self.extra_ff_mix_layer,
                use_spatial_context=self.use_spatial_context,
                merge_factor=self.merge_factor,
                use_linear=self.use_linear_in_transformer,
                disable_temporal_crossattention=
                self.disable_temporal_crossattention)
        if kind == "down":
            return init_downsample(key, spec["c_in"], spec["c_out"],
                                   spec["use_conv"])
        if kind == "up":
            return init_upsample(key, spec["c_in"], spec["c_out"],
                                 spec["use_conv"])
        raise ValueError(kind)

    def init(self, key) -> Params:
        mc, ted = self.model_channels, self.time_embed_dim
        n = sum(len(b) for b in self.plan["input"]) + \
            sum(len(b) for b in self.plan["output"]) + 16
        keys = iter(jax.random.split(key, n))
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
                p["label_emb"] = {"embedding": jax.random.normal(
                    next(keys), (self.num_classes, ted), jnp.float32)}
            elif self.num_classes == "continuous":
                p["label_emb"] = _ulinear(next(keys), 1, ted)
            elif self.num_classes in ("timestep", "sequential"):
                d_in = (mc if self.num_classes == "timestep"
                        else self.adm_in_channels)
                p["label_emb"] = [_ulinear(next(keys), d_in, ted),
                                  _ulinear(next(keys), ted, ted)]
            else:
                raise ValueError(self.num_classes)
        return p

    # ---- apply --------------------------------------------------------------
    def _apply_layer(self, lp, spec, h, emb, context, time_context,
                     num_video_frames, image_only_indicator):
        kind = spec["kind"]
        if kind == "in_conv":
            return _conv(lp, h)
        if kind == "vres":
            return video_res_block(
                lp, h, emb, num_video_frames=num_video_frames,
                image_only_indicator=image_only_indicator,
                merge_strategy=self.merge_strategy,
                use_scale_shift_norm=self.use_scale_shift_norm,
                up=spec["up"], down=spec["down"])
        if kind == "svt":
            return spatial_video_transformer(
                lp, h, context, time_context=time_context,
                timesteps=num_video_frames,
                image_only_indicator=image_only_indicator,
                n_heads=spec["heads"],
                use_spatial_context=self.use_spatial_context,
                merge_strategy=self.merge_strategy,
                max_time_embed_period=self.max_ddpm_temb_period,
                use_linear=self.use_linear_in_transformer)
        if kind == "down":
            return downsample(lp, h, third_down=self.time_downup)
        if kind == "up":
            return upsample(lp, h, third_up=self.time_downup)
        raise ValueError(kind)

    def __call__(self, params: Params, x, timesteps, context=None, y=None,
                 time_context=None, num_video_frames: Optional[int] = None,
                 image_only_indicator=None):
        """x (B*T, H, W, C); timesteps (B*T,); context (B*T, S, D);
        num_video_frames = T (static)."""
        assert (y is not None) == (self.num_classes is not None)
        assert num_video_frames, "num_video_frames is required"
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
                h = self._apply_layer(lp, spec, h, emb, context, time_context,
                                      num_video_frames, image_only_indicator)
            hs.append(h)
        for lp, spec in zip(params["middle"], self.plan["middle"]):
            h = self._apply_layer(lp, spec, h, emb, context, time_context,
                                  num_video_frames, image_only_indicator)
        for blk_p, blk_s in zip(params["output"], self.plan["output"]):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for lp, spec in zip(blk_p, blk_s):
                h = self._apply_layer(lp, spec, h, emb, context, time_context,
                                      num_video_frames, image_only_indicator)
        h = h.astype(x.dtype)
        h = _silu(_group_norm(params["out_norm"], h))
        return _conv(params["out_conv"], h)


# ---------------------------------------------------------------------------
# torch state_dict ingestion
# ---------------------------------------------------------------------------
def _t_ff(sd, pfx):
    return {"proj_in": _t_lin(sd, f"{pfx}.net.0.proj"),
            "proj_out": _t_lin(sd, f"{pfx}.net.2")}


def _t_vtb(sd, pfx):
    p = {"attn1": _t_xattn(sd, f"{pfx}.attn1"),
         "ff": _t_ff(sd, f"{pfx}.ff"),
         "norm1": _t_norm(sd, f"{pfx}.norm1"),
         "norm3": _t_norm(sd, f"{pfx}.norm3")}
    if f"{pfx}.norm_in.weight" in sd:
        p["norm_in"] = _t_norm(sd, f"{pfx}.norm_in")
        p["ff_in"] = _t_ff(sd, f"{pfx}.ff_in")
    if f"{pfx}.norm2.weight" in sd:
        p["norm2"] = _t_norm(sd, f"{pfx}.norm2")
        p["attn2"] = _t_xattn(sd, f"{pfx}.attn2")
    return p


def _t_mixer(sd, pfx):
    return {"mix_factor": jnp.asarray(_t(sd[f"{pfx}.mix_factor"]))}


def _t_svt(sd, pfx, use_linear: bool):
    from scail_tpu.models.unet import _t_btb
    proj = _t_lin if use_linear else _t_conv
    blocks, time_stack = [], []
    d = 0
    while f"{pfx}.transformer_blocks.{d}.norm1.weight" in sd:
        blocks.append(_t_btb(sd, f"{pfx}.transformer_blocks.{d}"))
        time_stack.append(_t_vtb(sd, f"{pfx}.time_stack.{d}"))
        d += 1
    return {"norm": _t_norm(sd, f"{pfx}.norm"),
            "proj_in": proj(sd, f"{pfx}.proj_in"),
            "proj_out": proj(sd, f"{pfx}.proj_out"),
            "blocks": blocks, "time_stack": time_stack,
            "time_pos_embed": [_t_lin(sd, f"{pfx}.time_pos_embed.0"),
                               _t_lin(sd, f"{pfx}.time_pos_embed.2")],
            "time_mixer": _t_mixer(sd, f"{pfx}.time_mixer")}


def _t_vres(sd, pfx):
    return {"spatial": _t_res(sd, pfx),
            "time_stack": _t_res(sd, f"{pfx}.time_stack"),
            "time_mixer": _t_mixer(sd, f"{pfx}.time_mixer")}


def _t_layer(sd, pfx, spec, use_linear: bool):
    kind = spec["kind"]
    if kind == "in_conv":
        return _t_conv(sd, pfx)
    if kind == "vres":
        return _t_vres(sd, pfx)
    if kind == "svt":
        return _t_svt(sd, pfx, use_linear)
    if kind == "down":
        return {"op": _t_conv(sd, f"{pfx}.op")} \
            if f"{pfx}.op.weight" in sd else {}
    if kind == "up":
        return {"conv": _t_conv(sd, f"{pfx}.conv")} \
            if f"{pfx}.conv.weight" in sd else {}
    raise ValueError(kind)


def video_unet_params_from_torch(sd: Dict, model: VideoUNet) -> Params:
    ul = model.use_linear_in_transformer
    p: Params = {
        "time_embed": [_t_lin(sd, "time_embed.0"), _t_lin(sd, "time_embed.2")],
        "input": [[_t_layer(sd, f"input_blocks.{n}.{m}", spec, ul)
                   for m, spec in enumerate(blk)]
                  for n, blk in enumerate(model.plan["input"])],
        "middle": [_t_layer(sd, f"middle_block.{m}", spec, ul)
                   for m, spec in enumerate(model.plan["middle"])],
        "output": [[_t_layer(sd, f"output_blocks.{n}.{m}", spec, ul)
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
        else:
            p["label_emb"] = [_t_lin(sd, "label_emb.0.0"),
                              _t_lin(sd, "label_emb.0.2")]
    return p
