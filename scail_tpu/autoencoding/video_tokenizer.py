"""MagViT2-lite causal video tokenizer (reference:
sgm/modules/autoencoding/magvit2_pytorch.py:1044-1893 VideoTokenizer).

The discrete video-token capability of the reference, TPU-shaped:
channels-last (B, T, H, W, C), functional params, static shapes, the
already-golden LFQ quantizer (regularizers.lfq_quantize).  "Lite" = the
layer types every published MagViT2 config actually uses -- 'residual',
'consecutive_residual', 'compress_space', 'compress_time' -- plus the
first-frame-causal padding contract (encode pads time_downsample_factor-1
lead frames, decode crops them, magvit2_pytorch.py:1529-1534/1641-1644).
The attention/gateloop layer variants and conditioning are out of scope
(unused by the reference's SCAIL-era configs); adversarial training
composes through autoencoding/engine.AutoencoderTrainer like the other
autoencoders.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.autoencoding.regularizers import init_lfq, lfq_quantize


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------
def _uconv(key, shape, fan_in):
    """torch Conv default init in the given kernel shape (..., I, O):
    kaiming_uniform_(a=sqrt(5)) reduces to U(+-1/sqrt(fan_in)) --
    gain sqrt(2/(1+5)) x sqrt(3/fan_in) = 1/sqrt(fan_in) exactly."""
    bound = 1.0 / math.sqrt(fan_in)
    kk, kb = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(kk, shape, jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (shape[-1],), jnp.float32,
                                   -bound, bound),
    }


def _conv3d_valid(p, x, stride=(1, 1, 1)):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=stride,
        padding=((0, 0),) * 3,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    return y + p["bias"].astype(x.dtype)


def causal_conv3d(p, x, *, time_stride: int = 1):
    """CausalConv3d (magvit2_pytorch.py:891-927): constant left pad of
    kt-1+(1-stride) frames, same spatial pad, stride only in time."""
    kt, kh, kw = p["kernel"].shape[:3]
    tp = kt - 1 + (1 - time_stride)
    x = jnp.pad(x, ((0, 0), (tp, 0), (kh // 2, kh // 2),
                    (kw // 2, kw // 2), (0, 0)))
    return _conv3d_valid(p, x, stride=(time_stride, 1, 1))


def _conv2d_frames(p, x, *, stride=1, pad=0):
    """Per-frame Conv2d over (B, T, H, W, C) by folding T into batch."""
    b, t, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, w, c), p["kernel"].astype(x.dtype),
        window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["bias"].astype(x.dtype)
    return y.reshape(b, t, *y.shape[1:])


def init_squeeze_excite(key, dim):
    """SqueezeExcite (magvit2_pytorch.py:193-241): attention-pooled global
    context -> 2-layer gate; final conv zero-init with bias -10 (gates
    start at ~sigmoid(-10) ~ 0 -> the unit starts as near-identity)."""
    hidden = max(16, dim // 2)
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "to_k": _uconv(k1, (1, 1, dim, 1), dim),
        "net0": _uconv(k2, (1, 1, dim, hidden), dim),
        "net2": {"kernel": jnp.zeros((1, 1, hidden, dim), jnp.float32),
                 "bias": jnp.full((dim,), -10.0, jnp.float32)},
    }
    return p


def squeeze_excite(p, x):
    b, t, h, w, c = x.shape
    xf = x.reshape(b * t, h * w, c)
    ctx = (xf @ p["to_k"]["kernel"][0, 0] + p["to_k"]["bias"])  # (bt, hw, 1)
    ctx = jax.nn.softmax(ctx.astype(jnp.float32), axis=1).astype(x.dtype)
    pooled = jnp.einsum("bnk,bnc->bkc", ctx, xf)                # (bt, 1, c)
    g = pooled @ p["net0"]["kernel"][0, 0] + p["net0"]["bias"]
    g = jnp.where(g >= 0, g, 0.1 * g)                           # LeakyReLU .1
    g = g @ p["net2"]["kernel"][0, 0] + p["net2"]["bias"]
    gates = jax.nn.sigmoid(g).reshape(b, t, 1, 1, c)
    return gates * x


def init_residual_unit(key, dim, kernel_size: int = 3):
    k1, k2, k3 = jax.random.split(key, 3)
    k = kernel_size
    return {
        "conv": _uconv(k1, (k, k, k, dim, dim), dim * k ** 3),
        "proj": _uconv(k2, (1, 1, 1, dim, dim), dim),
        "se": init_squeeze_excite(k3, dim),
    }


def residual_unit(p, x):
    h = causal_conv3d(p["conv"], x)
    h = jax.nn.elu(h)
    h = _conv3d_valid(p["proj"], h)
    h = jax.nn.elu(h)
    h = squeeze_excite(p["se"], h)
    return x + h


def init_spatial_down(key, dim, dim_out, k: int = 3):
    return {"conv": _uconv(key, (k, k, dim, dim_out), dim * k * k)}


def spatial_down(p, x):
    return _conv2d_frames(p["conv"], x, stride=2,
                          pad=p["conv"]["kernel"].shape[0] // 2)


def init_time_down(key, dim, dim_out, k: int = 3):
    return {"conv": _uconv(key, (k, dim, dim_out), dim * k)}


def time_down(p, x):
    """Causal strided conv over time (magvit2_pytorch.py:781-808)."""
    pc = p["conv"]
    k = pc["kernel"].shape[0]
    x = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0), (0, 0), (0, 0)))
    kernel = pc["kernel"][:, None, None]           # (k,1,1,I,O)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(2, 1, 1),
        padding=((0, 0),) * 3, dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    return y + pc["bias"].astype(x.dtype)


def init_spatial_up(key, dim, dim_out):
    # conv to 4x channels then depth-to-space (magvit2_pytorch.py:810-845)
    return {"conv": _uconv(key, (1, 1, dim, dim_out * 4), dim)}


def spatial_up(p, x):
    y = _conv2d_frames(p["conv"], x)
    y = jax.nn.silu(y)
    b, t, h, w, c4 = y.shape
    c = c4 // 4
    # torch channel order (c p1 p2): c outermost
    y = y.reshape(b, t, h, w, c, 2, 2)
    y = y.transpose(0, 1, 2, 5, 3, 6, 4)
    return y.reshape(b, t, 2 * h, 2 * w, c)


def init_time_up(key, dim, dim_out):
    return {"conv": _uconv(key, (1, dim, dim_out * 2), dim)}


def time_up(p, x):
    b, t, h, w, c = x.shape
    y = x @ p["conv"]["kernel"][0] + p["conv"]["bias"]
    y = jax.nn.silu(y)
    c2 = y.shape[-1] // 2
    y = y.reshape(b, t, h, w, c2, 2)       # torch (c p): c outer
    y = y.transpose(0, 1, 5, 2, 3, 4)      # b t p h w c
    return y.reshape(b, 2 * t, h, w, c2)


# NOTE: there is deliberately no layer-norm helper here -- encode() skips
# the reference's final_norm for parity (the reference's own layer walk
# zip-truncates it out; see the comment inside encode), and only its
# params are kept for state_dict compatibility.

# ---------------------------------------------------------------------------
# the tokenizer
# ---------------------------------------------------------------------------
LayerSpec = Union[str, Tuple[str, int]]


@dataclasses.dataclass
class VideoTokenizerConfig:
    layers: Tuple[LayerSpec, ...] = (
        "residual", "compress_space", ("consecutive_residual", 2),
        "compress_time", "residual")
    init_dim: int = 64
    channels: int = 3
    codebook_size: int = 2 ** 18
    num_codebooks: int = 1
    input_conv_kernel_size: Tuple[int, int, int] = (7, 7, 7)
    output_conv_kernel_size: Tuple[int, int, int] = (3, 3, 3)
    residual_conv_kernel_size: int = 3
    max_dim: int = 2 ** 30
    lfq_entropy_loss_weight: float = 0.1
    lfq_commitment_loss_weight: float = 1.0
    lfq_diversity_gamma: float = 2.5


def _plan(cfg: VideoTokenizerConfig):
    """Static layer plan: (type, dim_in, dim_out, n) per layer."""
    plan = []
    dim = cfg.init_dim
    tdf = 1
    for spec in cfg.layers:
        typ, *ps = (spec,) if isinstance(spec, str) else spec
        if typ == "residual":
            plan.append(("residual", dim, dim, 1))
        elif typ == "consecutive_residual":
            plan.append(("residual", dim, dim, ps[0]))
        elif typ == "compress_space":
            out = min(ps[0] if ps else dim * 2, cfg.max_dim)
            plan.append(("compress_space", dim, out, 1))
            dim = out
        elif typ == "compress_time":
            out = min(ps[0] if ps else dim * 2, cfg.max_dim)
            plan.append(("compress_time", dim, out, 1))
            dim = out
            tdf *= 2
        else:
            raise ValueError(f"unsupported lite layer type {typ!r} "
                             "(attention variants are out of scope)")
    return plan, dim, tdf


class VideoTokenizer:
    """encode -> (optionally) LFQ-quantize -> decode, with the causal
    first-frame padding contract of the reference."""

    def __init__(self, config: VideoTokenizerConfig = None, **kw):
        self.cfg = config or VideoTokenizerConfig(**kw)
        self.plan, self.latent_dim, self.time_downsample_factor = \
            _plan(self.cfg)
        self.time_padding = self.time_downsample_factor - 1
        # parallel static type lists (params hold ONLY arrays: optax and
        # jit walk the param tree, so no string leaves)
        self.enc_types = [t for t, *_ in self.plan]
        inverse = {"residual": "residual", "compress_space": "expand_space",
                   "compress_time": "expand_time"}
        self.dec_types = [inverse[t] for t, *_ in reversed(self.plan)]

    def init_params(self, key) -> Dict:
        cfg = self.cfg
        keys = iter(jax.random.split(key, 4 * sum(n for *_, n in self.plan)
                                     + 8))
        kt, kh, kw = cfg.input_conv_kernel_size
        p = {"conv_in": _uconv(next(keys), (kt, kh, kw, cfg.channels,
                                            cfg.init_dim),
                               cfg.channels * kt * kh * kw)}
        enc, dec = [], []
        for typ, din, dout, n in self.plan:
            if typ == "residual":
                enc.append({"units": [
                    init_residual_unit(next(keys), din,
                                       cfg.residual_conv_kernel_size)
                    for _ in range(n)]})
                dec.insert(0, {"units": [
                    init_residual_unit(next(keys), din,
                                       cfg.residual_conv_kernel_size)
                    for _ in range(n)]})
            elif typ == "compress_space":
                enc.append(init_spatial_down(next(keys), din, dout))
                dec.insert(0, init_spatial_up(next(keys), dout, din))
            elif typ == "compress_time":
                enc.append(init_time_down(next(keys), din, dout))
                dec.insert(0, init_time_up(next(keys), dout, din))
        p["enc_layers"], p["dec_layers"] = enc, dec
        p["final_norm"] = {"scale": jnp.ones((self.latent_dim,)),
                           "bias": jnp.zeros((self.latent_dim,))}
        kt, kh, kw = cfg.output_conv_kernel_size
        p["conv_out"] = _uconv(next(keys), (kt, kh, kw, cfg.init_dim,
                                            cfg.channels),
                               cfg.init_dim * kt * kh * kw)
        p["lfq"] = init_lfq(next(keys), dim=self.latent_dim,
                            codebook_size=cfg.codebook_size,
                            num_codebooks=cfg.num_codebooks)
        return p

    # -- encode / quantize / decode ------------------------------------
    @staticmethod
    def _apply_layer(typ, layer, x):
        if typ == "residual":
            for u in layer["units"]:
                x = residual_unit(u, x)
            return x
        if typ == "compress_space":
            return spatial_down(layer, x)
        if typ == "compress_time":
            return time_down(layer, x)
        if typ == "expand_space":
            return spatial_up(layer, x)
        if typ == "expand_time":
            return time_up(layer, x)
        raise ValueError(typ)

    def encode(self, params, video):
        """video: (B, T, H, W, C) with a real first frame -> latent feats
        (B, T/tdf, H/2^s, W/2^s, latent_dim) (magvit2_pytorch.py:1518-71)."""
        x = jnp.pad(video, ((0, 0), (self.time_padding, 0), (0, 0),
                            (0, 0), (0, 0)))
        x = causal_conv3d(params["conv_in"], x)
        for typ, layer in zip(self.enc_types, params["enc_layers"]):
            x = self._apply_layer(typ, layer, x)
        # NOTE: the reference constructs a final channel LayerNorm
        # (magvit2_pytorch.py:1319-1323) but its encode() zips
        # encoder_layers (n+1 entries) against has_cond_across_layers
        # (n entries), so the norm is silently truncated out of the walk
        # (:1561-1567) -- verified empirically against the actual module.
        # Parity means skipping it too; the final_norm params stay in the
        # tree for state_dict compatibility.
        return x

    def quantize(self, params, feats, training: bool = True):
        cfg = self.cfg
        return lfq_quantize(
            params["lfq"], feats, codebook_size=cfg.codebook_size,
            num_codebooks=cfg.num_codebooks,
            diversity_gamma=cfg.lfq_diversity_gamma,
            entropy_loss_weight=cfg.lfq_entropy_loss_weight,
            commitment_loss_weight=cfg.lfq_commitment_loss_weight,
            training=training)

    def decode(self, params, quantized):
        x = quantized
        for typ, layer in zip(self.dec_types, params["dec_layers"]):
            x = self._apply_layer(typ, layer, x)
        video = causal_conv3d(params["conv_out"], x)
        return video[:, self.time_padding:]

    def indices_to_codes(self, params, indices):
        """(B, T', H', W') [or (..., num_codebooks)] int -> latent feats
        (lookup_free_quantization indices_to_codes)."""
        cfg = self.cfg
        codebook_dim = int(math.log2(cfg.codebook_size))
        if cfg.num_codebooks > 1 and indices.shape[-1] != cfg.num_codebooks:
            raise ValueError("multi-codebook indices need a trailing "
                             "num_codebooks dim")
        idx = indices if cfg.num_codebooks > 1 else indices[..., None]
        mask = 2 ** jnp.arange(codebook_dim - 1, -1, -1, dtype=jnp.int32)
        bits = (idx[..., None] & mask) != 0
        codes = jnp.where(bits, 1.0, -1.0).astype(jnp.float32)
        codes = codes.reshape(*codes.shape[:-2], -1)
        if "project_out" in params["lfq"]:
            codes = (codes @ params["lfq"]["project_out"]["kernel"]
                     + params["lfq"]["project_out"]["bias"])
        return codes

    def decode_from_indices(self, params, indices):
        return self.decode(params, self.indices_to_codes(params, indices))

    def tokenize(self, params, video):
        feats = self.encode(params, video)
        _, indices, _, _ = self.quantize(params, feats, training=False)
        return indices

    def __call__(self, params, video, training: bool = True):
        """Full autoencode: returns (recon, aux_loss, log)."""
        feats = self.encode(params, video)
        quantized, indices, aux, breakdown = self.quantize(
            params, feats, training=training)
        recon = self.decode(params, quantized)
        return recon, aux, {"indices": indices, **breakdown}


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (reference VideoTokenizer state_dict)
# ---------------------------------------------------------------------------
def _t3(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)   # (O,I,kt,kh,kw)
    return {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32))}


def _t2(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)   # (O,I,kh,kw)
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32))}


def _t1(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)   # (O,I,k)
    return {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32))}


def _t_res_unit(sd, pfx):
    return {
        "conv": _t3(sd, pfx + ".fn.0.conv"),
        "proj": _t3(sd, pfx + ".fn.2"),
        "se": {"to_k": _t2(sd, pfx + ".fn.4.to_k"),
               "net0": _t2(sd, pfx + ".fn.4.net.0"),
               "net2": _t2(sd, pfx + ".fn.4.net.2")},
    }


def video_tokenizer_params_from_torch(sd: Dict, tok: VideoTokenizer) -> Dict:
    """Map the reference VideoTokenizer state_dict onto the JAX tree.
    Encoder layer i is `encoder_layers.{i}`; decoder layer for plan entry
    i is `decoder_layers.{n-1-i}` (the reference inserts at 0); the final
    channel LayerNorm is the appended `encoder_layers.{n}.1`."""
    plan = tok.plan
    n = len(plan)
    p = {"conv_in": _t3(sd, "conv_in.conv"),
         "conv_out": _t3(sd, "conv_out.conv")}
    enc, dec = [], []
    for i, (typ, din, dout, cnt) in enumerate(plan):
        e_pfx = f"encoder_layers.{i}"
        d_pfx = f"decoder_layers.{n - 1 - i}"
        if typ == "residual":
            if cnt == 1:
                enc.append({"units": [_t_res_unit(sd, e_pfx)]})
                dec.append({"units": [_t_res_unit(sd, d_pfx)]})
            else:
                enc.append({"units": [
                    _t_res_unit(sd, f"{e_pfx}.{j}") for j in range(cnt)]})
                dec.append({"units": [
                    _t_res_unit(sd, f"{d_pfx}.{j}") for j in range(cnt)]})
        elif typ == "compress_space":
            enc.append({"conv": _t2(sd, e_pfx + ".conv")})
            dec.append({"conv": _t2(sd, d_pfx + ".net.0")})
        elif typ == "compress_time":
            enc.append({"conv": _t1(sd, e_pfx + ".conv")})
            dec.append({"conv": _t1(sd, d_pfx + ".net.0")})
    p["enc_layers"] = enc
    p["dec_layers"] = list(reversed(dec))
    p["final_norm"] = {
        "scale": jnp.asarray(np.asarray(
            sd[f"encoder_layers.{n}.1.weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(
            sd[f"encoder_layers.{n}.1.bias"], np.float32))}
    lfq = {}
    if "quantizers.project_in.weight" in sd:
        lfq["project_in"] = {
            "kernel": jnp.asarray(np.asarray(
                sd["quantizers.project_in.weight"], np.float32).T),
            "bias": jnp.asarray(np.asarray(
                sd["quantizers.project_in.bias"], np.float32))}
        lfq["project_out"] = {
            "kernel": jnp.asarray(np.asarray(
                sd["quantizers.project_out.weight"], np.float32).T),
            "bias": jnp.asarray(np.asarray(
                sd["quantizers.project_out.bias"], np.float32))}
    p["lfq"] = lfq
    return p
