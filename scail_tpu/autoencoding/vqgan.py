"""Discrete-tokenizer VAE model shells: VQModel and MOVQ
(reference: sgm/models/vqgan.py:19-392 composing
sgm/modules/autoencoding/vqvae/{vqvae_blocks,movq_modules,quantize}.py).

Functional JAX, channels-last (NHWC).  The quantizer/GAN-loss math these
shells compose was already ported and golden-tested (regularizers.py,
gan_loss.py); this module adds the taming-style Encoder/Decoder stacks,
the MOVQ spatially-modulated decoder (SpatialNorm conditioning every
norm on the quantized latent, movq_modules.py:34-53), and the model
classes with torch-checkpoint ingestion.  Training runs through
autoencoding/engine.AutoencoderTrainer (the Lightning training_step
equivalent, vqgan.py:317-366).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.autoencoding.discriminator import _conv2d
from scail_tpu.autoencoding.regularizers import (init_vector_quantizer,
                                                 measure_perplexity,
                                                 vector_quantize)
from scail_tpu.utils.registry import register


# ---------------------------------------------------------------------------
# primitives (vqvae_blocks.py:29-36)
# ---------------------------------------------------------------------------
def _swish(x):
    return x * jax.nn.sigmoid(x)


def _group_norm(p, x, *, groups: int = 32, eps: float = 1e-6):
    """GroupNorm over NHWC (torch GroupNorm(32, C, eps=1e-6) parity)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _kconv(key, k, c_in, c_out):
    """torch Conv2d default init in HWIO: kaiming_uniform_(a=sqrt(5))
    reduces to U(+-1/sqrt(fan_in)) exactly."""
    fan_in = c_in * k * k
    bound = 1.0 / math.sqrt(fan_in)
    kk, kb = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(kk, (k, k, c_in, c_out), jnp.float32,
                                     -bound, bound),
        "bias": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
    }


def _norm_p(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _normalize(p, x, zq=None):
    """Plain GroupNorm, or SpatialNorm when zq params are present
    (movq_modules.py:34-53): zq is nearest-resized to x and modulates the
    normalized features with 1x1-conv scale/shift."""
    if "conv_y" not in p:
        return _group_norm(p["norm"], x)
    b, h, w, _ = x.shape
    zb, zh, zw, zc = zq.shape
    # nearest interpolate zq to (h, w) like F.interpolate(mode='nearest')
    ih = (jnp.arange(h) * zh // h).astype(jnp.int32)
    iw = (jnp.arange(w) * zw // w).astype(jnp.int32)
    zq_r = zq[:, ih][:, :, iw]
    normed = _group_norm(p["norm"], x)
    return normed * _conv2d(p["conv_y"], zq_r, padding=((0, 0), (0, 0))) \
        + _conv2d(p["conv_b"], zq_r, padding=((0, 0), (0, 0)))


def _init_normalize(key, c, zq_ch=None):
    p = {"norm": _norm_p(c)}
    if zq_ch is not None:
        k1, k2 = jax.random.split(key)
        p["conv_y"] = _kconv(k1, 1, zq_ch, c)
        p["conv_b"] = _kconv(k2, 1, zq_ch, c)
    return p


# ---------------------------------------------------------------------------
# ResnetBlock / AttnBlock (vqvae_blocks.py:78-201; movq variants condition
# every norm on zq)
# ---------------------------------------------------------------------------
def init_resnet_block(key, c_in, c_out, zq_ch=None):
    ks = jax.random.split(key, 5)
    p = {
        "norm1": _init_normalize(ks[0], c_in, zq_ch),
        "conv1": _kconv(ks[1], 3, c_in, c_out),
        "norm2": _init_normalize(ks[2], c_out, zq_ch),
        "conv2": _kconv(ks[3], 3, c_out, c_out),
    }
    if c_in != c_out:
        p["nin_shortcut"] = _kconv(ks[4], 1, c_in, c_out)
    return p


def resnet_block(p, x, zq=None):
    h = _swish(_normalize(p["norm1"], x, zq))
    h = _conv2d(p["conv1"], h)
    h = _swish(_normalize(p["norm2"], h, zq))
    h = _conv2d(p["conv2"], h)
    if "nin_shortcut" in p:
        x = _conv2d(p["nin_shortcut"], x, padding=((0, 0), (0, 0)))
    return x + h


def init_attn_block(key, c, zq_ch=None):
    ks = jax.random.split(key, 5)
    return {
        "norm": _init_normalize(ks[0], c, zq_ch),
        "q": _kconv(ks[1], 1, c, c),
        "k": _kconv(ks[2], 1, c, c),
        "v": _kconv(ks[3], 1, c, c),
        "proj_out": _kconv(ks[4], 1, c, c),
    }


def attn_block(p, x, zq=None):
    b, h, w, c = x.shape
    h_ = _normalize(p["norm"], x, zq)
    nopad = ((0, 0), (0, 0))
    q = _conv2d(p["q"], h_, padding=nopad).reshape(b, h * w, c)
    k = _conv2d(p["k"], h_, padding=nopad).reshape(b, h * w, c)
    v = _conv2d(p["v"], h_, padding=nopad).reshape(b, h * w, c)
    logits = jnp.einsum("bqc,bkc->bqk", q * (c ** -0.5), k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, h, w, c)
    return x + _conv2d(p["proj_out"], out, padding=nopad)


def _downsample(p, x):
    # torch pads (right, bottom) then stride-2 VALID (vqvae_blocks.py:68-75)
    return _conv2d(p, x, stride=(2, 2), padding=((0, 1), (0, 1)))


def _upsample(p, x):
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
    return _conv2d(p, x)


# ---------------------------------------------------------------------------
# Encoder (vqvae_blocks.py:203-293)
# ---------------------------------------------------------------------------
def init_encoder(key, *, ch, ch_mult=(1, 2, 4, 8), num_res_blocks,
                 attn_resolutions=(), in_channels=3, resolution=256,
                 z_channels, double_z=True, **_):
    keys = iter(jax.random.split(key, 256))
    p = {"conv_in": _kconv(next(keys), 3, in_channels, ch)}
    curr_res = resolution
    in_mult = (1,) + tuple(ch_mult)
    downs = []
    block_in = ch
    for i, mult in enumerate(ch_mult):
        block_in, block_out = ch * in_mult[i], ch * mult
        level = {"block": [], "attn": []}
        for _ in range(num_res_blocks):
            level["block"].append(init_resnet_block(next(keys), block_in,
                                                    block_out))
            block_in = block_out
            if curr_res in attn_resolutions:
                level["attn"].append(init_attn_block(next(keys), block_in))
        if i != len(ch_mult) - 1:
            level["downsample"] = _kconv(next(keys), 3, block_in, block_in)
            curr_res //= 2
        downs.append(level)
    p["down"] = downs
    p["mid"] = {
        "block_1": init_resnet_block(next(keys), block_in, block_in),
        "attn_1": init_attn_block(next(keys), block_in),
        "block_2": init_resnet_block(next(keys), block_in, block_in),
    }
    p["norm_out"] = _norm_p(block_in)
    p["conv_out"] = _kconv(next(keys), 3, block_in,
                           2 * z_channels if double_z else z_channels)
    return p


def encoder_apply(p, x):
    h = _conv2d(p["conv_in"], x)
    for level in p["down"]:
        for j, blk in enumerate(level["block"]):
            h = resnet_block(blk, h)
            if level["attn"]:
                h = attn_block(level["attn"][j], h)
        if "downsample" in level:
            h = _downsample(level["downsample"], h)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    h = _swish(_group_norm(p["norm_out"], h))
    return _conv2d(p["conv_out"], h)


# ---------------------------------------------------------------------------
# Decoder (vqvae_blocks.py:336-436) and MOVQDecoder (movq_modules.py:216-320)
# ---------------------------------------------------------------------------
def init_decoder(key, *, ch, out_ch, ch_mult=(1, 2, 4, 8), num_res_blocks,
                 attn_resolutions=(), resolution=256, z_channels,
                 zq_ch=None, **_):
    keys = iter(jax.random.split(key, 256))
    block_in = ch * ch_mult[-1]
    curr_res = resolution // 2 ** (len(ch_mult) - 1)
    p = {"conv_in": _kconv(next(keys), 3, z_channels, block_in)}
    p["mid"] = {
        "block_1": init_resnet_block(next(keys), block_in, block_in, zq_ch),
        "attn_1": init_attn_block(next(keys), block_in, zq_ch),
        "block_2": init_resnet_block(next(keys), block_in, block_in, zq_ch),
    }
    ups = []
    for i in reversed(range(len(ch_mult))):
        block_out = ch * ch_mult[i]
        level = {"block": [], "attn": []}
        for _ in range(num_res_blocks + 1):
            level["block"].append(init_resnet_block(next(keys), block_in,
                                                    block_out, zq_ch))
            block_in = block_out
            if curr_res in attn_resolutions:
                level["attn"].append(init_attn_block(next(keys), block_in,
                                                     zq_ch))
        if i != 0:
            level["upsample"] = _kconv(next(keys), 3, block_in, block_in)
            curr_res *= 2
        ups.insert(0, level)
    p["up"] = ups
    p["norm_out"] = _init_normalize(next(keys), block_in, zq_ch)
    p["conv_out"] = _kconv(next(keys), 3, block_in, out_ch)
    return p


def decoder_apply(p, z, zq=None, give_pre_end: bool = False):
    h = _conv2d(p["conv_in"], z)
    h = resnet_block(p["mid"]["block_1"], h, zq)
    h = attn_block(p["mid"]["attn_1"], h, zq)
    h = resnet_block(p["mid"]["block_2"], h, zq)
    for i in reversed(range(len(p["up"]))):
        level = p["up"][i]
        for j, blk in enumerate(level["block"]):
            h = resnet_block(blk, h, zq)
            if level["attn"]:
                h = attn_block(level["attn"][j], h, zq)
        if "upsample" in level:
            h = _upsample(level["upsample"], h)
    if give_pre_end:
        return h
    h = _swish(_normalize(p["norm_out"], h, zq))
    return _conv2d(p["conv_out"], h)


# ---------------------------------------------------------------------------
# model shells
# ---------------------------------------------------------------------------
@register(alias="sgm.models.vqgan.VQModel")
class VQModel:
    """VQGAN (vqgan.py:224-392): encoder -> 1x1 quant_conv -> nearest-code
    VQ (straight-through) -> 1x1 post_quant_conv -> decoder."""

    movq = False

    def __init__(self, ddconfig: Dict, n_embed: int, embed_dim: int,
                 beta: float = 0.25, **_):
        self.ddconfig = dict(ddconfig)
        self.n_embed, self.embed_dim, self.beta = n_embed, embed_dim, beta

    def init_params(self, key) -> Dict:
        ks = jax.random.split(key, 5)
        z = self.ddconfig["z_channels"]
        dec_kw = dict(self.ddconfig)
        if self.movq:
            dec_kw["zq_ch"] = self.embed_dim
        return {
            # VQ path: quant_conv consumes z_channels, so no doubled
            # moments head regardless of the ddconfig default
            "encoder": init_encoder(ks[0], **{**self.ddconfig,
                                              "double_z": False}),
            "decoder": init_decoder(ks[1], **dec_kw),
            "quantize": init_vector_quantizer(ks[2], self.n_embed,
                                              self.embed_dim),
            "quant_conv": _kconv(ks[3], 1, z, self.embed_dim),
            "post_quant_conv": _kconv(ks[4], 1, self.embed_dim, z),
        }

    def encode(self, params, x):
        """x: (b, h, w, 3) -> (quant, emb_loss, info) (vqgan.py:280-284)."""
        h = encoder_apply(params["encoder"], x)
        h = _conv2d(params["quant_conv"], h, padding=((0, 0), (0, 0)))
        quant, log = vector_quantize(params["quantize"], h, beta=self.beta)
        return quant, log["loss/vq"], log["min_encoding_indices"]

    def decode(self, params, quant):
        h = _conv2d(params["post_quant_conv"], quant,
                    padding=((0, 0), (0, 0)))
        return decoder_apply(params["decoder"], h,
                             zq=quant if self.movq else None)

    def decode_code(self, params, code_b):
        """code_b: (b, h, w) int codebook indices -> reconstruction."""
        quant = params["quantize"]["embedding"][code_b]
        return self.decode(params, quant)

    def __call__(self, params, x):
        quant, diff, _ = self.encode(params, x)
        return self.decode(params, quant), diff

    def codebook_stats(self, params, x):
        _, _, idx = self.encode(params, x)
        return measure_perplexity(idx.reshape(-1), self.n_embed)


@register(alias="sgm.models.vqgan.MOVQ")
class MOVQ(VQModel):
    """MoVQ (vqgan.py:19-221): like VQModel but the decoder's every norm
    is spatially modulated by the quantized latent (decoder(quant2, quant),
    vqgan.py:94-97)."""

    movq = True


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (state_dict names from sgm/models/vqgan.py)
# ---------------------------------------------------------------------------
def _t_conv(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if name + ".bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[name + ".bias"], np.float32))
    return p


def _t_norm(sd, name):
    return {"scale": jnp.asarray(np.asarray(sd[name + ".weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32))}


def _t_normalize(sd, name, movq):
    if movq:
        p = {"norm": _t_norm(sd, name + ".norm_layer")}
        p["conv_y"] = _t_conv(sd, name + ".conv_y")
        p["conv_b"] = _t_conv(sd, name + ".conv_b")
        return p
    return {"norm": _t_norm(sd, name)}


def _t_resnet(sd, pfx, movq=False):
    p = {
        "norm1": _t_normalize(sd, pfx + ".norm1", movq),
        "conv1": _t_conv(sd, pfx + ".conv1"),
        "norm2": _t_normalize(sd, pfx + ".norm2", movq),
        "conv2": _t_conv(sd, pfx + ".conv2"),
    }
    if pfx + ".nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _t_conv(sd, pfx + ".nin_shortcut")
    return p


def _t_attn(sd, pfx, movq=False):
    return {"norm": _t_normalize(sd, pfx + ".norm", movq),
            "q": _t_conv(sd, pfx + ".q"), "k": _t_conv(sd, pfx + ".k"),
            "v": _t_conv(sd, pfx + ".v"),
            "proj_out": _t_conv(sd, pfx + ".proj_out")}


def encoder_params_from_torch(sd, ddconfig, prefix="encoder."):
    n_levels = len(ddconfig["ch_mult"])
    p = {"conv_in": _t_conv(sd, prefix + "conv_in"), "down": []}
    for i in range(n_levels):
        level = {"block": [], "attn": []}
        for j in range(ddconfig["num_res_blocks"]):
            level["block"].append(_t_resnet(sd, f"{prefix}down.{i}.block.{j}"))
            if f"{prefix}down.{i}.attn.{j}.q.weight" in sd:
                level["attn"].append(_t_attn(sd, f"{prefix}down.{i}.attn.{j}"))
        if f"{prefix}down.{i}.downsample.conv.weight" in sd:
            level["downsample"] = _t_conv(sd, f"{prefix}down.{i}.downsample.conv")
        p["down"].append(level)
    p["mid"] = {"block_1": _t_resnet(sd, prefix + "mid.block_1"),
                "attn_1": _t_attn(sd, prefix + "mid.attn_1"),
                "block_2": _t_resnet(sd, prefix + "mid.block_2")}
    p["norm_out"] = _t_norm(sd, prefix + "norm_out")
    p["conv_out"] = _t_conv(sd, prefix + "conv_out")
    return p


def decoder_params_from_torch(sd, ddconfig, prefix="decoder.", movq=False):
    n_levels = len(ddconfig["ch_mult"])
    p = {"conv_in": _t_conv(sd, prefix + "conv_in"),
         "mid": {"block_1": _t_resnet(sd, prefix + "mid.block_1", movq),
                 "attn_1": _t_attn(sd, prefix + "mid.attn_1", movq),
                 "block_2": _t_resnet(sd, prefix + "mid.block_2", movq)},
         "up": []}
    for i in range(n_levels):
        level = {"block": [], "attn": []}
        for j in range(ddconfig["num_res_blocks"] + 1):
            level["block"].append(
                _t_resnet(sd, f"{prefix}up.{i}.block.{j}", movq))
            if f"{prefix}up.{i}.attn.{j}.q.weight" in sd:
                level["attn"].append(
                    _t_attn(sd, f"{prefix}up.{i}.attn.{j}", movq))
        if f"{prefix}up.{i}.upsample.conv.weight" in sd:
            level["upsample"] = _t_conv(sd, f"{prefix}up.{i}.upsample.conv")
        p["up"].append(level)
    p["norm_out"] = _t_normalize(sd, prefix + "norm_out", movq)
    p["conv_out"] = _t_conv(sd, prefix + "conv_out")
    return p


def vqmodel_params_from_torch(sd: Dict, ddconfig: Dict,
                              movq: bool = False) -> Dict:
    """Map a reference VQModel/MOVQ state_dict onto the JAX tree
    (vqgan.py:270-278 init_from_ckpt layout)."""
    return {
        "encoder": encoder_params_from_torch(sd, ddconfig),
        "decoder": decoder_params_from_torch(sd, ddconfig, movq=movq),
        "quantize": {"embedding": jnp.asarray(
            np.asarray(sd["quantize.embedding.weight"], np.float32))},
        "quant_conv": _t_conv(sd, "quant_conv"),
        "post_quant_conv": _t_conv(sd, "post_quant_conv"),
    }
