"""GAN discriminators for autoencoder training.

- `nlayer_discriminator`: the Pix2Pix PatchGAN used by the reference's
  image/frame GAN loss (sgm/modules/autoencoding/lpips/model/model.py:20-91),
  channels-last, train-mode BatchNorm (batch statistics), weight-compat
  with the torch module via `nlayer_discriminator_params_from_torch`.
- `video_discriminator`: TPU-native counterpart of the reference's
  Discriminator3D (sgm/modules/autoencoding/losses/video_loss.py:341-442):
  log2(frames) 3D residual blocks with space-to-channel 2x downsampling,
  then 2D residual blocks with linear space attention down to 4x4, then a
  conv+linear logit head.  The reference's TaylorSeriesLinearAttn and
  kornia blur are external CUDA-era deps; this uses the standard
  (1+elu)-feature linear attention (Katharopoulos et al. 2020) with the
  same residual placement, and skips the optional blur (the reference
  defaults antialiased_downsample=False, video_loss.py:354).

All convs run channels-last on the MXU; these nets are training-only
(no released weights exist for them).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv_init(key, k_hw, c_in, c_out, *, std=0.02, bias=True):
    """N(0, 0.02) conv init, the GAN weights_init convention
    (lpips/model/model.py:8-17)."""
    kkernel, _ = jax.random.split(key)
    w = jax.random.normal(kkernel, (*k_hw, c_in, c_out), jnp.float32) * std
    p = {"kernel": w}
    if bias:
        p["bias"] = jnp.zeros((c_out,), jnp.float32)
    return p


def _conv2d(p, x, *, stride=(1, 1), padding=((1, 1), (1, 1))):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=stride,
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _conv3d(p, x, *, stride=(1, 1, 1), padding=((1, 1), (1, 1), (1, 1))):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=stride,
        padding=padding, dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _batch_norm(p, x, eps=1e-5):
    """Train-mode BatchNorm (batch statistics, biased variance) over all
    non-channel axes -- what torch BatchNorm2d computes in train()."""
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=axes)
    var = xf.var(axis=axes)
    y = (xf - mean) / jnp.sqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _leaky_relu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# NLayerDiscriminator (PatchGAN)
# ---------------------------------------------------------------------------
def init_nlayer_discriminator(key, input_nc: int = 3, ndf: int = 64,
                              n_layers: int = 3) -> Dict:
    """Mirror of NLayerDiscriminator.__init__ (model.py:25-88) with the
    GAN init applied: first conv (bias), then n_layers-1 strided
    conv+BN (no bias), one stride-1 conv+BN, and the 1-channel logit
    conv (bias)."""
    keys = jax.random.split(key, n_layers + 2)
    layers: List[Dict] = [
        {"conv": _conv_init(keys[0], (4, 4), input_nc, ndf)}]
    nf_mult = 1
    for n in range(1, n_layers):
        nf_prev, nf_mult = nf_mult, min(2 ** n, 8)
        layers.append({
            "conv": _conv_init(keys[n], (4, 4), ndf * nf_prev,
                               ndf * nf_mult, bias=False),
            "bn": {"scale": 1.0 + 0.02 * jax.random.normal(
                jax.random.fold_in(keys[n], 1), (ndf * nf_mult,)),
                "bias": jnp.zeros((ndf * nf_mult,))},
        })
    nf_prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
    layers.append({
        "conv": _conv_init(keys[n_layers], (4, 4), ndf * nf_prev,
                           ndf * nf_mult, bias=False),
        "bn": {"scale": 1.0 + 0.02 * jax.random.normal(
            jax.random.fold_in(keys[n_layers], 1), (ndf * nf_mult,)),
            "bias": jnp.zeros((ndf * nf_mult,))},
    })
    layers.append({"conv": _conv_init(keys[-1], (4, 4), ndf * nf_mult, 1)})
    return {"layers": layers}


def nlayer_discriminator(params, x):
    """x: (b, h, w, c) channels-last in [-1, 1].  Returns patch logits
    (b, h', w', 1).  Strides/padding match model.py:45-88: stride 2 for
    the first n_layers convs, stride 1 for the last two."""
    layers = params["layers"]
    n_layers = len(layers) - 2  # first conv + (n-1) mids + stride-1 + logit
    x = _conv2d(layers[0]["conv"], x, stride=(2, 2))
    x = _leaky_relu(x, 0.2)
    for i in range(1, n_layers):
        x = _conv2d(layers[i]["conv"], x, stride=(2, 2))
        x = _batch_norm(layers[i]["bn"], x)
        x = _leaky_relu(x, 0.2)
    x = _conv2d(layers[n_layers]["conv"], x, stride=(1, 1))
    x = _batch_norm(layers[n_layers]["bn"], x)
    x = _leaky_relu(x, 0.2)
    return _conv2d(layers[n_layers + 1]["conv"], x, stride=(1, 1))


def nlayer_discriminator_params_from_torch(sd: Dict, n_layers: int = 3) -> Dict:
    """Map the torch module's `main.{i}.*` state dict onto the JAX tree
    (conv kernels (o,i,kh,kw) -> (kh,kw,i,o))."""

    def kconv(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
        p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"],
                                               np.float32))
        return p

    def kbn(prefix):
        return {"scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"],
                                                np.float32)),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"],
                                               np.float32))}

    # torch Sequential indices: 0 conv, 1 lrelu, then per middle layer
    # [conv, bn, lrelu] at 2+3(n-1); final conv at the end
    layers = [{"conv": kconv("main.0")}]
    idx = 2
    for _ in range(1, n_layers):
        layers.append({"conv": kconv(f"main.{idx}"),
                       "bn": kbn(f"main.{idx + 1}")})
        idx += 3
    layers.append({"conv": kconv(f"main.{idx}"),
                   "bn": kbn(f"main.{idx + 1}")})
    idx += 3
    layers.append({"conv": kconv(f"main.{idx}")})
    return {"layers": layers}


# ---------------------------------------------------------------------------
# Video discriminator (Discriminator3D counterpart)
# ---------------------------------------------------------------------------
def _rms_norm_c(p, x, eps=1e-6):
    n = x.astype(jnp.float32)
    n = n * jax.lax.rsqrt(jnp.mean(n * n, axis=-1, keepdims=True) + eps)
    return (n * p["scale"]).astype(x.dtype)


def _linear_space_attention(p, x):
    """(b, h, w, c) linear attention over the spatial sequence with
    (1+elu) feature maps; 1x1-conv qkv/out projections, pre-RMSNorm
    (the residual placement of video_loss.py:394-405)."""
    b, h, w, c = x.shape
    y = _rms_norm_c(p["norm"], x).reshape(b, h * w, c)
    qkv = y @ p["qkv"]["kernel"].astype(y.dtype)
    n_heads = p["heads"]
    dh = qkv.shape[-1] // (3 * n_heads)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, h * w, n_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    qf = jax.nn.elu(q.astype(jnp.float32)) + 1.0
    kf = jax.nn.elu(k.astype(jnp.float32)) + 1.0
    kv = jnp.einsum("bnsd,bnse->bnde", kf, v.astype(jnp.float32))
    z = jnp.einsum("bnsd,bnd->bns", qf, kf.sum(axis=2)) + 1e-6
    out = jnp.einsum("bnsd,bnde->bnse", qf, kv) / z[..., None]
    out = out.transpose(0, 2, 1, 3).reshape(b, h * w, n_heads * dh)
    out = out.astype(x.dtype) @ p["out"]["kernel"].astype(x.dtype)
    return out.reshape(b, h, w, c)


def _ff_geglu(p, x):
    """1x1-conv GEGLU feed-forward (magvit2 FeedForward, images=True)."""
    y = _rms_norm_c(p["norm"], x)
    y = y @ p["in"]["kernel"].astype(y.dtype)
    a, g = jnp.split(y, 2, axis=-1)
    y = jax.nn.gelu(g) * a
    return y @ p["out"]["kernel"].astype(y.dtype)


def init_video_discriminator(key, *, dim: int = 16, image_size: int = 64,
                             frame_num: int = 8, channels: int = 3,
                             max_dim: int = 512, attn_heads: int = 4,
                             attn_dim_head: int = 8, ff_mult: int = 4) -> Dict:
    """Layer plan identical to Discriminator3D (video_loss.py:341-429):
    num_layers = log2(min_res) - 2 blocks total, the first
    log2(frame_num) of them 3D (halving t, h, w), the rest 2D with
    attention; logits via conv3x3 + flatten + linear."""
    num_layers = int(math.log2(image_size) - 2)
    t_layers = int(math.log2(frame_num))
    assert 2 ** t_layers == frame_num, "frame_num must be a power of 2"
    assert t_layers <= num_layers, (
        f"need log2(frames)={t_layers} <= log2(min_res)-2={num_layers} "
        f"so time fully collapses before the 2D stage")
    layer_dims = [channels] + [min((dim * 4) * (2 ** i), max_dim)
                               for i in range(num_layers)]
    keys = jax.random.split(key, num_layers + 2)
    blocks = []
    for ind in range(num_layers):
        cin, cout = layer_dims[ind], layer_dims[ind + 1]
        kk = jax.random.split(keys[ind], 8)
        if ind < t_layers:
            blocks.append({
                "conv_res": _conv_init(kk[0], (1, 1, 1), cin, cout),
                "conv1": _conv_init(kk[1], (3, 3, 3), cin, cout),
                "conv2": _conv_init(kk[2], (3, 3, 3), cout, cout),
                "down": _conv_init(kk[3], (1, 1, 1), cout * 8, cout),
            })
        else:
            is_last = ind == num_layers - 1
            blk = {
                "conv_res": _conv_init(kk[0], (1, 1), cin, cout),
                "conv1": _conv_init(kk[1], (3, 3), cin, cout),
                "conv2": _conv_init(kk[2], (3, 3), cout, cout),
                "attn": {
                    "norm": {"scale": jnp.ones((cout,))},
                    "qkv": {"kernel": jax.random.normal(
                        kk[4], (cout, 3 * attn_heads * attn_dim_head)) * 0.02},
                    "out": {"kernel": jax.random.normal(
                        kk[5], (attn_heads * attn_dim_head, cout)) * 0.02},
                    "heads": attn_heads,
                },
                "ff": {
                    "norm": {"scale": jnp.ones((cout,))},
                    "in": {"kernel": jax.random.normal(
                        kk[6], (cout, 2 * int(cout * ff_mult * 2 / 3))) * 0.02},
                    "out": {"kernel": jax.random.normal(
                        kk[7], (int(cout * ff_mult * 2 / 3), cout)) * 0.02},
                },
            }
            if not is_last:
                blk["down"] = _conv_init(kk[3], (1, 1), cout * 4, cout)
            blocks.append(blk)
    dim_last = layer_dims[-1]
    # every 3D block halves h/w; 2D blocks too, except the last block
    # (is_last has no "down") — so with a 2D tail there are num_layers-1
    # spatial halvings, and num_layers when the stack is all-3D
    n_down = num_layers if t_layers >= num_layers else num_layers - 1
    fmap = image_size // (2 ** n_down)
    latent_dim = fmap * fmap * dim_last
    k1, k2 = jax.random.split(keys[-1])
    head = {
        "conv": _conv_init(k1, (3, 3), dim_last, dim_last),
        "linear": {"kernel": jax.random.normal(
            k2, (latent_dim, 1)) * (1.0 / math.sqrt(latent_dim)),
            "bias": jnp.zeros((1,))},
    }
    return {"blocks": blocks, "head": head}


def _space_to_channel_2d(x):
    b, h, w, c = x.shape
    return (x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, c * 4))


def _space_to_channel_3d(x):
    b, t, h, w, c = x.shape
    return (x.reshape(b, t // 2, 2, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 5, 7, 2, 4, 6)
            .reshape(b, t // 2, h // 2, w // 2, c * 8))


def video_discriminator(params, x):
    """x: (b, t, h, w, c) in [-1, 1].  Returns (b,) logits.

    Block kind and downsampling are derived from the (static) kernel
    shapes so the params tree holds only arrays and stays jax.grad- and
    optax-friendly: 3D blocks carry 5-D conv kernels, and only
    downsampling 2D blocks carry a "down" conv."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for blk in params["blocks"]:
        if blk["conv1"]["kernel"].ndim == 5:
            res = _conv3d(blk["conv_res"], x, stride=(2, 2, 2),
                          padding=((0, 0), (0, 0), (0, 0)))
            y = _leaky_relu(_conv3d(blk["conv1"], x), 0.1)
            y = _leaky_relu(_conv3d(blk["conv2"], y), 0.1)
            y = _space_to_channel_3d(y)
            y = _conv3d(blk["down"], y, padding=((0, 0), (0, 0), (0, 0)))
            x = (y + res) * inv_sqrt2
            if x.shape[1] == 1:
                x = x[:, 0]  # collapse to 2D once time is gone
        else:
            if x.ndim == 5:
                # more 2D blocks than remaining time: fold t into batch
                # like the reference rearrange (video_loss.py:436)
                b, t, h, w, c = x.shape
                x = x.reshape(b * t, h, w, c)
            downsample = "down" in blk
            stride = (2, 2) if downsample else (1, 1)
            res = _conv2d(blk["conv_res"], x, stride=stride,
                          padding=((0, 0), (0, 0)))
            y = _leaky_relu(_conv2d(blk["conv1"], x), 0.1)
            y = _leaky_relu(_conv2d(blk["conv2"], y), 0.1)
            if downsample:
                y = _space_to_channel_2d(y)
                y = _conv2d(blk["down"], y, padding=((0, 0), (0, 0)))
            x = (y + res) * inv_sqrt2
            x = x + _linear_space_attention(blk["attn"], x)
            x = x + _ff_geglu(blk["ff"], x)
    h = params["head"]
    x = _leaky_relu(_conv2d(h["conv"], x), 0.1)
    x = x.reshape(x.shape[0], -1)
    return (x @ h["linear"]["kernel"].astype(x.dtype)
            + h["linear"]["bias"].astype(x.dtype))[:, 0]
