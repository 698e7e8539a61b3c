"""LPIPS perceptual distance (reference: sgm/modules/autoencoding/lpips/
loss/lpips.py — VGG16 feature slices relu1_2/2_2/3_3/4_3/5_3, per-channel
unit normalization (:141-143), squared diffs through learned 1x1 "lin"
convs, spatial average, summed over the five scales; inputs shifted/
scaled by the hardcoded ImageNet-ish constants (:68-79)).

TPU-native functional rebuild.  Weight-gated: `lpips_params_from_torch`
maps a torchvision vgg16 `features.*` state dict + the vendored
`vgg.pth` lin weights; `init_lpips_params` gives a random-init smoke
mode so the math is testable without weights (tests/test_evals.py golden
vs a torch oracle with shared random weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# conv layer indices of torchvision vgg16 .features and slice boundaries
_VGG_CONVS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_SLICE_ENDS = [4, 9, 16, 23, 30]    # feature taps AFTER the relu at end-1
_POOLS = {4, 9, 16, 23}             # maxpool positions
_CHNS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    # x: (b, H, W, C); w torch layout (out, in, 3, 3)
    y = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)).astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def vgg16_features(params, x):
    """x: (b, 3, H, W) -> the five LPIPS feature taps, NCHW."""
    x = jnp.transpose(x, (0, 2, 3, 1))
    taps = []
    ci = 0
    for idx in range(30):
        if idx in _POOLS:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        elif idx in _VGG_CONVS:
            w, b = params["convs"][ci]["kernel"], params["convs"][ci]["bias"]
            x = jax.nn.relu(_conv(x, w, b))
            ci += 1
        if idx + 1 in _SLICE_ENDS:
            taps.append(jnp.transpose(x, (0, 3, 1, 2)))
    return taps


def lpips(params, x, y):
    """x/y: (b, 3, H, W) in [-1, 1].  Returns (b,) perceptual distance."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    fx = vgg16_features(params, (x - shift) / scale)
    fy = vgg16_features(params, (y - shift) / scale)
    total = 0.0
    for kk in range(len(_CHNS)):
        nx = fx[kk] / (jnp.sqrt(jnp.sum(fx[kk] ** 2, 1, keepdims=True)) + 1e-10)
        ny = fy[kk] / (jnp.sqrt(jnp.sum(fy[kk] ** 2, 1, keepdims=True)) + 1e-10)
        d = (nx - ny) ** 2
        lin = params["lins"][kk]            # (C,) nonneg weights, 1x1 conv
        total = total + jnp.mean(
            jnp.sum(d * lin[None, :, None, None], axis=1), axis=(1, 2))
    return total


def init_lpips_params(key):
    """Random-init smoke mode (weights are normally converted)."""
    ks = jax.random.split(key, len(_VGG_CONVS) + len(_CHNS))
    chans = [3, 64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    convs = []
    for i in range(len(_VGG_CONVS)):
        cin, cout = chans[i], chans[i + 1]
        convs.append({
            "kernel": 0.05 * jax.random.normal(ks[i], (cout, cin, 3, 3)),
            "bias": jnp.zeros((cout,)),
        })
    lins = [jnp.abs(jax.random.normal(ks[len(_VGG_CONVS) + k], (c,))) * 0.1
            for k, c in enumerate(_CHNS)]
    return {"convs": convs, "lins": lins}


def lpips_params_from_torch(vgg_sd, lpips_sd):
    """torchvision `vgg16().features` state dict ('features.N.weight') +
    the reference's vendored vgg.pth ('linK.model.1.weight')."""
    convs = [{"kernel": np.asarray(vgg_sd[f"features.{i}.weight"]),
              "bias": np.asarray(vgg_sd[f"features.{i}.bias"])}
             for i in _VGG_CONVS]
    lins = [np.asarray(lpips_sd[f"lin{k}.model.1.weight"])[0, :, 0, 0]
            for k in range(len(_CHNS))]
    return {"convs": convs, "lins": lins}
