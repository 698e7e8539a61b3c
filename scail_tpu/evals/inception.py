"""InceptionV3 FID feature extractor (2048-d pool3) in JAX.

The reference's FID harness loads NVIDIA's pickled port of the original
TF `inception-2015-12-05` network (eval/eval_fid.py:33-41) — a GPU
torchscript we cannot run or vendor here.  This is the standard FID
variant of InceptionV3 (architecture and parameter naming of
pytorch-fid's `pt_inception-2015-12-05`, itself the torch port of the
same TF graph): BasicConv2d = bias-free conv + BatchNorm(eps=1e-3) +
relu, and the FID-specific average pools with count_include_pad=False
plus the max-pool branch in the final InceptionE block.

`inception_params_from_state_dict` ingests a pytorch-fid
`pt_inception-2015-12-05-*.pth` state dict (strict: every expected
parameter must exist with the right shape, which doubles as a structural
check of this port); `init_inception_params` is the random-init smoke
mode.  Features are the 2048-d global-average pool, the FID statistic
input (feature_dim=2048, eval/eval_fid.py:37).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-3  # torchvision inception BN eps


# ---------------------------------------------------------------------------
# primitive units
# ---------------------------------------------------------------------------
def _conv_bn(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    x = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + _EPS)
    x = (x - p["mean"]) * (inv * p["scale"]) + p["bias"]
    return jax.nn.relu(x)


def _maxpool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avgpool_nocount(x, k=3):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False
    (the FIDInception* patch over torch's default)."""
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, 1, 1, 1), pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, 1, 1, 1), pad)
    return s / n


def _p(k):  # symmetric padding helper for (kh, kw)
    return ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))


# ---------------------------------------------------------------------------
# inception blocks (channel plan = torchvision InceptionV3)
# ---------------------------------------------------------------------------
def _inception_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_2"], _conv_bn(p["branch5x5_1"], x),
                  padding=_p((5, 5)))
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=_p((3, 3)))
    bd = _conv_bn(p["branch3x3dbl_3"], bd, padding=_p((3, 3)))
    bp = _conv_bn(p["branch_pool"], _avgpool_nocount(x))
    return jnp.concatenate([b1, b5, bd, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=(2, 2))
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=_p((3, 3)))
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=(2, 2))
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


def _inception_c(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=_p((1, 7)))
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=_p((7, 1)))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=_p((7, 1)))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=_p((1, 7)))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=_p((7, 1)))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=_p((1, 7)))
    bp = _conv_bn(p["branch_pool"], _avgpool_nocount(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv_bn(p["branch3x3_2"], _conv_bn(p["branch3x3_1"], x),
                  stride=(2, 2))
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=_p((1, 7)))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=_p((7, 1)))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=(2, 2))
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


def _inception_e(p, x, pool: str):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=_p((1, 3))),
        _conv_bn(p["branch3x3_2b"], b3, padding=_p((3, 1))),
    ], axis=-1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=_p((3, 3)))
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=_p((1, 3))),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=_p((3, 1))),
    ], axis=-1)
    if pool == "avg":
        bp = _avgpool_nocount(x)
    else:  # FIDInceptionE_2: max pool (pytorch-fid inception.py)
        bp = _maxpool(x, k=3, s=1, pad=1)
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_features(params, images01):
    """images01: (b, 3, H, W) in [0, 1].  Bilinear-resized to 299, scaled
    to [-1, 1], returns the 2048-d pool3 features."""
    from scail_tpu.ops.resize import resize_bilinear

    x = resize_bilinear(images01.astype(jnp.float32), 299, 299)
    x = x * 2.0 - 1.0
    x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC

    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=(2, 2))
    x = _conv_bn(params["Conv2d_2a_3x3"], x)
    x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=_p((3, 3)))
    x = _maxpool(x)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x)
    x = _maxpool(x)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params[name], x)
    x = _inception_b(params["Mixed_6a"], x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params[name], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, pool="avg")
    x = _inception_e(params["Mixed_7c"], x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # (b, 2048)


# ---------------------------------------------------------------------------
# structure table: {block: {unit: (cin, cout, kh, kw)}}
# ---------------------------------------------------------------------------
def _a(cin, pool):
    return {"branch1x1": (cin, 64, 1, 1), "branch5x5_1": (cin, 48, 1, 1),
            "branch5x5_2": (48, 64, 5, 5), "branch3x3dbl_1": (cin, 64, 1, 1),
            "branch3x3dbl_2": (64, 96, 3, 3), "branch3x3dbl_3": (96, 96, 3, 3),
            "branch_pool": (cin, pool, 1, 1)}


def _c(c7):
    return {"branch1x1": (768, 192, 1, 1), "branch7x7_1": (768, c7, 1, 1),
            "branch7x7_2": (c7, c7, 1, 7), "branch7x7_3": (c7, 192, 7, 1),
            "branch7x7dbl_1": (768, c7, 1, 1), "branch7x7dbl_2": (c7, c7, 7, 1),
            "branch7x7dbl_3": (c7, c7, 1, 7), "branch7x7dbl_4": (c7, c7, 7, 1),
            "branch7x7dbl_5": (c7, 192, 1, 7), "branch_pool": (768, 192, 1, 1)}


def _e(cin):
    return {"branch1x1": (cin, 320, 1, 1), "branch3x3_1": (cin, 384, 1, 1),
            "branch3x3_2a": (384, 384, 1, 3), "branch3x3_2b": (384, 384, 3, 1),
            "branch3x3dbl_1": (cin, 448, 1, 1), "branch3x3dbl_2": (448, 384, 3, 3),
            "branch3x3dbl_3a": (384, 384, 1, 3), "branch3x3dbl_3b": (384, 384, 3, 1),
            "branch_pool": (cin, 192, 1, 1)}


INCEPTION_STRUCTURE = {
    "Conv2d_1a_3x3": (3, 32, 3, 3), "Conv2d_2a_3x3": (32, 32, 3, 3),
    "Conv2d_2b_3x3": (32, 64, 3, 3), "Conv2d_3b_1x1": (64, 80, 1, 1),
    "Conv2d_4a_3x3": (80, 192, 3, 3),
    "Mixed_5b": _a(192, 32), "Mixed_5c": _a(256, 64), "Mixed_5d": _a(288, 64),
    "Mixed_6a": {"branch3x3": (288, 384, 3, 3), "branch3x3dbl_1": (288, 64, 1, 1),
                 "branch3x3dbl_2": (64, 96, 3, 3), "branch3x3dbl_3": (96, 96, 3, 3)},
    "Mixed_6b": _c(128), "Mixed_6c": _c(160), "Mixed_6d": _c(160),
    "Mixed_6e": _c(192),
    "Mixed_7a": {"branch3x3_1": (768, 192, 1, 1), "branch3x3_2": (192, 320, 3, 3),
                 "branch7x7x3_1": (768, 192, 1, 1), "branch7x7x3_2": (192, 192, 1, 7),
                 "branch7x7x3_3": (192, 192, 7, 1), "branch7x7x3_4": (192, 192, 3, 3)},
    "Mixed_7b": _e(1280), "Mixed_7c": _e(2048),
}


def _iter_units():
    for block, spec in INCEPTION_STRUCTURE.items():
        if isinstance(spec, tuple):
            yield block, None, spec
        else:
            for unit, s in spec.items():
                yield block, unit, s


def init_inception_params(key):
    params: dict = {}
    ks = iter(jax.random.split(key, 128))
    for block, unit, (cin, cout, kh, kw) in _iter_units():
        p = {"kernel": 0.05 * jax.random.normal(next(ks), (kh, kw, cin, cout)),
             "scale": jnp.ones((cout,), jnp.float32),
             "bias": jnp.zeros((cout,), jnp.float32),
             "mean": jnp.zeros((cout,), jnp.float32),
             "var": jnp.ones((cout,), jnp.float32)}
        if unit is None:
            params[block] = p
        else:
            params.setdefault(block, {})[unit] = p
    return params


def inception_params_from_state_dict(sd):
    """pytorch-fid `pt_inception-2015-12-05` naming:
    <block>[.<unit>].conv.weight + .bn.{weight,bias,running_mean,running_var}.
    Strict: every unit must be present with the expected shape."""
    params: dict = {}
    for block, unit, (cin, cout, kh, kw) in _iter_units():
        stem = block if unit is None else f"{block}.{unit}"
        w = np.asarray(sd[f"{stem}.conv.weight"])
        assert w.shape == (cout, cin, kh, kw), (stem, w.shape)
        p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
             "scale": np.asarray(sd[f"{stem}.bn.weight"]),
             "bias": np.asarray(sd[f"{stem}.bn.bias"]),
             "mean": np.asarray(sd[f"{stem}.bn.running_mean"]),
             "var": np.asarray(sd[f"{stem}.bn.running_var"])}
        if unit is None:
            params[block] = p
        else:
            params.setdefault(block, {})[unit] = p
    return params


def load_inception_params(path: str):
    from scail_tpu.convert.torch_ckpt import load_torch_state_dict

    return inception_params_from_state_dict(load_torch_state_dict(path))
