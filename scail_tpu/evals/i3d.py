"""Inception-v1 I3D feature extractor in JAX (channels-last, NDHWC).

Port of the FVD backbone the reference vendors at
eval/fvd/videogpt/pytorch_i3d.py:1-322 (both FVD flavours — the videogpt
state dict and the styleganv torchscript — are this same network with
Kinetics-400 weights; both return the 400-d pre-softmax logits as FVD
features, eval/fvd/videogpt/fvd.py:61-64, eval/fvd/styleganv/fvd.py:21-30).

Padding follows the torch module exactly: zero-pad by TF-SAME amounts,
then VALID conv/pool — for max-pooling the zero padding participates in
the max, as in MaxPool3dSamePadding (pytorch_i3d.py:7-34).

Weights load from the released `i3d_pretrained_400.pt` via
`i3d_params_from_state_dict`; `init_i3d_params` gives a random-init smoke
mode so the FVD harness runs end-to-end without external downloads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# (name, kind, spec); mirrors InceptionI3d.__init__ (pytorch_i3d.py:204-273)
I3D_LAYERS = (
    ("Conv3d_1a_7x7", "conv", dict(out=64, k=(7, 7, 7), s=(2, 2, 2))),
    ("MaxPool3d_2a_3x3", "pool", dict(k=(1, 3, 3), s=(1, 2, 2))),
    ("Conv3d_2b_1x1", "conv", dict(out=64, k=(1, 1, 1), s=(1, 1, 1))),
    ("Conv3d_2c_3x3", "conv", dict(out=192, k=(3, 3, 3), s=(1, 1, 1))),
    ("MaxPool3d_3a_3x3", "pool", dict(k=(1, 3, 3), s=(1, 2, 2))),
    ("Mixed_3b", "mix", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", "mix", (128, 128, 192, 32, 96, 64)),
    ("MaxPool3d_4a_3x3", "pool", dict(k=(3, 3, 3), s=(2, 2, 2))),
    ("Mixed_4b", "mix", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", "mix", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", "mix", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", "mix", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", "mix", (256, 160, 320, 32, 128, 128)),
    ("MaxPool3d_5a_2x2", "pool", dict(k=(2, 2, 2), s=(2, 2, 2))),
    ("Mixed_5b", "mix", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", "mix", (384, 192, 384, 48, 128, 128)),
)
NUM_CLASSES = 400
_FINAL_CH = 384 + 384 + 128 + 128  # Mixed_5c output


def _same_pads(size: int, k: int, s: int):
    """TF-SAME pad amounts (pytorch_i3d.py:9-13)."""
    if size % s == 0:
        pad = max(k - s, 0)
    else:
        pad = max(k - (size % s), 0)
    return pad // 2, pad - pad // 2


def _pad_same(x, k, s):
    pads = [(0, 0)]
    for d in range(3):
        pads.append(_same_pads(x.shape[1 + d], k[d], s[d]))
    pads.append((0, 0))
    return jnp.pad(x, pads)  # zeros, like torch F.pad


def _conv3d(p, x, k, s):
    x = _pad_same(x, k, s)
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=s, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _unit3d(p, x, k, s=(1, 1, 1), bn=True, relu=True):
    """Unit3D: same-pad conv3d (+ eval-mode BatchNorm) (+ relu)
    (pytorch_i3d.py:37-103)."""
    x = _conv3d(p["conv3d"], x, k, s)
    if "bias" in p["conv3d"]:
        x = x + p["conv3d"]["bias"].astype(x.dtype)
    if bn:
        b = p["bn"]
        inv = jax.lax.rsqrt(b["var"].astype(jnp.float32) + 1e-5)
        x = (x - b["mean"]) * (inv * b["scale"]) + b["bias"]
    if relu:
        x = jax.nn.relu(x)
    return x


def _maxpool_same(x, k, s):
    x = _pad_same(x, k, s)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, *k, 1), window_strides=(1, *s, 1),
        padding="VALID")


def _inception_module(p, x, spec):
    """4-branch inception block (pytorch_i3d.py:107-132)."""
    b0 = _unit3d(p["b0"], x, (1, 1, 1))
    b1 = _unit3d(p["b1b"], _unit3d(p["b1a"], x, (1, 1, 1)), (3, 3, 3))
    b2 = _unit3d(p["b2b"], _unit3d(p["b2a"], x, (1, 1, 1)), (3, 3, 3))
    b3 = _unit3d(p["b3b"], _maxpool_same(x, (3, 3, 3), (1, 1, 1)), (1, 1, 1))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_logits(params, videos):
    """videos: (b, 3, t, h, w) in [-1, 1] (the reference preprocessing
    range).  Returns the 400-d per-video FVD features: spatial 2x7x7 avg
    pool -> 1x1x1 logits conv -> time mean (pytorch_i3d.py:305-315)."""
    x = jnp.transpose(videos, (0, 2, 3, 4, 1))  # NDHWC
    for name, kind, spec in I3D_LAYERS:
        if kind == "conv":
            x = _unit3d(params[name], x, spec["k"], spec["s"])
        elif kind == "pool":
            x = _maxpool_same(x, spec["k"], spec["s"])
        else:
            x = _inception_module(params[name], x, spec)
    # AvgPool3d (2,7,7) stride 1, VALID (pytorch_i3d.py:276).  At the
    # real 224px/16-frame geometry the feature map is exactly (2,7,7) so
    # the window is exact; clamping keeps smoke-mode sizes well-defined
    # (torch would raise there) without changing the 224 result.
    win = (min(2, x.shape[1]), min(7, x.shape[2]), min(7, x.shape[3]))
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window_dimensions=(1, *win, 1),
        window_strides=(1, 1, 1, 1, 1), padding="VALID") / float(np.prod(win))
    # logits Unit3D: 1x1x1 conv, bias, no bn, no act (pytorch_i3d.py:279-285)
    x = _unit3d(params["logits"], x, (1, 1, 1), bn=False, relu=False)
    x = jnp.mean(x, axis=(2, 3))  # spatial squeeze (size 1 at 224 input)
    return jnp.mean(x, axis=1)    # time mean -> (b, 400)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------
def _mix_in_channels():
    chans = {}
    c = None
    for name, kind, spec in I3D_LAYERS:
        if kind == "conv":
            c = spec["out"]
        elif kind == "mix":
            chans[name] = c if c is not None else 3
            c = spec[0] + spec[2] + spec[4] + spec[5]
    return chans


def init_i3d_params(key, in_channels: int = 3):
    """Random-init smoke mode (shape-exact vs the torch state dict)."""
    ks = iter(jax.random.split(key, 128))

    def unit(cin, cout, k, bn=True, bias=False):
        p = {"conv3d": {"kernel": 0.05 * jax.random.normal(
            next(ks), (*k, cin, cout), jnp.float32)}}
        if bias:
            p["conv3d"]["bias"] = jnp.zeros((cout,), jnp.float32)
        if bn:
            p["bn"] = {"scale": jnp.ones((cout,), jnp.float32),
                       "bias": jnp.zeros((cout,), jnp.float32),
                       "mean": jnp.zeros((cout,), jnp.float32),
                       "var": jnp.ones((cout,), jnp.float32)}
        return p

    params = {}
    mix_in = _mix_in_channels()
    cin = in_channels
    for name, kind, spec in I3D_LAYERS:
        if kind == "conv":
            params[name] = unit(cin, spec["out"], spec["k"])
            cin = spec["out"]
        elif kind == "mix":
            ci = mix_in[name]
            o = spec
            params[name] = {
                "b0": unit(ci, o[0], (1, 1, 1)),
                "b1a": unit(ci, o[1], (1, 1, 1)),
                "b1b": unit(o[1], o[2], (3, 3, 3)),
                "b2a": unit(ci, o[3], (1, 1, 1)),
                "b2b": unit(o[3], o[4], (3, 3, 3)),
                "b3b": unit(ci, o[5], (1, 1, 1)),
            }
            cin = o[0] + o[2] + o[4] + o[5]
    params["logits"] = unit(_FINAL_CH, NUM_CLASSES, (1, 1, 1), bn=False,
                            bias=True)
    return params


def i3d_params_from_state_dict(sd):
    """Map the torch `i3d_pretrained_400.pt` state dict (names per
    pytorch_i3d.py, e.g. 'Mixed_3b.b0.conv3d.weight') onto the JAX tree."""
    params: dict = {}
    for name, v in sd.items():
        v = np.asarray(v)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "weight" and v.ndim == 5:
            key, val = "kernel", np.ascontiguousarray(v.transpose(2, 3, 4, 1, 0))
        elif parts[-2] == "bn":
            key = {"weight": "scale", "bias": "bias",
                   "running_mean": "mean", "running_var": "var"}.get(leaf)
            if key is None:  # num_batches_tracked
                continue
            val = v
        elif leaf == "bias":
            key, val = "bias", v
        else:
            continue
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[key] = val
    return params


def load_i3d_params(path: str):
    from scail_tpu.convert.torch_ckpt import load_torch_state_dict

    return i3d_params_from_state_dict(load_torch_state_dict(path))
