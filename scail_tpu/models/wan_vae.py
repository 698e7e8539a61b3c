"""Wan2.1 3D causal VAE, TPU-native (reference: sgm/models/wan_vae.py).

dim=96, z=16, dim_mult=[1,2,4,4], 2 res blocks, temporal downsample pattern
[False, True, True] => 4x temporal / 8x8 spatial compression with 16 latent
channels (wan_vae.py:592-616).

The reference streams frames through the network with per-conv 2-frame
feature caches (`feat_cache`, wan_vae.py:28-36, :202-220, :516-568).  That
cache dance is just an incremental evaluation of *causal* convolutions, so
this implementation has two exactly-equivalent modes:

  * full-sequence: every CausalConv3d pads its time axis left by 2 and runs
    one big conv -- ideal for XLA/MXU when activations fit in HBM.  The two
    stateful resample layers have closed forms derived from the cache
    semantics:
      - downsample3d time conv (stride 2, kernel 3, no pad): the first frame
        passes through untouched; remaining output frames are the stride-2
        windows starting at frame 0:  out = concat([x[:, :1], conv_s2(x)])
        (wan_vae.py:143-159).
      - upsample3d time conv: the first frame passes through (not doubled,
        'Rep' marker path, wan_vae.py:103-137); frames 1..T-1 go through a
        causal conv that NEVER sees frame 0 (it was consumed by the marker
        path), i.e. conv(zero_pad2 ++ x[:, 1:]) -> (2c) -> frame-interleave.
  * streamed: `lax.scan` over temporal chunks with a fixed-shape cache
    pytree (2 zero-initialised frames per conv) -- used for production
    decode where full-resolution activations (96ch x 81f x 512 x 896) would
    blow HBM.  Chunking matches the reference exactly: encode [1,4,4,...]
    input frames (wan_vae.py:516-542), decode one latent frame at a time
    (wan_vae.py:544-568).

Layout is channels-last (b, t, h, w, c); the converter transposes torch
conv kernels (o,i,kt,kh,kw)->(kt,kh,kw,i,o).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.ops.norms import channel_rms_norm
from scail_tpu.utils.registry import register

CACHE_T = 2

# per-channel latent statistics (wan_vae.py:630-640)
WAN_LATENT_MEAN = np.asarray([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], np.float32)
WAN_LATENT_STD = np.asarray([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], np.float32)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.dtype]

    @property
    def enc_dims(self):
        return [self.dim * u for u in (1,) + tuple(self.dim_mult)]

    @property
    def dec_dims(self):
        dm = tuple(self.dim_mult)
        return [self.dim * u for u in (dm[-1],) + dm[::-1]]

    @property
    def latent_mean(self):
        if self.z_dim == 16:
            return WAN_LATENT_MEAN
        return np.zeros((self.z_dim,), np.float32)

    @property
    def latent_std(self):
        if self.z_dim == 16:
            return WAN_LATENT_STD
        return np.ones((self.z_dim,), np.float32)


# ---------------------------------------------------------------------------
# Primitive layers (functional, channels-last)
# ---------------------------------------------------------------------------
def _conv3d(p, x, *, stride=(1, 1, 1), t_pad: int, s_pad: int,
            cache: Optional[jnp.ndarray] = None):
    """CausalConv3d (wan_vae.py:17-36): left-pad time by t_pad (or consume
    `cache` frames instead), symmetric spatial pad."""
    w = p["kernel"].astype(x.dtype)
    if cache is not None:
        x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
        tp = 0
    else:
        tp = t_pad
    pads = [(0, 0), (tp, 0), (s_pad, s_pad), (s_pad, s_pad), (0, 0)]
    x = jnp.pad(x, pads)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _conv2d(p, x, *, stride=(1, 1), pad=((1, 1), (1, 1))):
    """Per-frame conv2d applied over (b*t, h, w, c)."""
    b, t, h, wdt, c = x.shape
    xx = x.reshape(b * t, h, wdt, c)
    y = jax.lax.conv_general_dilated(
        xx, p["kernel"].astype(x.dtype), window_strides=stride,
        padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y.reshape(b, t, y.shape[1], y.shape[2], y.shape[3])


def _rms(p, x):
    """RMS_norm over channels (wan_vae.py:39-54), channels-last."""
    return channel_rms_norm(x, p["gamma"], axis=-1)


def _upsample2x(x):
    """nearest-exact 2x spatial upsample == pixel repeat for integer scale."""
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


class _Cache:
    """Mutable view over the per-conv cache pytree (feat_cache equivalent).

    In full-sequence mode (`store=None`) every lookup returns None and convs
    use causal zero padding instead.
    """

    def __init__(self, store: Optional[Dict[str, jnp.ndarray]]):
        self.store = store
        self.new: Dict[str, jnp.ndarray] = {}

    def enabled(self):
        return self.store is not None

    def pull(self, name: str, x, n_frames: int = CACHE_T):
        """Return cache frames for this conv and record the updated cache
        (last n_frames of [cache ++ x])."""
        if self.store is None:
            return None
        cache = self.store[name]
        ext = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
        self.new[name] = ext[:, -n_frames:]
        return cache


def _causal3(p, x, cache: _Cache, site: str, out_stride=(1, 1, 1)):
    """kernel-3 causal conv3d with cache bookkeeping; `site` is the unique
    cache key (the feat_idx equivalent)."""
    c = cache.pull(site, x)
    return _conv3d(p, x, stride=out_stride, t_pad=2, s_pad=1, cache=c)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------
def _residual_block(p, x, cache: _Cache, prefix: str):
    """(wan_vae.py:186-220): [RMS, SiLU, conv3, RMS, SiLU, conv3] + shortcut."""
    if "shortcut" in p:
        h = _conv3d(p["shortcut"], x, t_pad=0, s_pad=0)
    else:
        h = x
    y = jax.nn.silu(_rms(p["residual"]["0"], x))
    y = _causal3(p["residual"]["2"], y, cache, prefix + "/2")
    y = jax.nn.silu(_rms(p["residual"]["3"], y))
    y = _causal3(p["residual"]["6"], y, cache, prefix + "/6")
    return y + h


def _attention_block(p, x):
    """Single-head per-frame self attention (wan_vae.py:223-262)."""
    b, t, h, w, c = x.shape
    y = _rms(p["norm"], x)
    qkv = _conv2d(p["to_qkv"], y, stride=(1, 1), pad=((0, 0), (0, 0)))
    qkv = qkv.reshape(b * t, h * w, 3, c)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, t, h, w, c)
    o = _conv2d(p["proj"], o, stride=(1, 1), pad=((0, 0), (0, 0)))
    return x + o


def _resample(p, x, mode: str, cache: _Cache, prefix: str, first_chunk: bool):
    """(wan_vae.py:66-160).  `first_chunk` selects the 'Rep'/init-cache
    passthrough semantics in streamed mode; in full-sequence mode the closed
    forms below bake those semantics in."""
    if mode == "upsample3d":
        if cache.enabled():
            if first_chunk:
                # 'Rep' path (wan_vae.py:106-108, :120-126): no time conv on
                # the first chunk and NO frames cached from it -- the next
                # chunk sees pure zero context, so prime with zeros.
                b, _, h, w, c = x.shape
                cache.new[prefix + "/time_conv"] = jnp.zeros(
                    (b, CACHE_T, h, w, c), x.dtype
                )
            else:
                c = cache.pull(prefix + "/time_conv", x)
                y = _conv3d(p["time_conv"], x, t_pad=2, s_pad=0, cache=c)
                x = _interleave_double(y)
        else:
            if x.shape[1] > 1:
                y = _conv3d(p["time_conv"], x[:, 1:], t_pad=2, s_pad=0)
                x = jnp.concatenate([x[:, :1], _interleave_double(y)], axis=1)
        x = _upsample2x(x)
        return _conv2d(p["resample"]["1"], x)

    if mode == "upsample2d":
        x = _upsample2x(x)
        return _conv2d(p["resample"]["1"], x)

    if mode == "downsample2d" or mode == "downsample3d":
        # ZeroPad2d((0,1,0,1)) + 3x3 stride-2 conv (wan_vae.py:87-94)
        y = _conv2d(p["resample"]["1"], x, stride=(2, 2), pad=((0, 1), (0, 1)))
        if mode == "downsample3d":
            if cache.enabled():
                if first_chunk:
                    cache.new[prefix + "/time_conv"] = y[:, -1:]
                else:
                    c = cache.pull(prefix + "/time_conv", y, n_frames=1)
                    y = _conv3d(p["time_conv"], y, stride=(2, 1, 1),
                                t_pad=0, s_pad=0, cache=c)
            else:
                head = y[:, :1]
                tail = _conv3d(p["time_conv"], y, stride=(2, 1, 1), t_pad=0, s_pad=0)
                y = jnp.concatenate([head, tail], axis=1)
        return y

    return x


def _interleave_double(y):
    """(b, t, h, w, 2c) -> (b, 2t, h, w, c) frame interleave
    (wan_vae.py:134-137)."""
    b, t, h, w, c2 = y.shape
    c = c2 // 2
    y = y.reshape(b, t, h, w, 2, c)
    y = y.transpose(0, 1, 4, 2, 3, 5)
    return y.reshape(b, 2 * t, h, w, c)


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------
def _encoder(p, x, cfg: WanVAEConfig, cache: _Cache, first_chunk: bool):
    """(wan_vae.py:265-366)"""
    x = _causal3(p["conv1"], x, cache, "conv1")
    site = 0
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks):
            x = _residual_block(p["downsamples"][str(site)], x, cache,
                                f"downsamples/{site}")
            site += 1
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temporal_downsample[i] else "downsample2d"
            x = _resample(p["downsamples"][str(site)], x, mode, cache,
                          f"downsamples/{site}", first_chunk)
            site += 1
    x = _residual_block(p["middle"]["0"], x, cache, "middle/0")
    x = _attention_block(p["middle"]["1"], x)
    x = _residual_block(p["middle"]["2"], x, cache, "middle/2")
    x = jax.nn.silu(_rms(p["head"]["0"], x))
    x = _causal3(p["head"]["2"], x, cache, "head/2")
    return x


def _decoder(p, x, cfg: WanVAEConfig, cache: _Cache, first_chunk: bool):
    """(wan_vae.py:369-472)"""
    x = _causal3(p["conv1"], x, cache, "conv1")
    x = _residual_block(p["middle"]["0"], x, cache, "middle/0")
    x = _attention_block(p["middle"]["1"], x)
    x = _residual_block(p["middle"]["2"], x, cache, "middle/2")
    temporal_up = cfg.temporal_downsample[::-1]
    site = 0
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks + 1):
            x = _residual_block(p["upsamples"][str(site)], x, cache,
                                f"upsamples/{site}")
            site += 1
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if temporal_up[i] else "upsample2d"
            x = _resample(p["upsamples"][str(site)], x, mode, cache,
                          f"upsamples/{site}", first_chunk)
            site += 1
    x = jax.nn.silu(_rms(p["head"]["0"], x))
    x = _causal3(p["head"]["2"], x, cache, "head/2")
    return x


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------
def vae_encode(params, cfg: WanVAEConfig, video, *, streamed: bool = False):
    """video: (b, T, 3, H, W) in [-1,1], T = 1+4k.
    Returns normalised latent (b, 1+k, 16, H/8, W/8) fp32
    (mu path only, like WanVAE_.encode, wan_vae.py:516-542)."""
    x = video.transpose(0, 1, 3, 4, 2).astype(cfg.compute_dtype)  # -> bthwc
    if streamed:
        out = _encode_streamed(params, cfg, x)
    else:
        out = _encoder(params["encoder"], x, cfg, _Cache(None), True)
    moments = _conv3d(params["conv1"], out, t_pad=0, s_pad=0)
    mu = moments[..., : cfg.z_dim].astype(jnp.float32)
    mu = (mu - cfg.latent_mean) / cfg.latent_std
    return mu.transpose(0, 1, 4, 2, 3)  # -> btchw


def vae_decode(params, cfg: WanVAEConfig, z, *, streamed: bool = False):
    """z: (b, t, 16, h, w) normalised latent.  Returns (b, T, 3, H, W) in
    [-1,1] fp32 (WanVAE_.decode + clamp, wan_vae.py:544-568, :659-666)."""
    zl = z.transpose(0, 1, 3, 4, 2).astype(jnp.float32)
    zl = zl * cfg.latent_std + cfg.latent_mean
    zl = zl.astype(cfg.compute_dtype)
    x = _conv3d(params["conv2"], zl, t_pad=0, s_pad=0)
    if streamed:
        out = _decode_streamed(params, cfg, x)
    else:
        out = _decoder(params["decoder"], x, cfg, _Cache(None), True)
    out = jnp.clip(out.astype(jnp.float32), -1.0, 1.0)
    return out.transpose(0, 1, 4, 2, 3)


# ---------------------------------------------------------------------------
# Streamed evaluation: chunk loop with fixed-shape cache pytrees.
# ---------------------------------------------------------------------------
class _ZeroCache(_Cache):
    """Cache view for the FIRST chunk: every conv sees zero context (== the
    reference's feat_cache=None causal zero padding) and records the updated
    fixed-shape cache for the scan carry."""

    def __init__(self):
        self.store = None
        self.new = {}

    def enabled(self):
        return True

    def pull(self, name, x, n_frames=CACHE_T):
        zero = jnp.zeros((x.shape[0], n_frames, *x.shape[2:]), x.dtype)
        ext = jnp.concatenate([zero, x], axis=1)
        self.new[name] = ext[:, -n_frames:]
        return zero


def _encode_streamed(params, cfg: WanVAEConfig, x):
    """Chunked encode [1, 4, 4, ...] with carried caches (wan_vae.py:516-542)."""
    b, T = x.shape[0], x.shape[1]
    assert (T - 1) % 4 == 0, "encoder expects 1+4k frames"

    # chunk 0 (1 frame): zero caches == causal zero padding
    probe = _ZeroCache()
    out0 = _encoder(params["encoder"], x[:, :1], cfg, probe, first_chunk=True)
    caches = probe.new
    if T == 1:
        return out0

    chunks = x[:, 1:].reshape(b, (T - 1) // 4, 4, *x.shape[2:])
    chunks = chunks.transpose(1, 0, 2, 3, 4, 5)

    def step(caches, chunk):
        c = _Cache(caches)
        y = _encoder(params["encoder"], chunk, cfg, c, first_chunk=False)
        merged = dict(caches)
        merged.update(c.new)
        return merged, y

    caches, outs = jax.lax.scan(step, caches, chunks)
    outs = outs.transpose(1, 0, 2, 3, 4, 5).reshape(b, -1, *outs.shape[3:])
    return jnp.concatenate([out0, outs], axis=1)


def _decode_streamed(params, cfg: WanVAEConfig, x):
    """Per-latent-frame decode with carried caches (wan_vae.py:544-568)."""
    b, T = x.shape[0], x.shape[1]
    probe = _ZeroCache()
    out0 = _decoder(params["decoder"], x[:, :1], cfg, probe, first_chunk=True)
    caches = probe.new
    if T == 1:
        return out0

    frames = x[:, 1:].transpose(1, 0, 2, 3, 4)[:, :, None]  # (T-1, b, 1, h, w, c)

    def step(caches, frame):
        c = _Cache(caches)
        y = _decoder(params["decoder"], frame, cfg, c, first_chunk=False)
        merged = dict(caches)
        merged.update(c.new)
        return merged, y

    caches, outs = jax.lax.scan(step, caches, frames)
    outs = outs.transpose(1, 0, 2, 3, 4, 5).reshape(b, -1, *outs.shape[3:])
    return jnp.concatenate([out0, outs], axis=1)


# ---------------------------------------------------------------------------
# Context-parallel evaluation: temporal sharding with halo exchange.
# ---------------------------------------------------------------------------
class _PermuteCache(_Cache):
    """Cache view for context-parallel shards: each conv's 'cache' is the
    last frames of the PREVIOUS device's input, fetched with one ppermute
    over the 'seq' axis -- the TPU-native form of the reference's ring-pass
    `_pass_from_previous_rank` (sgm/modules/cp_enc_dec.py:182-276).

    Device 0 takes the probe caches recorded while the (replicated) first
    frame ran: zeros for stride-1 convs (== causal padding) and the special
    'Rep'/passthrough state for the temporal resamples.
    """

    def __init__(self, probe_caches, axis_name: str):
        self.store = probe_caches
        self.new = {}
        self.axis = axis_name

    def enabled(self):
        return True

    def pull(self, name, x, n_frames=CACHE_T):
        import jax

        P = jax.lax.axis_size(self.axis)
        idx = jax.lax.axis_index(self.axis)
        halo = x[:, -n_frames:]
        prev = jax.lax.ppermute(
            halo, self.axis, [(i, i + 1) for i in range(P - 1)])
        probe = self.store[name].astype(x.dtype)
        return jnp.where((idx == 0), probe, prev)


def vae_encode_cp(params, cfg: WanVAEConfig, video, mesh, axis_name: str = "seq"):
    """Context-parallel encode: frame 0 runs replicated, the remaining 4k
    frames shard over `axis_name` (k divisible by the axis size).  Exactly
    equal to the streamed/full-sequence result."""
    import jax
    from jax.sharding import PartitionSpec as P

    x = video.transpose(0, 1, 3, 4, 2).astype(cfg.compute_dtype)
    T = x.shape[1]
    Pn = mesh.shape[axis_name]
    assert (T - 1) % (4 * Pn) == 0, f"need 1+4k frames with k % {Pn} == 0"
    # conv halos fetch from ONE neighbour; every shard must keep >=2 frames
    # at the deepest temporal resolution (latent rate)
    assert (T - 1) // (4 * Pn) >= 2, (
        f"too few frames per shard: need >=2 latent frames/device, got "
        f"{(T - 1) // (4 * Pn)}")

    probe = _ZeroCache()
    out0 = _encoder(params["encoder"], x[:, :1], cfg, probe, first_chunk=True)
    caches = probe.new

    spec = P(None, axis_name, None, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), spec), out_specs=spec, check_vma=False,
    )
    def region(caches, xs):
        c = _PermuteCache(caches, axis_name)
        return _encoder(params["encoder"], xs, cfg, c, first_chunk=False)

    outs = region(caches, x[:, 1:])
    out = jnp.concatenate([out0, outs], axis=1)
    moments = _conv3d(params["conv1"], out, t_pad=0, s_pad=0)
    mu = moments[..., : cfg.z_dim].astype(jnp.float32)
    mu = (mu - cfg.latent_mean) / cfg.latent_std
    return mu.transpose(0, 1, 4, 2, 3)


def vae_decode_cp(params, cfg: WanVAEConfig, z, mesh, axis_name: str = "seq"):
    """Context-parallel decode: latent frame 0 replicated, frames 1..T-1
    sharded over `axis_name`."""
    import jax
    from jax.sharding import PartitionSpec as P

    zl = z.transpose(0, 1, 3, 4, 2).astype(jnp.float32)
    zl = zl * cfg.latent_std + cfg.latent_mean
    zl = zl.astype(cfg.compute_dtype)
    x = _conv3d(params["conv2"], zl, t_pad=0, s_pad=0)
    T = x.shape[1]
    Pn = mesh.shape[axis_name]
    assert (T - 1) % Pn == 0, f"need 1+m*{Pn} latent frames"
    assert (T - 1) // Pn >= 2, "need >=2 latent frames per shard (halo width)"

    probe = _ZeroCache()
    out0 = _decoder(params["decoder"], x[:, :1], cfg, probe, first_chunk=True)
    caches = probe.new

    spec = P(None, axis_name, None, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), spec), out_specs=spec, check_vma=False,
    )
    def region(caches, xs):
        c = _PermuteCache(caches, axis_name)
        return _decoder(params["decoder"], xs, cfg, c, first_chunk=False)

    outs = region(caches, x[:, 1:])
    out = jnp.concatenate([out0, outs], axis=1)
    out = jnp.clip(out.astype(jnp.float32), -1.0, 1.0)
    return out.transpose(0, 1, 4, 2, 3)


@register(alias="sgm.models.wan_vae.WanVAE")
class WanVAE:
    """Config wrapper matching the reference's WanVAE surface
    (wan_vae.py:619-666): holds frozen params + scale, encode/decode."""

    def __init__(self, z_dim: int = 16, vae_pth: str = None, dtype="torch.bfloat16",
                 device=None):
        dt = "bfloat16" if "bfloat16" in str(dtype) else "float32"
        self.config = WanVAEConfig(z_dim=z_dim, dtype=dt)
        self.vae_pth = vae_pth
        self.params = None
        if vae_pth:
            import os

            if os.path.exists(vae_pth):
                from scail_tpu.convert.wan_vae_ckpt import load_wan_vae_params

                self.params = load_wan_vae_params(vae_pth)

    def init(self, key):
        self.params = init_wan_vae_params(key, self.config)
        return self.params

    def encode(self, video, streamed: bool = True):
        return vae_encode(self.params, self.config, video, streamed=streamed)

    def decode(self, z, streamed: bool = True):
        return vae_decode(self.params, self.config, z, streamed=streamed)


# ---------------------------------------------------------------------------
# Init (for tests / from-scratch training; released weights come from
# Wan2.1_VAE.pth via scail_tpu.convert.wan_vae_ckpt)
# ---------------------------------------------------------------------------
def init_wan_vae_params(key, cfg: WanVAEConfig):
    keys = list(jax.random.split(key, 512))
    kit = iter(keys)

    def conv3(cin, cout, k=(3, 3, 3)):
        fan_in = cin * k[0] * k[1] * k[2]
        std = (1.0 / fan_in) ** 0.5
        return {
            "kernel": std * jax.random.normal(next(kit), (*k, cin, cout), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
        }

    def conv2(cin, cout, k=(3, 3)):
        fan_in = cin * k[0] * k[1]
        std = (1.0 / fan_in) ** 0.5
        return {
            "kernel": std * jax.random.normal(next(kit), (*k, cin, cout), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
        }

    def rms(c):
        return {"gamma": jnp.ones((c,), jnp.float32)}

    def resblock(cin, cout):
        p = {
            "residual": {
                "0": rms(cin), "2": conv3(cin, cout),
                "3": rms(cout), "6": conv3(cout, cout),
            }
        }
        if cin != cout:
            p["shortcut"] = conv3(cin, cout, (1, 1, 1))
        return p

    def attn(c):
        return {"norm": rms(c), "to_qkv": conv2(c, 3 * c, (1, 1)),
                "proj": conv2(c, c, (1, 1))}

    z2 = cfg.z_dim * 2
    enc_dims = cfg.enc_dims
    enc = {"conv1": conv3(3, enc_dims[0]), "downsamples": {}, "middle": {}, "head": {}}
    site = 0
    for i, (cin, cout) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
        for r in range(cfg.num_res_blocks):
            enc["downsamples"][str(site)] = resblock(cin if r == 0 else cout, cout)
            site += 1
        if i != len(cfg.dim_mult) - 1:
            p = {"resample": {"1": conv2(cout, cout)}}
            if cfg.temporal_downsample[i]:
                p["time_conv"] = conv3(cout, cout, (3, 1, 1))
            enc["downsamples"][str(site)] = p
            site += 1
    d = enc_dims[-1]
    enc["middle"] = {"0": resblock(d, d), "1": attn(d), "2": resblock(d, d)}
    enc["head"] = {"0": rms(d), "2": conv3(d, z2)}

    dec_dims = cfg.dec_dims
    temporal_up = cfg.temporal_downsample[::-1]
    dec = {"conv1": conv3(cfg.z_dim, dec_dims[0]), "middle": {}, "upsamples": {}, "head": {}}
    d0 = dec_dims[0]
    dec["middle"] = {"0": resblock(d0, d0), "1": attn(d0), "2": resblock(d0, d0)}
    site = 0
    for i, (cin, cout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        cin_eff = cin // 2 if i in (1, 2, 3) else cin  # (wan_vae.py:401-404)
        for r in range(cfg.num_res_blocks + 1):
            dec["upsamples"][str(site)] = resblock(cin_eff if r == 0 else cout, cout)
            site += 1
        if i != len(cfg.dim_mult) - 1:
            p = {"resample": {"1": conv2(cout, cout // 2)}}
            if temporal_up[i]:
                p["time_conv"] = conv3(cout, cout * 2, (3, 1, 1))
            dec["upsamples"][str(site)] = p
            site += 1
    dec["head"] = {"0": rms(dec_dims[-1]), "2": conv3(dec_dims[-1], 3)}

    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": conv3(z2, z2, (1, 1, 1)),
        "conv2": conv3(cfg.z_dim, cfg.z_dim, (1, 1, 1)),
    }
