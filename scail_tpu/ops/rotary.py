"""SCAIL 3D rotary position embeddings, TPU-native.

Replaces the reference's table-slicing Rotary3DPositionEmbeddingMixin
(dit_video_crossattn_sc_xc.py:382-757) and its Triton rotary kernels
(sat/model/position_embedding/triton_rotary*.py).  Instead of materialising
a (T, 150, 270, 128) cos/sin table and slicing it per forward, we compute
exactly the angles each token segment needs; under `jit` with static shapes
XLA constant-folds the tables.

The fused DiT sequence has three token regimes, each with its own rotary
treatment (dit:653-757):
  * ref tokens    -> t = 0 grid ("extended" table, dit:561-596)
  * video tokens  -> t = 1..T, h/w from the latent grid (+ optional
                     sequence-parallel h/w shifts, dit:1576-1585)
  * pose tokens   -> half-resolution: the *cos/sin values* of the full-res
                     grid at a +120 W offset are 2x2 average-pooled
                     (dit:598-645).  Pooling happens after the trig, which
                     we reproduce exactly.

Head-dim split for head_dim=128: dim_t=44, dim_h=dim_w=42 (dit:404-406).
The YAML config uses interleaved_rope=True: per-axis frequencies are
repeated pairwise ((n r), r=2) and rotate_half swaps adjacent pairs
(dit:336-340, :448-459).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class RopeTables(NamedTuple):
    """cos/sin for the fused [ref | video | pose] sequence, shape (S, head_dim)."""

    cos: jnp.ndarray
    sin: jnp.ndarray
    ref_len: int
    video_len: int
    pose_len: int


def rotate_half(x, interleaved: bool = True):
    """(dit:336-345).  interleaved: (x0,x1)->(-x1,x0) per adjacent pair;
    non-interleaved: halves swapped."""
    if interleaved:
        x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
        a, b = x2[..., 0], x2[..., 1]
        return jnp.stack([-b, a], axis=-1).reshape(x.shape)
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def apply_rotary(x, cos, sin, interleaved: bool = True):
    """x: (..., S, D); cos/sin: (S, D) broadcast over leading dims.
    Computed in x.dtype to match the reference (freqs cast .to(t.dtype))."""
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return x * cos + rotate_half(x, interleaved) * sin


def _axis_freqs(dim: int, theta: float) -> np.ndarray:
    """1 / theta^(2i/dim), i = 0..dim/2-1 (dit:414-422).  f32 like torch."""
    return (
        1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim)
    ).astype(np.float32)


def _segment_angles(grid_t, grid_h, grid_w, freqs_t, freqs_h, freqs_w, interleaved):
    """Angle tensor (T, H, W, D): broadcast-concat of per-axis outer products
    with the reference's repeat layout (dit:444-502).

    Built with jnp in float32 (the reference's tables are torch f32): under
    jit XLA computes the tables on device instead of shipping multi-MB host
    constants into the executable.
    """

    def rep(a):  # (..., n) -> (..., n*2)
        if interleaved:
            return jnp.repeat(a, 2, axis=-1)  # (n r): f0,f0,f1,f1,...
        return jnp.concatenate([a, a], axis=-1)  # (r n): f0..fn,f0..fn

    grid_t = jnp.asarray(grid_t, jnp.float32)
    grid_h = jnp.asarray(grid_h, jnp.float32)
    grid_w = jnp.asarray(grid_w, jnp.float32)
    at = rep(jnp.outer(grid_t, freqs_t))  # (T, dt)
    ah = rep(jnp.outer(grid_h, freqs_h))  # (H, dh)
    aw = rep(jnp.outer(grid_w, freqs_w))  # (W, dw)
    T, H, W = len(grid_t), len(grid_h), len(grid_w)
    out = jnp.concatenate(
        [
            jnp.broadcast_to(at[:, None, None, :], (T, H, W, at.shape[-1])),
            jnp.broadcast_to(ah[None, :, None, :], (T, H, W, ah.shape[-1])),
            jnp.broadcast_to(aw[None, None, :, :], (T, H, W, aw.shape[-1])),
        ],
        axis=-1,
    )
    return out


def build_scail_rope(
    head_dim: int,
    rope_T: int,
    rope_H: int,
    rope_W: int,
    *,
    h_shift: int = 0,
    w_shift: int = 0,
    pose_h_offset: int = 0,
    pose_w_offset: int = 120,
    theta: float = 10000.0,
    interleaved: bool = True,
    dtype=jnp.float32,
) -> RopeTables:
    """Build fused-sequence cos/sin for [ref | video | pose] token order.

    rope_T/H/W are post-patch grid sizes (dit:1566-1568); h_shift/w_shift are
    the sequence-parallel per-shard offsets (dit:1576-1585); pose offsets are
    global_rope_H=0 / global_rope_W=120 (dit:1570-1571).
    """
    assert rope_H % 2 == 0 and rope_W % 2 == 0, "pose pooling needs even H/W"
    dim_t = head_dim - 4 * (head_dim // 6)
    dim_h = (head_dim // 6) * 2
    dim_w = dim_h
    ft = _axis_freqs(dim_t, theta)
    fh = _axis_freqs(dim_h, theta)
    fw = _axis_freqs(dim_w, theta)

    grid_h = np.arange(h_shift, h_shift + rope_H, dtype=np.float64)
    grid_w = np.arange(w_shift, w_shift + rope_W, dtype=np.float64)

    # ref: extended grid with t=0 (dit:428-430, :577-596)
    ref_ang = _segment_angles(
        np.zeros((1,)), grid_h, grid_w, ft, fh, fw, interleaved
    ).reshape(-1, head_dim)

    # video: t = 1..T (dit:424, :541-559)
    vid_ang = _segment_angles(
        np.arange(1, rope_T + 1, dtype=np.float64), grid_h, grid_w, ft, fh, fw,
        interleaved,
    ).reshape(-1, head_dim)

    # pose: full-res slice at (+pose_h_offset, +pose_w_offset), cos/sin are
    # avg-pooled 2x2 AFTER the trig (dit:614-641)
    pose_grid_h = np.arange(
        pose_h_offset + h_shift, pose_h_offset + h_shift + rope_H, dtype=np.float64
    )
    pose_grid_w = np.arange(
        pose_w_offset + w_shift, pose_w_offset + w_shift + rope_W, dtype=np.float64
    )
    pose_ang = _segment_angles(
        np.arange(1, rope_T + 1, dtype=np.float64), pose_grid_h, pose_grid_w,
        ft, fh, fw, interleaved,
    )  # (T, H, W, D)

    def pool2x2(v):  # avg_pool2d(kernel=2, stride=2) over (H, W)
        T, H, W, D = v.shape
        return v.reshape(T, H // 2, 2, W // 2, 2, D).mean(axis=(2, 4))

    # trig in float32 matching the torch float32 tables (dit:509-513)
    ref_cos, ref_sin = jnp.cos(ref_ang), jnp.sin(ref_ang)
    vid_cos, vid_sin = jnp.cos(vid_ang), jnp.sin(vid_ang)
    pose_cos = pool2x2(jnp.cos(pose_ang)).reshape(-1, head_dim)
    pose_sin = pool2x2(jnp.sin(pose_ang)).reshape(-1, head_dim)

    cos = jnp.concatenate([ref_cos, vid_cos, pose_cos], axis=0)
    sin = jnp.concatenate([ref_sin, vid_sin, pose_sin], axis=0)
    return RopeTables(
        cos=cos.astype(dtype),
        sin=sin.astype(dtype),
        ref_len=ref_ang.shape[0],
        video_len=vid_ang.shape[0],
        pose_len=pose_cos.shape[0],
    )
