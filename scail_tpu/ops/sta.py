"""Sliding-tile attention (STA) for the video DiT -- an opt-in sparse
"turbo" sampling mode (ROADMAP; Fast Video Generation with Sliding Tile
Attention, arXiv:2502.04507).

The SCAIL self-attention sequence is [ref | video (t, h, w raster) |
pose] (models/dit.py:383-394), attended densely in the reference
(SURVEY section 3.1).  STA exploits the 3D locality of video tokens:

  * video tokens are regrouped into STRIP TILES of (tile_t, tile_h,
    Wp) -- a tile spans the full latent width, so every tile is one
    contiguous kv block of uniform size and the sliding window in
    (t, h) is exactly block-dense: a (q-tile, k-tile) pair is either
    fully attended or fully skipped, which is what the MXU wants (the
    paper's central observation, section 3)
  * each video q tile attends a clamped (win_t, win_h) window of tiles
    (shifted at the borders so every tile sees the same tile count)
    PLUS the whole ref+pose stream (conditioning stays exact)
  * ref+pose queries stay fully dense over the whole sequence

Same-softmax semantics as masked dense attention with the equivalent
block mask (tested in tests/test_sta.py); the kernel is the existing
log2-domain online-softmax flash kernel (ops/attention.py:_flash_kernel)
driven by a scalar-prefetched kv-block table, one table row per q tile
(the splash-attention indexing pattern).

Inference-only: sampling never differentiates through attention; train
with the dense kernels.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scail_tpu.ops.attention import (_flash_attention_bnsd, _flash_kernel,
                                     _prescale, _VMEM_LIMIT)


def _strip_layout(T, Hp, Wp, ref_len, pose_len, tile_t, tile_h):
    """Static index plan: permutation of video tokens to tile-major
    order and the original positions of the global (ref+pose) tokens."""
    assert T % tile_t == 0 and Hp % tile_h == 0, (
        f"STA strip tiles ({tile_t},{tile_h}) must divide (T={T}, Hp={Hp})")
    sv = T * Hp * Wp
    n_t, n_h = T // tile_t, Hp // tile_h
    t, h, w = np.meshgrid(np.arange(T), np.arange(Hp), np.arange(Wp),
                          indexing="ij")
    orig = ref_len + (t * Hp + h) * Wp + w               # (T, Hp, Wp)
    # tile-major: (it, ih) tiles raster, within-tile (t, h, w) raster
    perm = (orig.reshape(n_t, tile_t, n_h, tile_h, Wp)
            .transpose(0, 2, 1, 3, 4).reshape(-1))
    s_total = ref_len + sv + pose_len
    glob = np.concatenate([np.arange(ref_len),
                           np.arange(ref_len + sv, s_total)])
    return perm.astype(np.int32), glob.astype(np.int32), n_t, n_h


def _window_table(n_t, n_h, win_t, win_h, n_global_blocks):
    """(n_tiles, n_steps) int32 kv-block table: clamped (win_t, win_h)
    window of video tiles, then the global blocks (appended after the
    video tiles in the kv buffer)."""
    wt, wh = min(win_t, n_t), min(win_h, n_h)
    rows = []
    for it in range(n_t):
        t0 = min(max(it - wt // 2, 0), n_t - wt)
        for ih in range(n_h):
            h0 = min(max(ih - wh // 2, 0), n_h - wh)
            row = [(t0 + dt) * n_h + (h0 + dh)
                   for dt in range(wt) for dh in range(wh)]
            row += [n_t * n_h + g for g in range(n_global_blocks)]
            rows.append(row)
    return np.asarray(rows, np.int32)


def _sta_video_fwd(qv, kv_k, kv_v, table, ts, scale, n_pad):
    """qv: (B, n_tiles*ts, d) tile-major video queries; kv_k/kv_v:
    (B, n_blocks*ts, d) = [video tiles | ref+pose (zero-padded)].
    Output (B, n_tiles*ts, d)."""
    B, sq, d = qv.shape
    nq = sq // ts
    n_steps = table.shape[1]
    qv = _prescale(qv, scale)

    def _kernel(table_ref, q_ref, k_ref, v_ref, o_ref,
                lse_ref, acc_ref, m_ref, l_ref):
        # lse lives in scratch: sampling never consumes it, and a real
        # (1, 1, ts) output block would violate the TPU 128-lane rule
        # for ts that is only 8-aligned
        _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                      acc_ref, m_ref, l_ref, n_pad=n_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nq, n_steps),
        in_specs=[
            pl.BlockSpec((1, ts, d), lambda b, qi, ki, tref: (b, qi, 0)),
            pl.BlockSpec((1, ts, d),
                         lambda b, qi, ki, tref: (b, tref[qi, ki], 0)),
            pl.BlockSpec((1, ts, d),
                         lambda b, qi, ki, tref: (b, tref[qi, ki], 0)),
        ],
        out_specs=pl.BlockSpec((1, ts, d), lambda b, qi, ki, tref: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, 1, ts), jnp.float32),
            pltpu.VMEM((ts, d), jnp.float32),
            pltpu.VMEM((ts, 128), jnp.float32),
            pltpu.VMEM((ts, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qv.shape, qv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(jnp.asarray(table), qv, kv_k, kv_v)
    return out


def sta_order(grid_thw, ref_len, pose_len, tile):
    """Static token order for the tile-major-resident layout
    [video (tile-major) | ref | pose] and its inverse.  The DiT keeps
    hidden states in this order for the whole layer stack when
    attn_impl='sta' (one gather per forward instead of several per
    layer); RoPE tables are row-permuted to match."""
    T, Hp, Wp = grid_thw
    perm, glob, _, _ = _strip_layout(T, Hp, Wp, ref_len, pose_len,
                                     tile[0], tile[1])
    order = np.concatenate([perm, glob])
    return order, np.argsort(order)


def sta_attention(q, k, v, *, grid_thw: Tuple[int, int, int], ref_len: int,
                  pose_len: int, tile: Tuple[int, int] = (3, 4),
                  window: Tuple[int, int] = (3, 3), scale: float = None,
                  pre_tiled: bool = False):
    """Sliding-tile self attention over the fused [ref | video | pose]
    sequence.  q/k/v: (b, s, n, d); grid_thw = (T, Hp, Wp) of the video
    part.  With pre_tiled=True, q/k/v are already in sta_order's
    tile-major layout and the output stays in it (no runtime gathers
    beyond the kv pad)."""
    b, s, n, d = q.shape
    T, Hp, Wp = grid_thw
    sv = T * Hp * Wp
    assert s == ref_len + sv + pose_len
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    perm, glob, n_t, n_h = _strip_layout(T, Hp, Wp, ref_len, pose_len,
                                         tile[0], tile[1])
    ts = tile[0] * tile[1] * Wp
    s_glob = glob.size
    pad = (-s_glob) % ts
    n_gb = (s_glob + pad) // ts
    table = _window_table(n_t, n_h, window[0], window[1], n_gb)

    def flat(t):  # (b, s, n, d) -> (B, s, d)
        return t.transpose(0, 2, 1, 3).reshape(b * n, t.shape[1], d)

    qf, kf, vf = flat(q), flat(k), flat(v)
    if pre_tiled:
        qv_f, qg_f = qf[:, :sv], qf[:, sv:]
        kt, vt = kf, vf
    else:
        perm_j, glob_j = jnp.asarray(perm), jnp.asarray(glob)
        qv_f, qg_f = qf[:, perm_j], qf[:, glob_j]
        kt = jnp.concatenate([kf[:, perm_j], kf[:, glob_j]], axis=1)
        vt = jnp.concatenate([vf[:, perm_j], vf[:, glob_j]], axis=1)

    def kv_buf(t):
        if not pad:
            return t
        return jnp.concatenate(
            [t, jnp.zeros((b * n, pad, d), t.dtype)], axis=1)

    out_v = _sta_video_fwd(qv_f, kv_buf(kt), kv_buf(vt),
                           table, ts, scale, pad)
    # ref+pose queries stay dense over the whole kv (softmax is
    # order-invariant, so the tile-major kv is fine)
    out_g = _flash_attention_bnsd(qg_f, kt, vt, scale)

    out = jnp.concatenate([out_v, out_g], axis=1)
    if not pre_tiled:
        inv = jnp.asarray(np.argsort(np.concatenate([perm, glob])))
        out = out[:, inv]
    return out.reshape(b, n, s, d).transpose(0, 2, 1, 3)


def sta_block_mask(s, grid_thw, ref_len, pose_len, tile, window):
    """Dense (s, s) boolean mask equivalent to sta_attention's sparsity
    (True = attended) -- the test oracle and the documentation of the
    exact semantics."""
    T, Hp, Wp = grid_thw
    perm, glob, n_t, n_h = _strip_layout(T, Hp, Wp, ref_len, pose_len,
                                         tile[0], tile[1])
    ts = tile[0] * tile[1] * Wp
    mask = np.zeros((s, s), bool)
    mask[glob[:, None], np.arange(s)[None]] = True   # global q: dense
    mask[:, glob] = True                             # everyone sees global
    wt, wh = min(window[0], n_t), min(window[1], n_h)
    tiles = perm.reshape(n_t * n_h, ts)
    for it in range(n_t):
        t0 = min(max(it - wt // 2, 0), n_t - wt)
        for ih in range(n_h):
            h0 = min(max(ih - wh // 2, 0), n_h - wh)
            qi = tiles[it * n_h + ih]
            for dt in range(wt):
                for dh in range(wh):
                    kj = tiles[(t0 + dt) * n_h + (h0 + dh)]
                    mask[qi[:, None], kj[None, :]] = True
    return mask
