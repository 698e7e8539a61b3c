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

Trainable: the windowed call carries a custom VJP (dq walks the same
block table; dk/dv walk the INVERSE table -- for every kv block, the q
tiles that attend it -- with variable row lengths handled by a
prefetched length vector and a compute guard), so attn_impl='sta'
carries the sparse speedup into finetuning.  Gradients are exact vs
masked-dense autodiff (tests/test_sta.py).
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scail_tpu.ops.attention import (_flash_attention_bnsd, _flash_kernel,
                                     _prescale, _LN2, _LOG2E, _VMEM_LIMIT)


def _pallas_ctx():
    """CPU smoke runs interpret the kernels instead of failing to lower;
    the flag is captured at pallas_call construction, so the context must
    wrap construction."""
    return (pltpu.force_tpu_interpret_mode()
            if jax.devices()[0].platform != "tpu" else contextlib.nullcontext())


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


def _pose_perm(T, Hp, Wp, ref_len, pose_len, tile_t, tile_h):
    """Tile-major permutation of the half-res pose tokens, spatially
    aligned with the video strip tiles: pose tile (it, ih) covers the
    same (t, h) region as video tile (it, ih) at half resolution."""
    hp, wp = Hp // 2, Wp // 2
    assert tile_h % 2 == 0, "windowed-pose STA needs an even tile_h"
    assert Wp % 2 == 0 and (tile_t * tile_h * Wp) % 32 == 0, (
        f"windowed-pose STA needs Wp even and ts % 32 == 0 (the pose q "
        f"tile ts//4 must be 8-row aligned for the TPU kernel), got "
        f"Wp={Wp} tile=({tile_t},{tile_h})")
    assert pose_len == T * hp * wp, (
        f"windowed-pose STA expects the SCAIL half-res pose grid "
        f"T*(Hp/2)*(Wp/2)={T * hp * wp}, got pose_len={pose_len}")
    pt_h = tile_h // 2
    n_t, n_h = T // tile_t, Hp // tile_h
    sv = T * Hp * Wp
    t, h, w = np.meshgrid(np.arange(T), np.arange(hp), np.arange(wp),
                          indexing="ij")
    orig = ref_len + sv + (t * hp + h) * wp + w
    perm = (orig.reshape(n_t, tile_t, n_h, pt_h, wp)
            .transpose(0, 2, 1, 3, 4).reshape(-1))
    return perm.astype(np.int32)


def _window_table(n_t, n_h, win_t, win_h, n_pose_blocks, n_ref_blocks,
                  pose_kv_win_t=0):
    """(n_tiles, n_steps) int32 kv-block table shared by the video and
    (windowed-pose mode) pose query tiles: a clamped (win_t, win_h)
    window of video tiles, then the conditioning blocks.  With
    pose_kv_win_t > 0 the pose region (laid out per t-strip) is itself
    temporally windowed: only the pose blocks of the pose_kv_win_t
    t-strips around the query's strip are visited; ref blocks are
    always all visited and always LAST (they carry the zero pad, which
    the kernel's tail-step mask expects at the end of the walk)."""
    wt, wh = min(win_t, n_t), min(win_h, n_h)
    n_v = n_t * n_h
    bps = n_pose_blocks // n_t if pose_kv_win_t else 0   # blocks per strip
    pw = min(pose_kv_win_t, n_t) if pose_kv_win_t else 0
    rows = []
    for it in range(n_t):
        t0 = min(max(it - wt // 2, 0), n_t - wt)
        p0 = min(max(it - pw // 2, 0), n_t - pw) if pw else 0
        for ih in range(n_h):
            h0 = min(max(ih - wh // 2, 0), n_h - wh)
            row = [(t0 + dt) * n_h + (h0 + dh)
                   for dt in range(wt) for dh in range(wh)]
            if pw:
                row += [n_v + (p0 + dt) * bps + g
                        for dt in range(pw) for g in range(bps)]
            else:
                row += [n_v + g for g in range(n_pose_blocks)]
            row += [n_v + n_pose_blocks + g for g in range(n_ref_blocks)]
            rows.append(row)
    return np.asarray(rows, np.int32)


def _sta_video_fwd(qv, kv_k, kv_v, table, ts, scale, n_pad, ts_q=None,
                   with_lse=False):
    """qv: (B, n_tiles*ts_q, d) tile-major queries; kv_k/kv_v:
    (B, n_blocks*ts, d) = [video tiles | conditioning (zero-padded)].
    ts_q defaults to the kv block size ts (video queries); the windowed
    pose stream passes its own smaller tile.  Output like qv.

    with_lse=True additionally returns the natural-log lse laid out
    dense-flash style as (B, 1, nq*ts_q) fp32 -- the backward pass
    consumes this layout directly; it requires ts_q % 128 == 0 (the
    trainable wrapper pads query tiles up to the lane boundary first).
    The sampling path skips the extra output entirely and takes any
    8-aligned ts_q."""
    B, sq, d = qv.shape
    ts_q = ts if ts_q is None else ts_q
    nq = sq // ts_q
    n_steps = table.shape[1]
    if with_lse:
        # a (1, 1, ts_q) lse block over (B, 1, nq*ts_q) is only lane-legal
        # when ts_q % 128 == 0; callers pre-pad query tiles (see
        # _sta_windowed_vjp_fwd) so no in-kernel unaligned concat is needed
        assert ts_q % 128 == 0, ts_q
    qv = _prescale(qv, scale)

    def _kernel(table_ref, q_ref, k_ref, v_ref, o_ref, *rest):
        # lse lives in scratch: the sampling path never consumes it.  The
        # lse-output variant copies the scratch verbatim into its
        # (1, 1, ts_q) lane-layout block of the (B, 1, nq*ts_q) output on
        # the last kv step -- legal because the trainable wrapper already
        # padded ts_q to the 128-lane boundary.
        if with_lse:
            lseo_ref, lse_ref, acc_ref, m_ref, l_ref = rest
        else:
            lse_ref, acc_ref, m_ref, l_ref = rest
        _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                      acc_ref, m_ref, l_ref, n_pad=n_pad)
        if with_lse:
            @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
            def _copy_lse():
                lseo_ref[0, 0] = lse_ref[0, 0]

    out_specs = pl.BlockSpec((1, ts_q, d), lambda b, qi, ki, tref: (b, qi, 0))
    out_shape = jax.ShapeDtypeStruct(qv.shape, qv.dtype)
    if with_lse:
        # Mosaic requires the last-two block dims be (%8, %128)-aligned or
        # equal to the array dims; a (1, 1, ts_q) block over (B, nq, ts_q)
        # has sublane block 1 vs array nq and is rejected on real TPU
        # (interpret mode never checks).  The dense flash kernel's proven
        # layout instead: lse rides the LANE dim of a (B, 1, nq*ts_q)
        # buffer, blocked (1, 1, ts_q) -- sublane block 1 == array dim 1.
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1, ts_q),
                                  lambda b, qi, ki, tref: (b, 0, qi)))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, 1, nq * ts_q), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nq, n_steps),
        in_specs=[
            pl.BlockSpec((1, ts_q, d), lambda b, qi, ki, tref: (b, qi, 0)),
            pl.BlockSpec((1, ts, d),
                         lambda b, qi, ki, tref: (b, tref[qi, ki], 0)),
            pl.BlockSpec((1, ts, d),
                         lambda b, qi, ki, tref: (b, tref[qi, ki], 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((1, 1, ts_q), jnp.float32),
            pltpu.VMEM((ts_q, d), jnp.float32),
            pltpu.VMEM((ts_q, 128), jnp.float32),
            pltpu.VMEM((ts_q, 128), jnp.float32),
        ],
    )
    with _pallas_ctx():
        call = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
        )
        return call(jnp.asarray(table), qv, kv_k, kv_v)


# --------------------------------------------------------------------------
# Windowed backward (the splash pattern): dq re-walks the forward block
# table; dk/dv walk the inverse table (per kv block, the q tiles that
# attend it).  ROADMAP round-3 item "STA training".
# --------------------------------------------------------------------------
def _inverse_table(table, n_blocks):
    """(nq, n_steps) forward table -> (n_blocks, inv_len) inverse table +
    (n_blocks,) row lengths.  Rows are padded by repeating the last valid
    q-tile index (fetch elided by the pipeline; compute skipped via the
    length guard).  A block attended by nobody gets index 0, length 0."""
    rows = [[] for _ in range(n_blocks)]
    for qi in range(table.shape[0]):
        for j in table[qi]:
            rows[int(j)].append(qi)
    lens = np.asarray([len(r) for r in rows], np.int32)
    inv_len = max(1, int(lens.max()) if len(lens) else 1)
    inv = np.zeros((n_blocks, inv_len), np.int32)
    for j, r in enumerate(rows):
        if r:
            inv[j, : len(r)] = r
            inv[j, len(r):] = r[-1]
    return inv, lens


def _sta_dq_kernel(table_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, acc_ref, *, scale):
    """Windowed dq: same block walk as the forward.  q is pre-scaled by
    scale*log2e and lse is log2-domain, so p = exp2(min(s - lse2, 0)) is
    the exact softmax; zero-padded kv columns contribute ds*k = 0."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0, 0][:, None]     # (ts_q, 1), log2-domain
    delta = delta_ref[0, 0][:, None]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(jnp.minimum(s - lse2, 0.0))
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(k.dtype)
    acc_ref[:] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _fin():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _sta_dkv_kernel(inv_ref, len_ref, q_ref, do_ref, lse_ref, delta_ref,
                    k_ref, v_ref, dk_ref, dv_ref, dk_acc, dv_acc):
    """Windowed dk/dv over the inverse table.  Padded row entries repeat
    the last valid q tile; the length guard skips their compute (their
    DMA is elided by the pipeline since the block index is unchanged)."""
    bi = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(qi < len_ref[bi])
    def _body():
        q = q_ref[0]       # pre-scaled by scale*log2e
        do = do_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        lse2 = lse_ref[0, 0][None, :]     # (1, ts_q), log2-domain
        delta = delta_ref[0, 0][None, :]
        s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        p_t = jnp.exp2(jnp.minimum(s_t - lse2, 0.0))
        dv_acc[:] += jax.lax.dot_general(p_t.astype(do.dtype), do,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ds_t = (p_t * (dp_t - delta)).astype(q.dtype)
        dk_acc[:] += jax.lax.dot_general(ds_t, q, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _fin():
        dk_ref[0] = (dk_acc[:] * _LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _sta_windowed_bwd_impl(q, kp, vp, out, lse, do, table, ts, scale, ts_q):
    """q: (B, nq*ts_q, d) original (unscaled) tile-major queries with
    ts_q % 128 == 0 (the vjp wrapper pads tiles up to the lane boundary);
    kp/vp: (B, n_blocks*ts, d) padded kv; lse: (B, 1, nq*ts_q)
    natural-log in the dense-flash lane layout.  Returns (dq, dkp, dvp)
    with dkp/dvp over the full padded kv (the caller's pad-concat VJP
    drops the tail)."""
    B, sq, d = q.shape
    nq = sq // ts_q
    n_blocks = kp.shape[1] // ts
    n_steps = table.shape[1]
    inv, lens = _inverse_table(table, n_blocks)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta[:, None, :]          # (B, 1, nq*ts_q) like lse
    lse2 = lse * _LOG2E  # log2-domain for the exp2 kernels
    q2 = _prescale(q, scale)

    qspec = pl.BlockSpec((1, ts_q, d), lambda b, qi, ki, tref: (b, qi, 0))
    kspec = pl.BlockSpec((1, ts, d),
                         lambda b, qi, ki, tref: (b, tref[qi, ki], 0))
    lspec = pl.BlockSpec((1, 1, ts_q), lambda b, qi, ki, tref: (b, 0, qi))
    with _pallas_ctx():
        dq = pl.pallas_call(
            functools.partial(_sta_dq_kernel, scale=scale),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, nq, n_steps),
                in_specs=[qspec, kspec, kspec, qspec, lspec, lspec],
                out_specs=qspec,
                scratch_shapes=[pltpu.VMEM((ts_q, d), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
        )(jnp.asarray(table), q2, kp, vp, do, lse2, delta)

    # dk/dv: kv blocks in the grid, inverse-table q walk innermost
    qspec2 = pl.BlockSpec((1, ts_q, d),
                          lambda b, bi, qi, iref, lref: (b, iref[bi, qi], 0))
    lspec2 = pl.BlockSpec((1, 1, ts_q),
                          lambda b, bi, qi, iref, lref: (b, 0, iref[bi, qi]))
    kspec2 = pl.BlockSpec((1, ts, d), lambda b, bi, qi, iref, lref: (b, bi, 0))
    with _pallas_ctx():
        dk, dv = pl.pallas_call(
            _sta_dkv_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, n_blocks, inv.shape[1]),
                in_specs=[qspec2, qspec2, lspec2, lspec2, kspec2, kspec2],
                out_specs=(kspec2, kspec2),
                scratch_shapes=[pltpu.VMEM((ts, d), jnp.float32),
                                pltpu.VMEM((ts, d), jnp.float32)],
            ),
            out_shape=(jax.ShapeDtypeStruct(kp.shape, kp.dtype),
                       jax.ShapeDtypeStruct(vp.shape, vp.dtype)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
        )(jnp.asarray(inv), jnp.asarray(lens), q2, do, lse2, delta, kp, vp)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _sta_windowed(q, kp, vp, table_t, ts, scale, n_pad, ts_q):
    """Differentiable windowed attention: q (B, nq*ts_q, d) tile-major;
    kp/vp (B, n_blocks*ts, d) zero-padded kv; table_t a hashable
    tuple-of-tuples block table (static)."""
    table = np.asarray(table_t, np.int32)
    return _sta_video_fwd(q, kp, vp, table, ts, scale, n_pad, ts_q=ts_q)


def _lane_pad(ts_q):
    """Query-tile row count rounded up to the 128-lane boundary (the lse
    rides the lane dim of a (B, 1, nq*ts_pad) buffer)."""
    return -(-ts_q // 128) * 128


def _pad_tiles(x, nq, ts_q, ts_pad):
    """(B, nq*ts_q, d) -> (B, nq*ts_pad, d): zero-pad every query tile's
    trailing rows.  Zero q rows see uniform softmax (garbage lse/out that
    the caller slices away) and, with do padded the same way, contribute
    exactly zero to dk/dv (ds = p*(dp - delta) with do = 0)."""
    B, _, d = x.shape
    x = x.reshape(B, nq, ts_q, d)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, ts_pad - ts_q), (0, 0)))
    return x.reshape(B, nq * ts_pad, d)


def _unpad_tiles(x, nq, ts_q, ts_pad):
    B, _, d = x.shape
    return x.reshape(B, nq, ts_pad, d)[:, :, :ts_q].reshape(B, nq * ts_q, d)


def _sta_windowed_vjp_fwd(q, kp, vp, table_t, ts, scale, n_pad, ts_q):
    table = np.asarray(table_t, np.int32)
    nq = q.shape[1] // ts_q
    ts_pad = _lane_pad(ts_q)
    qp = q if ts_pad == ts_q else _pad_tiles(q, nq, ts_q, ts_pad)
    out, lse = _sta_video_fwd(qp, kp, vp, table, ts, scale, n_pad,
                              ts_q=ts_pad, with_lse=True)
    if ts_pad != ts_q:
        out = _unpad_tiles(out, nq, ts_q, ts_pad)
    # same names as the dense flash VJP so the save_attn remat policies
    # keep STA state too (models/dit.py remat_policy); lse keeps the
    # padded lane layout -- the backward consumes it directly
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, kp, vp, out, lse)


def _sta_windowed_vjp_bwd(table_t, ts, scale, n_pad, ts_q, res, do):
    q, kp, vp, out, lse = res
    table = np.asarray(table_t, np.int32)
    nq = q.shape[1] // ts_q
    ts_pad = _lane_pad(ts_q)
    if ts_pad != ts_q:
        q = _pad_tiles(q, nq, ts_q, ts_pad)
        out = _pad_tiles(out, nq, ts_q, ts_pad)
        do = _pad_tiles(do, nq, ts_q, ts_pad)
    dq, dkp, dvp = _sta_windowed_bwd_impl(q, kp, vp, out, lse, do, table,
                                          ts, scale, ts_pad)
    if ts_pad != ts_q:
        dq = _unpad_tiles(dq, nq, ts_q, ts_pad)
    return dq, dkp, dvp


_sta_windowed.defvjp(_sta_windowed_vjp_fwd, _sta_windowed_vjp_bwd)


def _dense_rows(qg, kp, vp, scale, pad):
    """Fully dense attention for the conditioning queries over the
    padded kv buffer: the flash kernel on TPU (n_zero_cols cancels the
    explicit zero tail), a plain XLA softmax over the unpadded prefix
    elsewhere (CPU smoke / tests)."""
    if jax.devices()[0].platform == "tpu":
        return _flash_attention_bnsd(qg, kp, vp, scale, 1024, 1024, pad)
    k = kp[:, : kp.shape[1] - pad] if pad else kp
    v = vp[:, : vp.shape[1] - pad] if pad else vp
    logits = jnp.einsum("bqd,bkd->bqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, v)


def sta_order(grid_thw, ref_len, pose_len, tile, windowed_pose=False):
    """Static token order for the tile-major-resident layout and its
    inverse.  windowed_pose=False: [video (tile-major) | ref | pose];
    True: [video (tile-major) | pose (tile-major) | ref].  The DiT
    keeps hidden states in this order for the whole layer stack when
    attn_impl='sta' (one gather per forward instead of several per
    layer); RoPE tables are row-permuted to match."""
    T, Hp, Wp = grid_thw
    perm, glob, _, _ = _strip_layout(T, Hp, Wp, ref_len, pose_len,
                                     tile[0], tile[1])
    if windowed_pose:
        pperm = _pose_perm(T, Hp, Wp, ref_len, pose_len, tile[0], tile[1])
        order = np.concatenate([perm, pperm,
                                np.arange(ref_len, dtype=np.int32)])
    else:
        order = np.concatenate([perm, glob])
    return order, np.argsort(order)


def sta_attention(q, k, v, *, grid_thw: Tuple[int, int, int], ref_len: int,
                  pose_len: int, tile: Tuple[int, int] = (3, 4),
                  window: Tuple[int, int] = (3, 3), scale: float = None,
                  pre_tiled: bool = False, windowed_pose: bool = False,
                  pose_kv_window: int = 0):
    """Sliding-tile self attention over the fused [ref | video | pose]
    sequence.  q/k/v: (b, s, n, d); grid_thw = (T, Hp, Wp) of the video
    part.  With pre_tiled=True, q/k/v are already in sta_order's
    tile-major layout and the output stays in it (no runtime gathers
    beyond the kv pad).  windowed_pose=True additionally restricts the
    half-res POSE queries to the same (t, h) tile window over video
    (pose tile (it, ih) covers the same spatial region).
    pose_kv_window=w (needs windowed_pose and n_h % 4 == 0) further
    restricts attention INTO the pose region to the w t-strips around
    the query's strip for video and pose queries; ref tokens stay
    dense both ways, and ref queries stay fully dense."""
    b, s, n, d = q.shape
    T, Hp, Wp = grid_thw
    sv = T * Hp * Wp
    assert s == ref_len + sv + pose_len
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    perm, glob, n_t, n_h = _strip_layout(T, Hp, Wp, ref_len, pose_len,
                                         tile[0], tile[1])
    ts = tile[0] * tile[1] * Wp
    if windowed_pose and pose_kv_window and n_h % 4 != 0:
        # visible at trace time: the pose region only tiles into uniform
        # ts-blocks per t-strip when n_h % 4 == 0
        print(f"[sta] pose_kv_window={pose_kv_window} ignored: needs "
              f"n_h % 4 == 0 (Hp/tile_h = {n_h}); pose kv stays dense")
    if windowed_pose and pose_kv_window and n_h % 4 == 0:
        # pose region is exactly n_t * (n_h/4) blocks of ts; only the
        # ref tail carries zero pad, which every table row visits
        n_pb = pose_len // ts
        pad = (-ref_len) % ts
        n_rb = (ref_len + pad) // ts
        table = _window_table(n_t, n_h, window[0], window[1], n_pb, n_rb,
                              pose_kv_window)
    else:
        s_glob = ref_len + pose_len
        pad = (-s_glob) % ts
        table = _window_table(n_t, n_h, window[0], window[1], 0,
                              (s_glob + pad) // ts, 0)
    order, _ = sta_order(grid_thw, ref_len, pose_len, tile,
                         windowed_pose=windowed_pose)

    def flat(t):  # (b, s, n, d) -> (B, s, d)
        return t.transpose(0, 2, 1, 3).reshape(b * n, t.shape[1], d)

    qf, kf, vf = flat(q), flat(k), flat(v)
    if pre_tiled:
        qt, kt, vt = qf, kf, vf
    else:
        order_j = jnp.asarray(order)
        qt, kt, vt = qf[:, order_j], kf[:, order_j], vf[:, order_j]

    def kv_buf(t):
        if not pad:
            return t
        return jnp.concatenate(
            [t, jnp.zeros((b * n, pad, d), t.dtype)], axis=1)

    kp, vp = kv_buf(kt), kv_buf(vt)
    table_t = tuple(map(tuple, table.tolist()))
    out_v = _sta_windowed(qt[:, :sv], kp, vp, table_t, ts, scale, pad, ts)
    # the dense conditioning queries consume the SAME padded kv buffers
    # (n_zero_cols extends the kernel's tail mask over the explicit zero
    # tail) so kt/vt die right after the pad concat -- at 14B the
    # duplicate kv lifetimes were the difference between fitting one
    # chip and OOM
    if windowed_pose:
        out_p = _sta_windowed(qt[:, sv:sv + pose_len], kp, vp, table_t,
                              ts, scale, pad, ts // 4)
        # ref queries stay dense over the whole kv (softmax is
        # order-invariant, so the tile-major kv is fine)
        out_g = _dense_rows(qt[:, sv + pose_len:], kp, vp, scale, pad)
        out = jnp.concatenate([out_v, out_p, out_g], axis=1)
    else:
        out_g = _dense_rows(qt[:, sv:], kp, vp, scale, pad)
        out = jnp.concatenate([out_v, out_g], axis=1)
    if not pre_tiled:
        out = out[:, jnp.asarray(np.argsort(order))]
    return out.reshape(b, n, s, d).transpose(0, 2, 1, 3)


def sta_executed_pairs(grid_thw, ref_len, pose_len, tile, window,
                       windowed_pose=False, pose_kv_window=0):
    """Executed (q, kv) dot pairs of sta_attention at this geometry --
    the honest FLOP count for the sparse step (BENCH executed_tflops).
    Counts every kv block a table row visits, including the zero-padded
    ref tail the kernel actually processes.  Divide by s**2
    (s = ref_len + T*Hp*Wp + pose_len) for the executed-over-dense
    attention fraction."""
    T, Hp, Wp = grid_thw
    sv = T * Hp * Wp
    n_t, n_h = T // tile[0], Hp // tile[1]
    ts = tile[0] * tile[1] * Wp
    if windowed_pose and pose_kv_window and n_h % 4 == 0:
        n_pb = pose_len // ts
        pad = (-ref_len) % ts
        n_rb = (ref_len + pad) // ts
        table = _window_table(n_t, n_h, window[0], window[1], n_pb, n_rb,
                              pose_kv_window)
    else:
        s_glob = ref_len + pose_len
        pad = (-s_glob) % ts
        table = _window_table(n_t, n_h, window[0], window[1], 0,
                              (s_glob + pad) // ts, 0)
    row_kv = table.shape[1] * ts            # kv tokens per table row
    pairs = table.shape[0] * ts * row_kv    # video q tiles
    s_pad_total = ref_len + sv + pose_len + pad
    if windowed_pose:
        pairs += table.shape[0] * (ts // 4) * row_kv  # pose q tiles, same table
        pairs += ref_len * s_pad_total                # dense ref rows
    else:
        pairs += (ref_len + pose_len) * s_pad_total   # dense cond rows
    return int(pairs)


def sta_block_mask(s, grid_thw, ref_len, pose_len, tile, window,
                   windowed_pose=False, pose_kv_window=0):
    """Dense (s, s) boolean mask equivalent to sta_attention's sparsity
    (True = attended) -- the test oracle and the documentation of the
    exact semantics."""
    T, Hp, Wp = grid_thw
    perm, glob, n_t, n_h = _strip_layout(T, Hp, Wp, ref_len, pose_len,
                                         tile[0], tile[1])
    ts = tile[0] * tile[1] * Wp
    sv = T * Hp * Wp
    mask = np.zeros((s, s), bool)
    mask[glob[:, None], np.arange(s)[None]] = True   # cond q: dense
    mask[:, glob] = True                             # everyone sees cond
    wt, wh = min(window[0], n_t), min(window[1], n_h)
    tiles = perm.reshape(n_t * n_h, ts)
    pose_strips = None
    if windowed_pose:
        ptiles = _pose_perm(T, Hp, Wp, ref_len, pose_len,
                            tile[0], tile[1]).reshape(n_t * n_h, ts // 4)
        pose_idx = np.arange(ref_len + sv, s)
        vid_idx = perm.reshape(-1)
        # pose queries lose dense video access; keep only their window
        mask[np.ix_(pose_idx, vid_idx)] = False
        if pose_kv_window and n_h % 4 == 0:
            # video+pose queries lose dense pose access too
            pose_strips = ptiles.reshape(n_t, n_h * ts // 4)
            vp_idx = np.concatenate([vid_idx, pose_idx])
            mask[np.ix_(vp_idx, pose_idx)] = False
    pw = min(pose_kv_window, n_t) if pose_strips is not None else 0
    for it in range(n_t):
        t0 = min(max(it - wt // 2, 0), n_t - wt)
        p0 = min(max(it - pw // 2, 0), n_t - pw) if pw else 0
        for ih in range(n_h):
            h0 = min(max(ih - wh // 2, 0), n_h - wh)
            qsets = [tiles[it * n_h + ih]]
            if windowed_pose:
                qsets.append(ptiles[it * n_h + ih])
            for qs in qsets:
                for dt in range(wt):
                    for dh in range(wh):
                        kj = tiles[(t0 + dt) * n_h + (h0 + dh)]
                        mask[qs[:, None], kj[None, :]] = True
                if pw:
                    for dt in range(pw):
                        kj = pose_strips[p0 + dt]
                        mask[qs[:, None], kj[None, :]] = True
    return mask
