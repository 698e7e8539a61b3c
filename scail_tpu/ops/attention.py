"""Attention ops: XLA reference path, chunked memory-efficient path, and a
Pallas TPU flash-attention kernel.

TPU-native replacement for the reference's SDPA/xformers stack
(sat/transformer_defaults.py:47-80, sat/ops/memory_efficient_attention.py).
The SCAIL workload is full (unmasked) bidirectional attention over a 48,832
token fused sequence (SURVEY.md section 3.1), so the kernel implements
online-softmax flash attention without masking support beyond kv-length
padding.  Cross-attention reuses the same kernel with short KV.

Canonical layout at the model level: (batch, seq, heads, head_dim).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)
# the image's libtpu scopes kernel VMEM to 16MB by default; the flash blocks
# below need more (s/p intermediate is block_q*block_k f32)
_VMEM_LIMIT = 100 * 1024 * 1024


# --------------------------------------------------------------------------
# Reference (naive XLA) path -- used by tests and small shapes.
# --------------------------------------------------------------------------
def _attention_xla(q, k, v, scale):
    # (b, s, n, d) -> logits f32, softmax f32, out input-dtype; matches the
    # numerics contract of torch SDPA closely enough for parity tolerances.
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs.astype(v.dtype), v)
    return out


# --------------------------------------------------------------------------
# Chunked (memory-efficient) XLA path -- differentiable everywhere, used for
# training until the Pallas VJP lands and as the CPU fallback at scale.
# --------------------------------------------------------------------------
def _attention_chunked(q, k, v, scale, block_q: int = 512):
    b, sq, n, d = q.shape
    pad = (-sq) % block_q
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else q
    nq = qp.shape[1] // block_q
    qb = qp.reshape(b, nq, block_q, n, d).transpose(1, 0, 2, 3, 4)

    def step(_, q_blk):
        o = _attention_xla(q_blk, k, v, scale)
        return None, o

    _, ob = jax.lax.scan(step, None, qb)
    out = ob.transpose(1, 0, 2, 3, 4).reshape(b, nq * block_q, n, d)
    return out[:, :sq]


# --------------------------------------------------------------------------
# Pallas TPU flash attention (forward + custom VJP backward).
# --------------------------------------------------------------------------
def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                  *, n_pad, softmax_dtype=jnp.float32):
    """Online softmax in the log2 domain.

    The caller folds `scale * log2(e)` into q, so the hot loop is both
    multiply-free (exp2 instead of scale+exp) and mask-free on INTERIOR
    blocks: kv padding is zero-padded and guaranteed to sit at the tail
    of the LAST grid step(s), so only those steps pay an iota mask (one
    where per pad block); every other block runs the branch-free body.
    This keeps the per-element VPU work of the softmax minimal (which is
    what bounds this kernel on v5e -- the MXU runs at <70% with a
    fully-masked variant) while staying exact even in degenerate rows
    where every real logit is far below 0 (the former finalize
    correction `l - n_pad*exp2(-m)` cancelled catastrophically there --
    ADVICE r2).
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    bk = k_ref.shape[-2]

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (bq, d), pre-scaled by scale*log2e
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]  # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk), log2-domain logits

    def _body(s):
        m_prev = m_ref[:, :1]  # (bq, 1)
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        # the exp2 over the (bq, bk) tile is the kernel's VPU bottleneck
        # (see ROADMAP "dense ceiling"); softmax_dtype=bf16 was MEASURED
        # SLOWER on v5e (123.3 vs 127.1 TF/s fwd, same-session A/B via
        # scripts/bench_attention.py --softmax-bf16): the extra f32->bf16
        # casts around the MXU-produced scores outweigh the doubled lane
        # rate.  Keep f32; the knob stays for other chip generations.
        p = jnp.exp2((s - m_next).astype(softmax_dtype))
        l_next = alpha * l_prev + jnp.sum(
            p, axis=-1, keepdims=True, dtype=jnp.float32)

        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_next, l_ref.shape)

    if n_pad:
        # pad occupies the global tail [skv_real, nk*bk); only steps at or
        # past first_pad see any of it
        skv_real = nk * bk - n_pad
        first_pad = skv_real // bk

        @pl.when(ki < first_pad)
        def _interior():
            _body(s)

        @pl.when(ki >= first_pad)
        def _tail():
            col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            _body(jnp.where(col < skv_real, s, _NEG_INF))
    else:
        _body(s)

    @pl.when(ki == nk - 1)
    def _finalize():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        # natural-log lse for the backward pass / residuals
        lse_ref[0, 0] = _LN2 * m[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-30))


def _prescale(q, scale):
    """Fold scale and the exp->exp2 conversion into q (f32 mult, cast back)."""
    return (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)


# --------------------------------------------------------------------------
# Fused rotary: the DiT applies 3D RoPE to q/k right before self-attention
# (ops/rotary.py; reference dit:668-746 + triton_rotary kernels).  Applying
# it inside the flash kernel removes the q/k HBM round-trip between the
# rotary elementwise pass and the attention custom call (the Pallas call
# boundary forces materialization, and the qk RMS-norm reduction usually
# breaks XLA's epilogue fusion anyway).  rotate_half is lane arithmetic:
# interleaved (x0,x1)->(-x1,x0) is two lane rolls + a parity select;
# non-interleaved halves-swap is one roll + a sign select.  Rotation is
# linear, so it commutes with the scale*log2e prescale.
# --------------------------------------------------------------------------
def _kernel_rotate_half(x, interleaved):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if interleaved:
        # pltpu.roll only takes non-negative shifts; d-1 == -1 (mod d)
        left = pltpu.roll(x, x.shape[-1] - 1, axis=x.ndim - 1)  # y[j] = x[j+1]
        right = pltpu.roll(x, 1, axis=x.ndim - 1)               # y[j] = x[j-1]
        return jnp.where(lane % 2 == 0, -left, right)
    half = x.shape[-1] // 2
    r = pltpu.roll(x, half, axis=x.ndim - 1)
    return jnp.where(lane < half, -r, r)


def _kernel_rope(x, cos, sin, interleaved):
    """Forward rotary on a (block, d) tile.  Computed in f32: Mosaic's
    lane rotate only supports 32-bit data ("Rotate with non-32-bit
    data"), and the f32 trig products round once instead of twice —
    strictly tighter than the unfused bf16 apply_rotary."""
    xf = x.astype(jnp.float32)
    return (xf * cos + _kernel_rotate_half(xf, interleaved) * sin).astype(x.dtype)


def _flash_fwd(q, k, v, scale, block_q, block_k, n_zero_cols=0,
               softmax_dtype=jnp.float32):
    """q: (B, sq, d); k/v: (B, skv, d) with B = batch*heads collapsed.
    Returns (out (B, sq, d), lse (B, sq) fp32).  n_zero_cols: count of
    EXPLICIT zero kv columns already at the tail of k/v (callers that
    pass pre-padded buffers, e.g. the STA conditioning tail) -- they
    extend the internal block padding, so the kernel's tail-step mask
    covers both."""
    B, sq, d = q.shape
    skv = k.shape[1]
    q = _prescale(q, scale)
    pq = (-sq) % block_q
    pk = (-skv) % block_k
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))
    nq = q.shape[1] // block_q
    nk = k.shape[1] // block_k

    kernel = functools.partial(_flash_kernel, n_pad=pk + n_zero_cols,
                               softmax_dtype=softmax_dtype)
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((q.shape[0], 1, q.shape[1]), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * q.shape[1] * k.shape[1] * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=B * q.shape[1] * k.shape[1],
        ),
    )(q, k, v)
    return out[:, :sq], lse[:, 0, :sq]


def _flash_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                     acc_ref, *, scale):
    """dq pass.  q is pre-scaled by scale*log2e and lse is in the log2
    domain, so p = exp2(min(s - lse2, 0)) is the exact softmax (the clamp
    only affects zero-padded kv columns, whose k=0 kills their dq
    contribution anyway, while preventing exp overflow).  The softmax
    scale on ds is folded into the dq write at finalize."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]       # pre-scaled by scale*log2e
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0, 0][:, None]     # (bq, 1), log2-domain
    delta = delta_ref[0, 0][:, None]  # (bq, 1)

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


def _flash_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dk_ref, dv_ref, dk_acc, dv_acc):
    """dk/dv pass.  Padded q rows carry lse2=0, delta=0, do=0, so they
    contribute p_t*(0-0)=0 to dk and p_t^T*0=0 to dv -- no mask needed.
    dk accumulates against the pre-scaled q (q2 = scale*log2e * q), so the
    finalize multiplier is ln2 (= scale / (scale*log2e))."""
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]       # pre-scaled by scale*log2e
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0, 0][None, :]     # (1, bq), log2-domain
    delta = delta_ref[0, 0][None, :]

    s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (bk, bq)
    p_t = jnp.exp2(jnp.minimum(s_t - lse2, 0.0))

    dv_acc[:] += jax.lax.dot_general(p_t.astype(do.dtype), do,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (bk, bq)
    ds_t = (p_t * (dp_t - delta)).astype(q.dtype)
    dk_acc[:] += jax.lax.dot_general(ds_t, q, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _fin():
        dk_ref[0] = (dk_acc[:] * _LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, scale, block_q, block_k,
               dq_blocks=None, dkv_blocks=None):
    """dq + dk/dv passes.  The two kernels iterate the grid in opposite
    nesting (dq: q outer / kv inner; dkv: kv outer / q inner), so their
    optimal tile shapes differ — dq_blocks/dkv_blocks override (bq, bk)
    per kernel (scripts/bench_flash_bwd.py sweeps them; power-of-two
    sizes only, so one shared padding to the max of each dim serves
    both)."""
    bq_dq, bk_dq = dq_blocks or (block_q, block_k)
    bq_kv, bk_kv = dkv_blocks or (block_q, block_k)
    pad_q = max(bq_dq, bq_kv)
    pad_k = max(bk_dq, bk_kv)
    assert pad_q % bq_dq == 0 == pad_q % bq_kv, (bq_dq, bq_kv)
    assert pad_k % bk_dq == 0 == pad_k % bk_kv, (bk_dq, bk_kv)

    B, sq, d = q.shape
    skv = k.shape[1]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # (B, sq)
    q = _prescale(q, scale)
    lse = lse * _LOG2E  # log2-domain for the exp2 kernels

    pq = (-sq) % pad_q
    pk = (-skv) % pad_k
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, pq), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, pq)))
        delta = jnp.pad(delta, ((0, 0), (0, pq)))
    lse = lse[:, None, :]
    delta = delta[:, None, :]
    if pk:
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))

    qspec = pl.BlockSpec((1, bq_dq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    q1spec = pl.BlockSpec((1, 1, bq_dq), lambda b, i, j: (b, 0, i),
                          memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk_dq, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale),
        grid=(B, q.shape[1] // bq_dq, k.shape[1] // bk_dq),
        in_specs=[qspec, kspec, kspec, qspec, q1spec, q1spec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq_dq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(q, k, v, do, lse, delta)

    # dk/dv: kv blocks in the second grid dim, q innermost
    qspec2 = pl.BlockSpec((1, bq_kv, d), lambda b, j, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    q1spec2 = pl.BlockSpec((1, 1, bq_kv), lambda b, j, i: (b, 0, i),
                           memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, bk_kv, d), lambda b, j, i: (b, j, 0),
                          memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        _flash_dkv_kernel,
        grid=(B, k.shape[1] // bk_kv, q.shape[1] // bq_kv),
        in_specs=[qspec2, kspec2, kspec2, qspec2, q1spec2, q1spec2],
        out_specs=(kspec2, kspec2),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        scratch_shapes=[pltpu.VMEM((bk_kv, d), jnp.float32),
                        pltpu.VMEM((bk_kv, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(q, k, v, do, lse, delta)

    return dq[:, :sq], dk[:, :skv], dv[:, :skv]


def _flash_rope_q_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref,
                         o_ref, lse_ref, qr_ref, acc_ref, m_ref, l_ref,
                         *, n_pad, interleaved):
    """_flash_kernel with the rotary applied to the q tile in VMEM.

    Q-SIDE ONLY, by measurement: the q tables' BlockSpec rides the qi
    grid axis, so they are fetched once per q block (~nothing); k-side
    tables would ride the INNERMOST ki axis and re-stream per grid step,
    tripling the per-step DMA (3MB vs 1MB) and tipping the kernel from
    MXU- to DMA-bound -- measured 8.74 s/step (66.1% MFU) vs 7.84
    (73.7%) on the 512p workload.  So k arrives pre-roped from a plain
    XLA pass (which its producer was paying anyway) and only the q-side
    rotary pass is fused away.  Identical online-softmax body."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    bk = k_ref.shape[-2]

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        # rope the q tile ONCE per q block into scratch: recomputing it
        # per inner kv step would multiply its VPU cost by nk (~24 at the
        # 512p geometry) on a kernel whose softmax already loads the VPU
        qr_ref[:] = _kernel_rope(q_ref[0], cq_ref[:], sq_ref[:], interleaved)

    q = qr_ref[:]
    k = k_ref[0]  # pre-roped outside
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def _body(s):
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_next, l_ref.shape)

    if n_pad:
        skv_real = nk * bk - n_pad
        first_pad = skv_real // bk

        @pl.when(ki < first_pad)
        def _interior():
            _body(s)

        @pl.when(ki >= first_pad)
        def _tail():
            col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            _body(jnp.where(col < skv_real, s, _NEG_INF))
    else:
        _body(s)

    @pl.when(ki == nk - 1)
    def _finalize():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = _LN2 * m[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-30))


def _pad_rope_tables(cos, sin, length, dtype=jnp.float32):
    """Cast to f32 (the in-kernel rope compute dtype) and zero-pad to
    `length` rows (padded q/k rows are discarded / zero, so the table pad
    value is irrelevant)."""
    p = length - cos.shape[0]
    cos = cos.astype(dtype)
    sin = sin.astype(dtype)
    if p:
        cos = jnp.pad(cos, ((0, p), (0, 0)))
        sin = jnp.pad(sin, ((0, p), (0, 0)))
    return cos, sin


def _flash_rope_fwd(q, k_roped, v, cos, sin, scale, interleaved,
                    block_q, block_k):
    """Self-attention forward with the q-side rotary fused into the flash
    kernel; k_roped already carries its rotation (B = batch*heads
    collapsed; the q tables broadcast over heads via a BlockSpec that
    ignores the batch grid axis)."""
    B, sq, d = q.shape
    skv = k_roped.shape[1]
    q = _prescale(q, scale)
    pq = (-sq) % block_q
    pk = (-skv) % block_k
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
    if pk:
        k_roped = jnp.pad(k_roped, ((0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))
    cq, sq_t = _pad_rope_tables(cos, sin, q.shape[1])
    nq = q.shape[1] // block_q
    nk = k_roped.shape[1] // block_k

    qtab = pl.BlockSpec((block_q, d), lambda b, qi, ki: (qi, 0),
                        memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_flash_rope_q_kernel, n_pad=pk,
                          interleaved=interleaved),
        grid=(B, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            qtab, qtab,
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((q.shape[0], 1, q.shape[1]), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), q.dtype),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * q.shape[1] * k_roped.shape[1] * d,
            bytes_accessed=(q.size + k_roped.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=B * q.shape[1] * k_roped.shape[1],
        ),
    )(q, k_roped, v, cq, sq_t)
    return out[:, :sq], lse[:, 0, :sq]


def _rope_bnsd(x, cos, sin, interleaved):
    """XLA rotary on the collapsed (B, s, d) layout."""
    from scail_tpu.ops.rotary import apply_rotary

    return apply_rotary(x, cos, sin, interleaved)


def _rope_t_bnsd(g, cos, sin, interleaved):
    """XLA transpose rotary.  J = C + R S with R the (antisymmetric)
    rotate_half map, so J^T = C - R S: multiply by sin FIRST, then
    rotate.  (The tempting C - S R form only equals this when diag(sin)
    commutes with R — true for the interleaved pair-repeat layout, false
    for the non-interleaved 3-axis concat, whose halves-swap straddles
    axis boundaries.)"""
    from scail_tpu.ops.rotary import rotate_half

    cos = cos.astype(g.dtype)
    sin = sin.astype(g.dtype)
    return g * cos - rotate_half(g * sin, interleaved)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_attention_rope_bnsd(q, k, v, cos, sin, scale, interleaved,
                               block_q=1024, block_k=2048):
    k_roped = _rope_bnsd(k, cos, sin, interleaved)
    out, _ = _flash_rope_fwd(q, k_roped, v, cos, sin, scale, interleaved,
                             block_q, block_k)
    return out


def _flash_rope_vjp_fwd(q, k, v, cos, sin, scale, interleaved,
                        block_q, block_k):
    from jax.ad_checkpoint import checkpoint_name

    k_roped = _rope_bnsd(k, cos, sin, interleaved)
    out, lse = _flash_rope_fwd(q, k_roped, v, cos, sin, scale, interleaved,
                               block_q, block_k)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k_roped, v, cos, sin, out, lse)


def _flash_rope_vjp_bwd(scale, interleaved, block_q, block_k, res, do):
    # the backward streams q S-times anyway, so the roped q is computed
    # once in XLA here (same as the unfused path's residual); the exact
    # bf16 kernels run unchanged and the q/k cotangents are pulled back
    # through the transpose rotation in XLA (cheap elementwise).
    q, k_roped, v, cos, sin, o, lse = res
    q_roped = _rope_bnsd(q, cos, sin, interleaved)
    dq_b, dkv_b = _tuned_bwd_blocks(q.shape[1], k_roped.shape[1])
    dq_r, dk_r, dv = _flash_bwd(q_roped, k_roped, v, o, lse, do, scale,
                                block_q, block_k, dq_b, dkv_b)
    dq = _rope_t_bnsd(dq_r, cos, sin, interleaved)
    dk = _rope_t_bnsd(dk_r, cos, sin, interleaved)
    # the tables are position constants, never trained
    return dq, dk, dv, jnp.zeros_like(cos), jnp.zeros_like(sin)


_flash_attention_rope_bnsd.defvjp(_flash_rope_vjp_fwd, _flash_rope_vjp_bwd)


def _attention_pallas_rope(q, k, v, cos, sin, scale, interleaved,
                           block_q=1024, block_k=2048):
    b, sq, n, d = q.shape
    skv = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * n, skv, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * n, skv, d)
    ot = _flash_attention_rope_bnsd(qt, kt, vt, cos, sin, scale, interleaved,
                                    block_q, block_k)
    return ot.reshape(b, n, sq, d).transpose(0, 2, 1, 3)



@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_bnsd(q, k, v, scale, block_q=1024, block_k=1024,
                          n_zero_cols=0):
    out, _ = _flash_fwd(q, k, v, scale, block_q, block_k, n_zero_cols)
    return out


def _flash_vjp_fwd(q, k, v, scale, block_q, block_k, n_zero_cols=0):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _flash_fwd(q, k, v, scale, block_q, block_k, n_zero_cols)
    # Name the kernel outputs so a rematerialization policy can SAVE them:
    # with save_only_these_names('flash_out','flash_lse') on the layer
    # checkpoint, the remat recompute no longer re-runs the flash forward
    # (the dominant fwd cost) -- it only recomputes the cheap projections
    # feeding q/k/v (see DiTConfig.remat_policy).
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _tuned_bwd_blocks(sq, skv):
    """Backward tile override, measured on v5e at the 48.8k-token
    workload (scripts/bench_flash_bwd.py): (2048, 2048) beats the fwd's
    (1024, 2048) for BOTH the dq and dk/dv passes (284.4 vs 288.6 ms,
    +1.5%) -- the bwd kernels touch more operands per tile, so larger
    tiles amortize better.  Only upgrades when the real geometry fills a
    tile; short-KV cross attention keeps the caller's blocks (padding
    512 text tokens up to 2048 would quadruple its bwd work)."""
    if sq >= 2048 and skv >= 2048:
        return (2048, 2048), (2048, 2048)
    return None, None


def _flash_vjp_bwd(scale, block_q, block_k, n_zero_cols, res, do):
    # explicit zero kv columns produce exact zero dq contributions and
    # garbage-free dk/dv (k=v=0 -> p*(dp-delta) finite, dv/dk land in
    # the caller-discarded pad region)
    q, k, v, o, lse = res
    dq_b, dkv_b = _tuned_bwd_blocks(q.shape[1], k.shape[1])
    return _flash_bwd(q, k, v, o, lse, do, scale, block_q, block_k,
                      dq_b, dkv_b)


_flash_attention_bnsd.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def _attention_pallas(q, k, v, scale, block_q=1024, block_k=2048):
    # measured on v5e at the 48.8k-token workload with the log2-domain
    # mask-free kernel: fwd 143.6 TF/s / fwd+bwd 137.0 at (1024, 2048);
    # larger blocks are within 1% (143.9/138.5 peak) and (4096, 4096)
    # regresses, so the smaller-footprint default stays.
    b, sq, n, d = q.shape
    skv = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * n, skv, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * n, skv, d)
    # short KV (cross attention): a single kv block avoids wasted grid steps
    bk = min(block_k, max(128, ((skv + 127) // 128) * 128))
    ot = _flash_attention_bnsd(qt, kt, vt, scale, block_q=block_q, block_k=bk)
    return ot.reshape(b, n, sq, d).transpose(0, 2, 1, 3)


# --------------------------------------------------------------------------
# int8-QK flash attention: q/k quantized per token (max-abs/127), the s =
# q k^T matmul runs on the int8 MXU path (2x bf16 peak on v5e) with i32
# accumulation, rescaled to f32 before the online softmax; p@v stays bf16.
# Replaces the reference's quantization fatbin idea (sat/quantization) on
# the attention hot path; per-row scaling keeps the softmax inputs exact
# to ~1e-2 relative (SageAttention-style QK quantization).  Inference
# path: the VJP falls back to the exact bf16 kernels.
# --------------------------------------------------------------------------
def _quantize_rows(x):
    """(B, S, d) -> int8 (B, S, d), f32 scales (B, S)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _flash_int8_kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, o_ref, lse_ref,
                       acc_ref, m_ref, l_ref, *, n_pad):
    """int8-QK online softmax, log2-domain (scale*log2e folded into the qs
    row scales outside).  Padded kv columns carry ks=0 so their logits are
    exactly 0 and v=0; like the bf16 kernel, only the tail step(s) holding
    pad pay an iota mask, keeping degenerate all-negative-logit rows
    exact."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    bk = k_ref.shape[-2]

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]          # (bq, d) int8
    k = k_ref[0]          # (bk, d) int8
    v = v_ref[0]          # (bk, d) bf16
    qs = qs_ref[0, 0][:, None]   # (bq, 1) f32, includes scale*log2e
    ks = ks_ref[0, 0][None, :]   # (1, bk) f32

    s_i32 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    s = s_i32.astype(jnp.float32) * (qs * ks)  # log2-domain logits

    def _body(s):
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_next, l_ref.shape)

    if n_pad:
        skv_real = nk * bk - n_pad
        first_pad = skv_real // bk

        @pl.when(ki < first_pad)
        def _interior():
            _body(s)

        @pl.when(ki >= first_pad)
        def _tail():
            col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            _body(jnp.where(col < skv_real, s, _NEG_INF))
    else:
        _body(s)

    @pl.when(ki == nk - 1)
    def _finalize():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = _LN2 * m[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-30))


def _flash_int8_fwd(q, k, v, scale, block_q, block_k):
    """q/k/v: (B, sq|skv, d) bf16; quantizes q/k outside the kernel."""
    B, sq, d = q.shape
    skv = k.shape[1]
    qi8, qs = _quantize_rows(q)
    ki8, ks = _quantize_rows(k)
    qs = qs * (scale * _LOG2E)  # fold softmax scale + exp2 conversion
    pq = (-sq) % block_q
    pk = (-skv) % block_k
    if pq:
        qi8 = jnp.pad(qi8, ((0, 0), (0, pq), (0, 0)))
        qs = jnp.pad(qs, ((0, 0), (0, pq)))
    if pk:
        ki8 = jnp.pad(ki8, ((0, 0), (0, pk), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, pk)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))
    qs = qs[:, None, :]
    ks = ks[:, None, :]
    nq = qi8.shape[1] // block_q
    nk = ki8.shape[1] // block_k

    out, lse = pl.pallas_call(
        functools.partial(_flash_int8_kernel, n_pad=pk),
        grid=(B, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda b, qi, ki: (b, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, qi8.shape[1], d), v.dtype),
            jax.ShapeDtypeStruct((B, 1, qi8.shape[1]), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(qi8, ki8, v, qs, ks)
    return out[:, :sq], lse[:, 0, :sq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_int8_bnsd(q, k, v, scale, block_q=1024, block_k=2048):
    out, _ = _flash_int8_fwd(q, k, v, scale, block_q, block_k)
    return out


def _flash_int8_vjp_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _flash_int8_fwd(q, k, v, scale, block_q, block_k)
    # bwd reuses the exact bf16 kernels with the original q/k: the int8
    # quantization perturbs the forward by ~1e-2 rel; using exact grads is
    # the standard straight-through treatment
    return out, (q, k, v, out, lse)


def _flash_int8_vjp_bwd(scale, block_q, block_k, res, do):
    q, k, v, o, lse = res
    dq_b, dkv_b = _tuned_bwd_blocks(q.shape[1], k.shape[1])
    return _flash_bwd(q, k, v, o, lse, do, scale, block_q,
                      min(block_k, 2048), dq_b, dkv_b)


_flash_attention_int8_bnsd.defvjp(_flash_int8_vjp_fwd, _flash_int8_vjp_bwd)


def _attention_pallas_int8(q, k, v, scale, block_q=1024, block_k=2048):
    b, sq, n, d = q.shape
    skv = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * n, skv, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * n, skv, d)
    bk = min(block_k, max(128, ((skv + 127) // 128) * 128))
    ot = _flash_attention_int8_bnsd(qt, kt, vt, scale, block_q, bk)
    return ot.reshape(b, n, sq, d).transpose(0, 2, 1, 3)


# --------------------------------------------------------------------------
# Fused dual cross-attention: the SCAIL DiT attends the same queries over
# text KV and CLIP KV and SUMS the two results (dit:1159-1197).  Both KVs are
# short (<=512 tokens), so one kernel computes both exact softmaxes per query
# block and writes the summed output -- one q read and one o write instead of
# two of each, and half the kernel dispatches.
# --------------------------------------------------------------------------
def _dual_cross_kernel(q_ref, k1_ref, v1_ref, k2_ref, v2_ref, o_ref,
                       *, n_pad1, n_pad2):
    # q pre-scaled by scale*log2e; kv zero-padded and masked with one iota
    # where per stream (single-block softmax, so the mask is cheap and
    # keeps degenerate all-negative-logit rows exact)
    q = q_ref[0]

    def one(k_ref, v_ref, n_pad):
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < k.shape[0] - n_pad, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return o / l

    o_ref[0] = (one(k1_ref, v1_ref, n_pad1)
                + one(k2_ref, v2_ref, n_pad2)).astype(o_ref.dtype)


def _dual_cross_fwd_pallas(q, k1, v1, k2, v2, scale, block_q=2048):
    b, sq, n, d = q.shape
    q = _prescale(q, scale)

    def pad_kv(k):
        skv = k.shape[1]
        p = (-skv) % 128
        return (jnp.pad(k, ((0, 0), (0, p), (0, 0), (0, 0))) if p else k), p

    k1p, p1 = pad_kv(k1)
    v1p, _ = pad_kv(v1)
    k2p, p2 = pad_kv(k2)
    v2p, _ = pad_kv(v2)
    pq = (-sq) % block_q
    qp = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0))) if pq else q

    qt = qp.transpose(0, 2, 1, 3).reshape(b * n, qp.shape[1], d)
    kvs = [t.transpose(0, 2, 1, 3).reshape(b * n, t.shape[1], d)
           for t in (k1p, v1p, k2p, v2p)]
    nq = qt.shape[1] // block_q

    qspec = pl.BlockSpec((1, block_q, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM)

    def kvspec(t):
        return pl.BlockSpec((1, t.shape[1], d), lambda bi, qi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_dual_cross_kernel, n_pad1=p1, n_pad2=p2),
        grid=(b * n, nq),
        in_specs=[qspec] + [kvspec(t) for t in kvs],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(qt, *kvs)
    out = out.reshape(b, n, qp.shape[1], d).transpose(0, 2, 1, 3)
    return out[:, :sq]


def _dual_cross_reference(q, k1, v1, k2, v2, scale):
    return (_attention_xla(q, k1, v1, scale) + _attention_xla(q, k2, v2, scale))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dual_cross_tpu(q, k1, v1, k2, v2, scale):
    return _dual_cross_fwd_pallas(q, k1, v1, k2, v2, scale)


def _dual_cross_vjp_fwd(q, k1, v1, k2, v2, scale):
    return _dual_cross_fwd_pallas(q, k1, v1, k2, v2, scale), (q, k1, v1, k2, v2)


def _dual_cross_vjp_bwd(scale, res, g):
    # short KV: the exact composed gradient through the XLA path is cheap
    q, k1, v1, k2, v2 = res
    _, vjp = jax.vjp(lambda *a: _dual_cross_reference(*a, scale), q, k1, v1, k2, v2)
    return vjp(g)


_dual_cross_tpu.defvjp(_dual_cross_vjp_fwd, _dual_cross_vjp_bwd)


def dual_cross_attention(q, k1, v1, k2, v2, *, scale: float = None,
                         impl: str = "auto", platform: str = None):
    """attention(q,k1,v1) + attention(q,k2,v2) with both softmaxes fused into
    one kernel on TPU (the DiT's summed text+CLIP cross attention).
    platform: see resolve_impl — the naive-XLA fallback materializes
    (b, n, 48832, 512) f32 logits in the backward (24 GB at 14B), so
    'auto' must not mis-resolve under AOT lowering."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if impl == "auto":
        on_tpu = (platform == "tpu") if platform else _on_tpu()
        impl = "pallas" if on_tpu else "xla"
    if impl == "pallas":
        return _dual_cross_tpu(q, k1, v1, k2, v2, scale)
    return _dual_cross_reference(q, k1, v1, k2, v2, scale)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def resolve_impl(impl: str, seq_len: int, platform: str = None) -> str:
    """'auto' -> the impl attention() would pick for this seq length.
    platform overrides the default-backend probe — REQUIRED when lowering
    for a device mesh whose platform differs from the default backend
    (AOT compiles force the default to CPU while targeting a TPU
    topology; auto must still pick the production kernels there)."""
    if impl == "auto":
        on_tpu = (platform == "tpu") if platform else _on_tpu()
        return "pallas" if on_tpu else ("xla" if seq_len <= 4096 else "chunked")
    return impl


def attention(q, k, v, *, scale: float = None, impl: str = "auto",
              rope=None, rope_interleaved: bool = True,
              platform: str = None):
    """Full bidirectional attention.

    q: (b, sq, n, d); k/v: (b, skv, n, d).  Returns (b, sq, n, d).
    scale defaults to 1/sqrt(d) (SDPA convention; the reference relies on
    torch SDPA's default scaling, sat/transformer_defaults.py:59-73).
    impl: 'auto' | 'xla' | 'chunked' | 'pallas'.
    rope: optional (cos, sin) tables of shape (s, d), applied to q and k
    before the scores.  On the pallas path the q-side rotation happens
    INSIDE the flash kernel (saves q's rotary HBM round-trip; k is
    pre-roped in XLA — see _flash_rope_q_kernel for why k-side fusion
    loses) and as a plain pre-pass on every other impl — callers pass
    un-roped q/k either way.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    impl = resolve_impl(impl, q.shape[1], platform)
    if rope is not None:
        cos, sin = rope
        if impl == "pallas" and q.shape[1] == k.shape[1]:
            return _attention_pallas_rope(q, k, v, cos, sin, scale,
                                          rope_interleaved)
        from scail_tpu.ops.rotary import apply_rotary

        q = apply_rotary(q, cos[:, None, :], sin[:, None, :], rope_interleaved)
        k = apply_rotary(k, cos[:, None, :], sin[:, None, :], rope_interleaved)
    if impl == "xla":
        return _attention_xla(q, k, v, scale)
    if impl == "chunked":
        return _attention_chunked(q, k, v, scale)
    if impl == "pallas":
        return _attention_pallas(q, k, v, scale)
    if impl == "pallas_int8":
        return _attention_pallas_int8(q, k, v, scale)
    raise ValueError(f"unknown attention impl {impl}")
