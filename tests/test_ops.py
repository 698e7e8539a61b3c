"""Ops parity vs torch oracles.

The reference publishes no unit tests; we verify each TPU op against a
minimal torch implementation of the documented math (tolerances in fp32).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from scail_tpu.ops import apply_rotary, attention, build_scail_rope, layer_norm, modulate, rms_norm
from scail_tpu.ops.norms import channel_rms_norm


def test_rms_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    w = rng.standard_normal((64,)).astype(np.float32)

    xt = torch.tensor(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    ref = (torch.tensor(w) * (xt * torch.rsqrt(var + 1e-6))).numpy()

    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    ref = F.layer_norm(torch.tensor(x), (64,), eps=1e-6).numpy()
    out = np.asarray(layer_norm(jnp.asarray(x), eps=1e-6))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_modulate():
    x = jnp.ones((1, 2, 4))
    out = modulate(x, shift=jnp.full((1, 1, 4), 0.5), scale=jnp.full((1, 1, 4), 2.0))
    np.testing.assert_allclose(np.asarray(out), 3.5)


def test_channel_rms_norm_matches_f_normalize(rng):
    x = rng.standard_normal((2, 16, 3, 4, 5)).astype(np.float32)
    g = rng.standard_normal((16, 1, 1, 1)).astype(np.float32)
    ref = (F.normalize(torch.tensor(x), dim=1) * (16 ** 0.5) * torch.tensor(g)).numpy()
    out = np.asarray(channel_rms_norm(jnp.asarray(x), jnp.asarray(g), axis=1))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Rotary: torch oracle reproducing Rotary3DPositionEmbeddingMixin's math
# (dit_video_crossattn_sc_xc.py:382-645) for interleaved_rope=True.
# ---------------------------------------------------------------------------
def _torch_rope_tables(head_dim, T, H_total, W_total, theta=10000.0):
    dim_t = head_dim - 4 * (head_dim // 6)
    dim_h = (head_dim // 6) * 2
    dim_w = dim_h

    def axis_freqs(dim):
        return 1.0 / theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim)

    ft, fh, fw = axis_freqs(dim_t), axis_freqs(dim_h), axis_freqs(dim_w)
    grid_t = torch.arange(1, T + 1, dtype=torch.float32)
    grid_h = torch.arange(H_total, dtype=torch.float32)
    grid_w = torch.arange(W_total + 120, dtype=torch.float32)
    ext_t = torch.tensor([0.0])

    def table(gt, gh, gw):
        at = torch.einsum("t,f->tf", gt, ft).repeat_interleave(2, dim=-1)
        ah = torch.einsum("h,f->hf", gh, fh).repeat_interleave(2, dim=-1)
        aw = torch.einsum("w,f->wf", gw, fw).repeat_interleave(2, dim=-1)
        Tn, Hn, Wn = len(gt), len(gh), len(gw)
        return torch.cat(
            [
                at[:, None, None, :].expand(Tn, Hn, Wn, -1),
                ah[None, :, None, :].expand(Tn, Hn, Wn, -1),
                aw[None, None, :, :].expand(Tn, Hn, Wn, -1),
            ],
            dim=-1,
        )

    freqs = table(grid_t, grid_h, grid_w)
    freqs_ext = table(ext_t, torch.arange(H_total, dtype=torch.float32),
                      torch.arange(W_total, dtype=torch.float32))
    return freqs, freqs_ext


def _torch_rotate_half_interleaved(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)


def _torch_apply(t, cos, sin):
    return t * cos + _torch_rotate_half_interleaved(t) * sin


def test_rope_matches_reference_math(rng):
    head_dim, T, H, W = 32, 3, 4, 6
    h_shift, w_shift = 0, 0
    tables = build_scail_rope(head_dim, T, H, W)
    assert tables.ref_len == H * W
    assert tables.video_len == T * H * W
    assert tables.pose_len == T * (H // 2) * (W // 2)

    freqs, freqs_ext = _torch_rope_tables(head_dim, T, H, W)

    # oracle: slice+flatten like reshape_freq (dit:543-551, :579-588, :616-637)
    vid = freqs[:T, h_shift : H + h_shift, w_shift : W + w_shift]
    ref = freqs_ext[0:1, h_shift : H + h_shift, w_shift : W + w_shift]
    pose_full = freqs[:T, 0 + h_shift : H + h_shift, 120 + w_shift : 120 + W + w_shift]

    def pool_cs(f):
        cs = f.cos().permute(0, 3, 1, 2)
        sn = f.sin().permute(0, 3, 1, 2)
        cs = F.avg_pool2d(cs, 2, 2).permute(0, 2, 3, 1).reshape(-1, head_dim)
        sn = F.avg_pool2d(sn, 2, 2).permute(0, 2, 3, 1).reshape(-1, head_dim)
        return cs, sn

    ref_cos = ref.cos().reshape(-1, head_dim)
    ref_sin = ref.sin().reshape(-1, head_dim)
    vid_cos = vid.cos().reshape(-1, head_dim)
    vid_sin = vid.sin().reshape(-1, head_dim)
    pose_cos, pose_sin = pool_cs(pose_full)

    want_cos = torch.cat([ref_cos, vid_cos, pose_cos]).numpy()
    want_sin = torch.cat([ref_sin, vid_sin, pose_sin]).numpy()
    np.testing.assert_allclose(np.asarray(tables.cos), want_cos, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(tables.sin), want_sin, rtol=2e-5, atol=2e-5)

    # application parity on a random tensor
    S = tables.cos.shape[0]
    x = rng.standard_normal((2, S, head_dim)).astype(np.float32)
    out = np.asarray(apply_rotary(jnp.asarray(x), tables.cos, tables.sin))
    want = _torch_apply(torch.tensor(x), torch.tensor(want_cos), torch.tensor(want_sin)).numpy()
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)


def test_rope_sp_shift_consistency():
    """Sequence-parallel h/w shifts (dit:1576-1585) must equal slices of the
    unshifted wider grid."""
    head_dim, T, H, W = 32, 2, 4, 8
    full = build_scail_rope(head_dim, T, H, W)
    right = build_scail_rope(head_dim, T, H, W // 2, w_shift=W // 2)
    # video segment of the shifted-half table == right half columns of full
    fv = np.asarray(full.cos[full.ref_len : full.ref_len + full.video_len]).reshape(T, H, W, head_dim)
    rv = np.asarray(right.cos[right.ref_len : right.ref_len + right.video_len]).reshape(T, H, W // 2, head_dim)
    np.testing.assert_allclose(rv, fv[:, :, W // 2 :], rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------
def _sdpa_ref(q, k, v):
    # torch SDPA with default scaling on (b, n, s, d)
    qt = torch.tensor(q).permute(0, 2, 1, 3)
    kt = torch.tensor(k).permute(0, 2, 1, 3)
    vt = torch.tensor(v).permute(0, 2, 1, 3)
    out = F.scaled_dot_product_attention(qt, kt, vt)
    return out.permute(0, 2, 1, 3).numpy()


def test_attention_xla_matches_sdpa(rng):
    b, s, n, d = 2, 37, 4, 16
    q = rng.standard_normal((b, s, n, d)).astype(np.float32)
    k = rng.standard_normal((b, s, n, d)).astype(np.float32)
    v = rng.standard_normal((b, s, n, d)).astype(np.float32)
    out = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla"))
    np.testing.assert_allclose(out, _sdpa_ref(q, k, v), rtol=2e-5, atol=2e-5)


def test_attention_cross_shape(rng):
    q = jnp.asarray(rng.standard_normal((1, 50, 2, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 7, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 7, 2, 8)).astype(np.float32))
    out = attention(q, k, v, impl="xla")
    assert out.shape == (1, 50, 2, 8)


def test_attention_chunked_matches_xla(rng):
    b, s, n, d = 1, 300, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    a = np.asarray(attention(q, k, v, impl="xla"))
    c = np.asarray(attention(q, k, v, impl="chunked"))
    np.testing.assert_allclose(c, a, rtol=2e-5, atol=2e-5)


def test_attention_pallas_vjp_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    b, s, n, d = 1, 150, 2, 128
    q = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s + 26, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s + 26, n, d)).astype(np.float32))

    def loss(impl):
        return lambda q, k, v: jnp.sum(attention(q, k, v, impl=impl) ** 2)

    gref = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gpl = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gref, gpl):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=2e-4, atol=2e-4)


def _rand_rope_tables(rng, s, d, interleaved):
    """Random angles in the rotary rep() layout: pair-repeated
    (interleaved) or per-table half-concat (non-interleaved)."""
    ang = rng.standard_normal((s, d // 2)).astype(np.float32)
    ang = (np.repeat(ang, 2, axis=-1) if interleaved
           else np.concatenate([ang, ang], axis=-1))
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


@pytest.mark.parametrize("interleaved", [True, False])
def test_attention_fused_rope_vjp_matches_unfused(rng, interleaved):
    """Fused-rope flash kernels (rotary applied to q/k tiles in VMEM,
    fwd + dq/dk/dv with the transpose-rotation pullback) == apply_rotary
    then plain attention.  Multi-block grid with q/k padding."""
    from jax.experimental.pallas import tpu as pltpu

    from scail_tpu.ops.attention import _attention_pallas_rope
    from scail_tpu.ops.rotary import apply_rotary

    b, s, n, d = 1, 150, 2, 128
    q = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    cos, sin = _rand_rope_tables(rng, s, d, interleaved)
    w = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))

    def loss_ref(q, k, v):
        qr = apply_rotary(q, cos[:, None, :], sin[:, None, :], interleaved)
        kr = apply_rotary(k, cos[:, None, :], sin[:, None, :], interleaved)
        return jnp.sum(w * attention(qr, kr, v, impl="xla"))

    def loss_fused(q, k, v):
        return jnp.sum(w * _attention_pallas_rope(
            q, k, v, cos, sin, 1.0 / np.sqrt(d), interleaved,
            block_q=128, block_k=128))

    want = float(loss_ref(q, k, v))
    gref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = float(loss_fused(q, k, v))
        gpl = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(got, want, rtol=2e-4)
    for a, b_ in zip(gref, gpl):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_attention_rope_kwarg_unfused_path(rng):
    """attention(rope=...) on a non-pallas impl applies the rotary as a
    pre-pass — same contract as the fused kernel, so callers are
    impl-agnostic."""
    from scail_tpu.ops.rotary import apply_rotary

    b, s, n, d = 1, 64, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    cos, sin = _rand_rope_tables(rng, s, d, True)
    got = np.asarray(attention(q, k, v, impl="xla", rope=(cos, sin)))
    qr = apply_rotary(q, cos[:, None, :], sin[:, None, :], True)
    kr = apply_rotary(k, cos[:, None, :], sin[:, None, :], True)
    want = np.asarray(attention(qr, kr, v, impl="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_dual_cross_attention_matches_sum(rng):
    from jax.experimental.pallas import tpu as pltpu

    from scail_tpu.ops.attention import dual_cross_attention

    b, s, n, d = 1, 200, 2, 128
    q = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    k1 = jnp.asarray(rng.standard_normal((b, 37, n, d)).astype(np.float32))
    v1 = jnp.asarray(rng.standard_normal((b, 37, n, d)).astype(np.float32))
    k2 = jnp.asarray(rng.standard_normal((b, 21, n, d)).astype(np.float32))
    v2 = jnp.asarray(rng.standard_normal((b, 21, n, d)).astype(np.float32))

    want = np.asarray(attention(q, k1, v1, impl="xla")
                      + attention(q, k2, v2, impl="xla"))
    got_ref = np.asarray(dual_cross_attention(q, k1, v1, k2, v2, impl="xla"))
    np.testing.assert_allclose(got_ref, want, rtol=2e-5, atol=2e-5)
    with pltpu.force_tpu_interpret_mode():
        got_pl = np.asarray(dual_cross_attention(q, k1, v1, k2, v2, impl="pallas"))
    np.testing.assert_allclose(got_pl, want, rtol=2e-4, atol=2e-4)

    # gradient path (custom VJP routes through the exact composed grad)
    def loss(q, k1, v1, k2, v2):
        return jnp.sum(dual_cross_attention(q, k1, v1, k2, v2, impl="xla") ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k1, v1, k2, v2)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)


def test_attention_pallas_interpret_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    b, s, n, d = 1, 200, 2, 128
    q = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s + 30, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s + 30, n, d)).astype(np.float32))
    a = np.asarray(attention(q, k, v, impl="xla"))
    with pltpu.force_tpu_interpret_mode():
        p = np.asarray(attention(q, k, v, impl="pallas"))
    np.testing.assert_allclose(p, a, rtol=2e-4, atol=2e-4)


def test_attention_pallas_degenerate_rows_exact(rng):
    """Rows whose real logits are ALL far below zero, with kv padding
    present: the former finalize denominator correction cancelled
    catastrophically here (ADVICE r2); the tail-step mask is exact."""
    from jax.experimental.pallas import tpu as pltpu

    b, s, n, d = 1, 130, 2, 128
    u = rng.standard_normal((d,)).astype(np.float32)
    u /= np.linalg.norm(u)
    # every key strongly along +u, every query strongly along -u:
    # all logits ~ -40 natural; kv length 130 forces 126 pad columns
    # at block 256 in interpret... block picked internally; any pad works
    k = jnp.asarray(np.tile(u * 16.0, (b, s, n, 1))
                    + 0.05 * rng.standard_normal((b, s, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    q = jnp.asarray(np.tile(-u * 32.0, (b, s, n, 1))
                    + 0.05 * rng.standard_normal((b, s, n, d)).astype(np.float32))
    want = np.asarray(attention(q, k, v, impl="xla"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(attention(q, k, v, impl="pallas"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_attention_bf16_softmax_close_to_exact(rng):
    """Opt-in bf16 online softmax (the ROADMAP dense-ceiling experiment):
    exp2 at 2x VPU lane rate must track the exact kernel to the bf16
    mantissa bound (~0.4% relative on p; tighter after the /l
    normalization)."""
    from jax.experimental.pallas import tpu as pltpu

    from scail_tpu.ops.attention import _flash_fwd

    B, s, d = 2, 300, 64
    q = jnp.asarray(rng.standard_normal((B, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, s, d)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        want, _ = _flash_fwd(q, k, v, 0.125, 128, 128)
        got, _ = _flash_fwd(q, k, v, 0.125, 128, 128,
                            softmax_dtype=jnp.bfloat16)
    err = np.abs(np.asarray(got) - np.asarray(want))
    denom = np.abs(np.asarray(want)) + 1e-2
    assert float((err / denom).mean()) < 6e-3, float((err / denom).mean())


def test_attention_int8_interpret_close_to_xla(rng):
    """int8-QK flash (interpret mode) tracks the exact computation to the
    quantization tolerance; lse finite; kv-padding masked correctly."""
    from scail_tpu.ops.attention import _attention_pallas_int8

    b, s, n, d = 1, 384, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, n, d)).astype(np.float32))
    from jax.experimental.pallas import tpu as pltpu

    want = np.asarray(attention(q, k, v, impl="xla"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_attention_pallas_int8(
            q, k, v, 1.0 / np.sqrt(d), block_q=128, block_k=256))
    err = np.abs(got - want) / (np.abs(want) + 1e-3)
    # random uncorrelated q/k are the worst case for relative error (the
    # averaged outputs are near zero); real activations do much better
    assert float(err.mean()) < 5e-2, float(err.mean())
    cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos
