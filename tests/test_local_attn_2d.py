"""Brute-force checks of the 2D local-attention primitives
(scail_tpu/ops/local_attn_2d.py) against explicit python enumeration of
the window contract (reference: sat/model/official/cuda2d_model.py:151-213
call sites of the external localAttention CUDA ext)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scail_tpu.ops.local_attn_2d import (causal_field, f_similar,
                                         f_weighting)


def _offsets(kH, kW, causal):
    offs = [(ki - kH // 2, kj - kW // 2)
            for ki in range(kH) for kj in range(kW)]
    return offs[: causal_field(kH, kW)] if causal else offs


def _similar_ref(q, k, kH, kW, causal):
    n, c, H, W = q.shape
    Hk = k.shape[2]
    r = H // Hk
    offs = _offsets(kH, kW, causal)
    out = np.zeros((n, H, W, len(offs)), np.float32)
    for i in range(H):
        for j in range(W):
            ci, cj = i // r, j // r
            for f, (di, dj) in enumerate(offs):
                ki, kj = ci + di, cj + dj
                if 0 <= ki < Hk and 0 <= kj < k.shape[3]:
                    out[:, i, j, f] = (q[:, :, i, j] * k[:, :, ki, kj]).sum(1)
    return out


def _weighting_ref(v, w, kH, kW, causal):
    n, c, Hv, Wv = v.shape
    H, W = w.shape[1], w.shape[2]
    r = H // Hv
    offs = _offsets(kH, kW, causal)
    out = np.zeros((n, c, H, W), np.float32)
    for i in range(H):
        for j in range(W):
            ci, cj = i // r, j // r
            for f, (di, dj) in enumerate(offs):
                ki, kj = ci + di, cj + dj
                if 0 <= ki < Hv and 0 <= kj < Wv:
                    out[:, :, i, j] += w[:, i, j, f, None] * v[:, :, ki, kj]
    return out


@pytest.mark.parametrize("kH,kW,causal", [(5, 3, True), (3, 3, False)])
def test_f_similar_same_resolution(kH, kW, causal):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 3, 6, 6)).astype(np.float32)
    k = rng.standard_normal((2, 3, 6, 6)).astype(np.float32)
    got = f_similar(jnp.asarray(q), jnp.asarray(k), kH, kW, causal)
    np.testing.assert_allclose(np.asarray(got),
                               _similar_ref(q, k, kH, kW, causal),
                               rtol=1e-5, atol=1e-5)


def test_f_similar_cross_resolution():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    k = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    got = f_similar(jnp.asarray(q), jnp.asarray(k), 3, 3, False)
    np.testing.assert_allclose(np.asarray(got),
                               _similar_ref(q, k, 3, 3, False),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape_v,shape_w,kH,kW,causal", [
    ((2, 3, 6, 6), (2, 6, 6), 5, 3, True),
    ((2, 3, 4, 4), (2, 8, 8), 3, 3, False),  # cross-resolution
])
def test_f_weighting(shape_v, shape_w, kH, kW, causal):
    rng = np.random.default_rng(2)
    v = rng.standard_normal(shape_v).astype(np.float32)
    w = rng.standard_normal(
        shape_w + (causal_field(kH, kW) if causal else kH * kW,)
    ).astype(np.float32)
    got = f_weighting(jnp.asarray(v), jnp.asarray(w), kH, kW, causal)
    np.testing.assert_allclose(np.asarray(got),
                               _weighting_ref(v, w, kH, kW, causal),
                               rtol=1e-5, atol=1e-5)


def test_weighting_is_similar_adjoint():
    """<f_similar(q, k), w> == <q, f_weighting(k, w)> -- the two gathers
    share one window structure (the reference ships hand-written CUDA
    backwards for this; autodiff gives it to us, this pins the math)."""
    rng = np.random.default_rng(3)
    q = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    k = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    w = rng.standard_normal((1, 4, 4, causal_field(5, 3))).astype(np.float32)
    lhs = (np.asarray(f_similar(jnp.asarray(q), jnp.asarray(k), 5, 3, True))
           * w).sum()
    rhs = (q * np.asarray(
        f_weighting(jnp.asarray(k), jnp.asarray(w), 5, 3, True))).sum()
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_local_attn_grads_flow():
    def loss(q, k):
        return jnp.sum(f_similar(q, k, 3, 3, True) ** 2)

    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((1, 2, 4, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 4, 4)), jnp.float32)
    gq, gk = jax.grad(loss, argnums=(0, 1))(q, k)
    assert np.isfinite(np.asarray(gq)).all()
    assert float(jnp.abs(gk).sum()) > 0
