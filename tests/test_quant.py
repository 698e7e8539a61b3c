"""Quantization: int8/int4 pack-unpack exactness and matmul accuracy."""

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental.pallas import tpu as pltpu

from scail_tpu.ops.quant import (
    dense_quantized, matmul_w8a16, quantize_dense_params, quantize_int4,
    quantize_int8, unpack_int4,
)


def test_int8_quantize_roundtrip(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    q, s = quantize_int8(w)
    assert q.dtype == jnp.int8
    deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    # error bounded by scale/2 per element
    assert np.max(np.abs(deq - w) / np.asarray(s)[None, :]) <= 0.5 + 1e-5


def test_int4_pack_unpack_exact(rng):
    w = rng.standard_normal((16, 8)).astype(np.float32)
    packed, s = quantize_int4(w)
    assert packed.shape == (8, 8) and packed.dtype == jnp.uint8
    codes = np.asarray(unpack_int4(packed))
    assert codes.min() >= -7 and codes.max() <= 7
    deq = codes * np.asarray(s)[None, :]
    assert np.max(np.abs(deq - w) / np.asarray(s)[None, :]) <= 0.5 + 1e-5


def test_w8a16_matmul_xla_close_to_fp(rng):
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    q, s = quantize_int8(w)
    got = np.asarray(matmul_w8a16(jnp.asarray(x), q, s, impl="xla"))
    want = x @ w
    # quantization error ~ 1% relative for gaussian weights
    assert np.max(np.abs(got - want)) / np.abs(want).max() < 0.05


def test_w8a16_pallas_interpret_matches_xla(rng):
    x = rng.standard_normal((1, 300, 130)).astype(np.float32)
    w = rng.standard_normal((130, 70)).astype(np.float32)
    q, s = quantize_int8(w)
    want = np.asarray(matmul_w8a16(jnp.asarray(x), q, s, impl="xla"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(matmul_w8a16(jnp.asarray(x), q, s, impl="pallas"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_dense_quantized_api(rng):
    p = {"kernel": rng.standard_normal((32, 16)).astype(np.float32),
         "bias": rng.standard_normal((16,)).astype(np.float32)}
    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    for bits in (8, 4):
        qp = quantize_dense_params(p, bits=bits)
        y = np.asarray(dense_quantized(qp, x, impl="xla"))
        want = np.asarray(x) @ p["kernel"] + p["bias"]
        assert np.max(np.abs(y - want)) / np.abs(want).max() < (0.05 if bits == 8 else 0.35)
