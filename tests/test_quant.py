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


def test_quantized_dit_forward_close(rng):
    """Whole-model W8A16 quantization keeps the DiT forward close to fp32
    (the 14B single-chip inference path)."""
    from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params
    from scail_tpu.ops.quant import quantize_model_params

    cfg = DiTConfig(hidden_size=32, num_layers=2, num_heads=2, inner_hidden_size=48,
                    time_embed_dim=32, text_dim=12, clip_dim=10, share_adaln=True,
                    use_i2v_clip=True, dtype="float32", attn_impl="xla")
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    inp = dict(
        x=jnp.asarray(rng.standard_normal((1, 2, 16, 8, 8)).astype(np.float32)),
        timesteps=jnp.asarray([100.0], jnp.float32),
        context=jnp.asarray(rng.standard_normal((1, 7, 12)).astype(np.float32)),
    )
    kw = dict(
        ref_concat=jnp.asarray(rng.standard_normal((1, 1, 16, 8, 8)).astype(np.float32)),
        concat_smpl_render=jnp.asarray(rng.standard_normal((1, 2, 16, 4, 4)).astype(np.float32)),
        image_clip_features=jnp.asarray(rng.standard_normal((1, 5, 10)).astype(np.float32)),
    )
    want = np.asarray(dit_forward(params, cfg, inp["x"], inp["timesteps"], inp["context"], **kw))
    qparams = quantize_model_params(params, targets=("layers/",), bits=8)
    assert "qweight" in qparams["layers"]["qkv"]
    assert qparams["layers"]["qkv"]["qweight"].shape == (2, 32, 96)
    got = np.asarray(dit_forward(qparams, cfg, inp["x"], inp["timesteps"], inp["context"], **kw))
    # int8 weights: small relative degradation, not exact
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert rel < 0.1, rel


def test_dense_quantized_api(rng):
    p = {"kernel": rng.standard_normal((32, 16)).astype(np.float32),
         "bias": rng.standard_normal((16,)).astype(np.float32)}
    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    for bits in (8, 4):
        qp = quantize_dense_params(p, bits=bits)
        y = np.asarray(dense_quantized(qp, x, impl="xla"))
        want = np.asarray(x) @ p["kernel"] + p["bias"]
        assert np.max(np.abs(y - want)) / np.abs(want).max() < (0.05 if bits == 8 else 0.35)
