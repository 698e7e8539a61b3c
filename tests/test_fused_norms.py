"""Fused Pallas AdaLN-LN and rotary kernels vs their XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from scail_tpu.ops.fused_norms import adaln_layer_norm, apply_rotary_pallas
from scail_tpu.ops.norms import layer_norm, modulate
from scail_tpu.ops.rotary import apply_rotary, build_scail_rope


def test_adaln_ln_matches_xla(rng):
    b, s, d = 2, 300, 256
    x = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal((b, 1, d)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal((b, 1, d)).astype(np.float32))
    want = np.asarray(modulate(layer_norm(x, eps=1e-6), shift, scale))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(adaln_layer_norm(x, shift, scale, impl="pallas",
                                          block_s=128))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    got_xla = np.asarray(adaln_layer_norm(x, shift, scale, impl="xla"))
    np.testing.assert_allclose(got_xla, want, rtol=1e-6, atol=1e-6)


def test_rotary_pallas_matches_xla(rng):
    tables = build_scail_rope(32, 2, 4, 6)
    S = tables.cos.shape[0]
    x = jnp.asarray(rng.standard_normal((3, S, 32)).astype(np.float32))
    want = np.asarray(apply_rotary(x, tables.cos[None], tables.sin[None],
                                   interleaved=True))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(apply_rotary_pallas(x, tables.cos, tables.sin,
                                             impl="pallas", block_s=32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
