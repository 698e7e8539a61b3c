"""Model zoo: KV-cached decode == full causal forward; generation runs."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from scail_tpu.models.zoo.gpt import (
    GPTConfig, generate, gpt_forward, init_gpt_params, init_kv_cache,
)

CFG = GPTConfig(vocab_size=97, dim=32, num_heads=4, num_layers=2, max_len=16)


@pytest.mark.slow
def test_cached_decode_matches_full(rng):
    params = init_gpt_params(jax.random.PRNGKey(0), CFG)
    tokens = jnp.asarray(rng.integers(0, 97, (2, 9)), jnp.int32)

    full_logits, _ = gpt_forward(params, CFG, tokens)

    cache = init_kv_cache(CFG, 2)
    # prefill 5 then decode 4 one at a time
    logits_pre, cache = gpt_forward(params, CFG, tokens[:, :5], cache)
    steps = [logits_pre[:, i] for i in range(5)]
    for t in range(5, 9):
        lg, cache = gpt_forward(params, CFG, tokens[:, t : t + 1], cache)
        steps.append(lg[:, 0])
    inc_logits = jnp.stack(steps, axis=1)

    np.testing.assert_allclose(np.asarray(inc_logits), np.asarray(full_logits),
                               rtol=2e-4, atol=2e-4)


def test_generate_shapes_and_determinism(rng):
    params = init_gpt_params(jax.random.PRNGKey(0), CFG)
    prompt = jnp.asarray(rng.integers(0, 97, (1, 3)), jnp.int32)
    out1 = generate(params, CFG, prompt, max_new=6, key=jax.random.PRNGKey(1), top_k=1)
    out2 = generate(params, CFG, prompt, max_new=6, key=jax.random.PRNGKey(1), top_k=1)
    assert out1.shape == (1, 9)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1[:, :3]), np.asarray(prompt))
