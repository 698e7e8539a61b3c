"""LoRA: injection, zero-init identity, merge equivalence, training mask."""

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params
from scail_tpu.training.lora import add_lora, lora_mask, merge_lora

CFG = DiTConfig(hidden_size=32, num_layers=2, num_heads=2, inner_hidden_size=48,
                time_embed_dim=32, text_dim=12, clip_dim=10, share_adaln=True,
                use_i2v_clip=True, dtype="float32", attn_impl="xla")


def _inputs(rng):
    return dict(
        x=jnp.asarray(rng.standard_normal((1, 2, 16, 8, 8)).astype(np.float32)),
        timesteps=jnp.asarray([100.0], jnp.float32),
        context=jnp.asarray(rng.standard_normal((1, 7, 12)).astype(np.float32)),
        ref_concat=jnp.asarray(rng.standard_normal((1, 1, 16, 8, 8)).astype(np.float32)),
        concat_smpl_render=jnp.asarray(rng.standard_normal((1, 2, 16, 4, 4)).astype(np.float32)),
        image_clip_features=jnp.asarray(rng.standard_normal((1, 5, 10)).astype(np.float32)),
    )


def _fwd(params, inp):
    return dit_forward(params, CFG, inp["x"], inp["timesteps"], inp["context"],
                       ref_concat=inp["ref_concat"],
                       concat_smpl_render=inp["concat_smpl_render"],
                       image_clip_features=inp["image_clip_features"])


def test_lora_zero_init_is_identity(rng):
    params = init_dit_params(jax.random.PRNGKey(0), CFG)
    lparams = add_lora(params, jax.random.PRNGKey(1), rank=4)
    assert lparams["layers"]["qkv"]["lora_a"].shape == (2, 32, 4)
    inp = _inputs(rng)
    np.testing.assert_allclose(np.asarray(_fwd(params, inp)),
                               np.asarray(_fwd(lparams, inp)), atol=1e-6)


def test_lora_merge_matches_unmerged(rng):
    params = init_dit_params(jax.random.PRNGKey(0), CFG)
    lparams = add_lora(params, jax.random.PRNGKey(1), rank=4)
    # give B nonzero values so the delta matters
    lparams["layers"]["qkv"]["lora_b"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), lparams["layers"]["qkv"]["lora_b"].shape)
    inp = _inputs(rng)
    out_lora = np.asarray(_fwd(lparams, inp))
    out_base = np.asarray(_fwd(params, inp))
    assert not np.allclose(out_lora, out_base)
    merged = merge_lora(lparams)
    assert "lora_a" not in merged["layers"]["qkv"]
    np.testing.assert_allclose(np.asarray(_fwd(merged, inp)), out_lora,
                               rtol=2e-4, atol=2e-4)


def test_lora_mask_targets_only_lora():
    params = init_dit_params(jax.random.PRNGKey(0), CFG)
    lparams = add_lora(params, jax.random.PRNGKey(1), rank=2)
    mask = lora_mask(lparams)
    assert mask["layers"]["qkv"]["lora_a"] is True
    assert mask["layers"]["qkv"]["kernel"] is False
    assert mask["patch_embed"]["proj"]["kernel"] is False
    n_train = sum(
        int(np.asarray(m)) for m in jax.tree.leaves(mask))
    assert n_train == 7 * 2  # 7 dense targets x (a, b)
