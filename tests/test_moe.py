"""Local MoE MLP: exact parity of the dense einsum dispatch vs a
token-gather loop mirroring the reference's mixtral-style dispatch
(sat/transformer_defaults.py:163-209), plus DiT integration and EP
sharding parity on the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.ops.moe import moe_mlp, moe_router


def _loop_dispatch(x, gate_k, w_in, w_out, top_k):
    """Reference semantics (transformer_defaults.py:181-209): route each
    token to its top-k experts, run each expert's full MLP (bias included)
    on its tokens, scale by the renormalized routing weight, sum."""
    import scipy.special as sp

    b, s, d = x.shape
    E = w_in["kernel"].shape[0]
    flat = x.reshape(-1, d)
    logits = flat @ gate_k
    probs = sp.softmax(logits.astype(np.float64), axis=-1)
    order = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
    wts = np.take_along_axis(probs, order, axis=-1)
    wts = wts / wts.sum(-1, keepdims=True)

    out = np.zeros_like(flat, dtype=np.float64)
    for e in range(E):
        tok, slot = np.where(order == e)
        if tok.size == 0:
            continue
        cur = flat[tok].astype(np.float64)
        h = cur @ w_in["kernel"][e] + w_in["bias"][e]
        h = 0.5 * h * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (h + 0.044715 * h ** 3)))
        y = h @ w_out["kernel"][e] + w_out["bias"][e]
        out[tok] += y * wts[tok, slot][:, None]
    return out.reshape(b, s, d).astype(np.float32)


def test_moe_matches_loop_dispatch(rng):
    b, s, d, f, E, k = 2, 9, 16, 24, 4, 2
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    gate = {"kernel": rng.standard_normal((d, E)).astype(np.float32) * 0.5}
    w_in = {"kernel": rng.standard_normal((E, d, f)).astype(np.float32) * 0.1,
            "bias": rng.standard_normal((E, f)).astype(np.float32) * 0.1}
    w_out = {"kernel": rng.standard_normal((E, f, d)).astype(np.float32) * 0.1,
             "bias": rng.standard_normal((E, d)).astype(np.float32) * 0.1}

    got = np.asarray(moe_mlp(jnp.asarray(x), gate,
                             jax.tree.map(jnp.asarray, w_in),
                             jax.tree.map(jnp.asarray, w_out), top_k=k))
    want = _loop_dispatch(x, gate["kernel"], w_in, w_out, k)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_moe_top1_selects_single_expert(rng):
    """With top_k=1 the output equals the argmax expert's plain MLP."""
    b, s, d, f, E = 1, 5, 8, 12, 3
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    gate = {"kernel": rng.standard_normal((d, E)).astype(np.float32)}
    w_in = {"kernel": rng.standard_normal((E, d, f)).astype(np.float32) * 0.1}
    w_out = {"kernel": rng.standard_normal((E, f, d)).astype(np.float32) * 0.1}

    got = np.asarray(moe_mlp(jnp.asarray(x), gate,
                             jax.tree.map(jnp.asarray, w_in),
                             jax.tree.map(jnp.asarray, w_out), top_k=1))
    _, idx = moe_router(jnp.asarray(x), jnp.asarray(gate["kernel"]), 1)
    idx = np.asarray(idx)[..., 0]
    from scail_tpu.models.common import gelu_tanh

    for t in range(s):
        e = idx[0, t]
        want = np.asarray(
            gelu_tanh(jnp.asarray(x[0, t]) @ w_in["kernel"][e]) @ w_out["kernel"][e])
        np.testing.assert_allclose(got[0, t], want, rtol=1e-5, atol=1e-5)


def _moe_dit_setup(rng):
    from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params

    cfg = DiTConfig(
        hidden_size=32, num_layers=2, num_heads=4, inner_hidden_size=48,
        time_embed_dim=32, text_dim=12, clip_dim=10, share_adaln=True,
        use_i2v_clip=True, dtype="float32", attn_impl="xla",
        num_experts=4, moe_top_k=2,
    )
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    assert "mlp_in" not in params["layers"]
    assert params["layers"]["moe_in"]["kernel"].shape == (2, 4, 32, 48)
    b, T, H, W = 1, 2, 8, 8
    inputs = dict(
        x=jnp.asarray(rng.standard_normal((b, T, 16, H, W)).astype(np.float32)),
        timesteps=jnp.asarray([100.0], jnp.float32),
        context=jnp.asarray(rng.standard_normal((b, 7, 12)).astype(np.float32)),
        ref_concat=jnp.asarray(rng.standard_normal((b, 1, 16, H, W)).astype(np.float32)),
        concat_smpl_render=jnp.asarray(
            rng.standard_normal((b, T, 16, H // 2, W // 2)).astype(np.float32)),
        image_clip_features=jnp.asarray(
            rng.standard_normal((b, 5, 10)).astype(np.float32)),
    )
    return cfg, params, dit_forward, inputs


def test_dit_moe_forward_and_grads(rng):
    cfg, params, dit_forward, inp = _moe_dit_setup(rng)

    def f(p):
        out = dit_forward(p, cfg, inp["x"], inp["timesteps"], inp["context"],
                          ref_concat=inp["ref_concat"],
                          concat_smpl_render=inp["concat_smpl_render"],
                          image_clip_features=inp["image_clip_features"])
        return jnp.mean(out ** 2), out

    (val, out), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(val))
    assert out.shape == (1, 2, 16, 8, 8)
    g = grads["layers"]["moe_gate"]["kernel"]
    assert float(jnp.max(jnp.abs(g))) > 0, "router got no gradient"
    ge = grads["layers"]["moe_in"]["kernel"]
    assert float(jnp.max(jnp.abs(ge))) > 0


def test_dit_moe_expert_parallel_matches_single_device(rng):
    """num_experts=4 sharded over 'model' (EP) == replicated forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scail_tpu.models.dit import dit_param_rules
    from scail_tpu.parallel.mesh import DATA_AXIS, MeshSpec, SEQ_AXIS, make_mesh
    from scail_tpu.parallel.sharding import shard_tree

    cfg, params, dit_forward, inp = _moe_dit_setup(rng)
    want = np.asarray(dit_forward(
        params, cfg, inp["x"], inp["timesteps"], inp["context"],
        ref_concat=inp["ref_concat"],
        concat_smpl_render=inp["concat_smpl_render"],
        image_clip_features=inp["image_clip_features"]))

    mesh = make_mesh(MeshSpec(data=1, seq=2, model=2),
                     devices=jax.devices()[:4])
    sp = shard_tree(params, dit_param_rules(), mesh)
    # expert axis is sharded over 'model': 2 experts per device
    shd = sp["layers"]["moe_in"]["kernel"].sharding
    assert shd.spec[1] == "model", shd

    xin = jax.device_put(
        inp["x"], NamedSharding(mesh, P(DATA_AXIS, None, None, None, SEQ_AXIS)))

    @jax.jit
    def run(p, x):
        return dit_forward(p, cfg, x, inp["timesteps"], inp["context"],
                           ref_concat=inp["ref_concat"],
                           concat_smpl_render=inp["concat_smpl_render"],
                           image_clip_features=inp["image_clip_features"],
                           mesh=mesh)

    got = np.asarray(run(sp, xin))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
