"""Multi-device tests on the 8-fake-CPU mesh: Ulysses attention parity,
sharded DiT forward parity vs single-device, sharded sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from scail_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS, MeshSpec, make_mesh
from scail_tpu.parallel.ulysses import ulysses_attention
from scail_tpu.ops.attention import attention


def test_ulysses_matches_dense_attention(rng):
    mesh = make_mesh(MeshSpec(data=1, seq=4, model=2))
    b, S, n, d = 2, 64, 8, 16
    q = jnp.asarray(rng.standard_normal((b, S, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, S, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, S, n, d)).astype(np.float32))

    want = np.asarray(attention(q, k, v, impl="xla"))

    spec = NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))

    @jax.jit
    def run(q, k, v):
        return ulysses_attention(q, k, v, mesh, impl="xla")

    got = np.asarray(run(qs, ks, vs))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ulysses_seq1_passthrough(rng):
    mesh = make_mesh(MeshSpec(data=8, seq=1, model=1))
    q = jnp.asarray(rng.standard_normal((8, 16, 4, 8)).astype(np.float32))
    out = ulysses_attention(q, q, q, mesh, impl="xla")
    want = attention(q, q, q, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


def test_ring_attention_matches_dense(rng):
    """KV-ring attention (ppermute over 'seq') == dense full attention —
    the beyond-reference long-sequence alternative to Ulysses (no head
    count constraint: 8 heads over seq=4 x model=2 works, but so would
    seq=16 with 8 heads, where Ulysses cannot go)."""
    from scail_tpu.parallel.ring import ring_attention

    mesh = make_mesh(MeshSpec(data=1, seq=4, model=2))
    b, S, n, d = 2, 64, 8, 16
    q = jnp.asarray(rng.standard_normal((b, S, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, S, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, S, n, d)).astype(np.float32))

    want = np.asarray(attention(q, k, v, impl="xla"))

    spec = NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))

    run = jax.jit(lambda a, b_, c: ring_attention(a, b_, c, mesh))
    got = np.asarray(run(qs, ks, vs))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # the ring must be collective-permutes on 'seq', not a gather
    hlo = run.lower(qs, ks, vs).compile().as_text()
    assert hlo.count("collective-permute") >= 2, (
        hlo.count("collective-permute"))


def test_ring_attention_seq1_passthrough_and_bf16(rng):
    from scail_tpu.parallel.ring import ring_attention

    mesh = make_mesh(MeshSpec(data=8, seq=1, model=1))
    q = jnp.asarray(rng.standard_normal((8, 16, 4, 8)).astype(np.float32))
    out = ring_attention(q, q, q, mesh)
    want = attention(q, q, q, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)

    # bf16 in -> bf16 out with f32 accumulation inside the ring
    mesh = make_mesh(MeshSpec(data=1, seq=4, model=1),
                     devices=jax.devices()[:4])
    qb = jnp.asarray(rng.standard_normal((1, 32, 4, 8))).astype(jnp.bfloat16)
    got = jax.jit(lambda a: ring_attention(a, a, a, mesh))(qb)
    assert got.dtype == jnp.bfloat16
    want = attention(qb.astype(jnp.float32), qb.astype(jnp.float32),
                     qb.astype(jnp.float32), impl="xla")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.06, atol=0.02)


def test_sharded_dit_forward_matches_single_device(rng):
    """TP+SP-sharded DiT forward == replicated forward (XLA SPMD inserts the
    collectives the reference's Column/RowParallel + spatial chunking did)."""
    from scail_tpu.models.dit import DiTConfig, dit_forward, dit_param_rules, init_dit_params
    from scail_tpu.parallel.sharding import shard_tree

    cfg = DiTConfig(
        hidden_size=32, num_layers=2, num_heads=2, inner_hidden_size=48,
        time_embed_dim=32, text_dim=12, clip_dim=10, share_adaln=True,
        use_i2v_clip=True, dtype="float32", attn_impl="xla",
    )
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    b, T, H, W = 2, 2, 8, 8
    x = jnp.asarray(rng.standard_normal((b, T, 16, H, W)).astype(np.float32))
    ts = jnp.asarray([100.0, 200.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 7, 12)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((b, 1, 16, H, W)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((b, T, 16, H // 2, W // 2)).astype(np.float32))
    clip = jnp.asarray(rng.standard_normal((b, 5, 10)).astype(np.float32))

    want = np.asarray(dit_forward(
        params, cfg, x, ts, ctx, ref_concat=ref, concat_smpl_render=pose,
        image_clip_features=clip))

    mesh = make_mesh(MeshSpec(data=2, seq=2, model=2))
    sp = shard_tree(params, dit_param_rules(), mesh)
    xin = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None, None, None, SEQ_AXIS)))

    @jax.jit
    def run(p, x):
        return dit_forward(p, cfg, x, ts, ctx, ref_concat=ref,
                           concat_smpl_render=pose, image_clip_features=clip,
                           mesh=mesh)

    got = np.asarray(run(sp, xin))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    # shard_activations (model-sharded remat carries, the 14B pod-training
    # layout -- scripts/aot_14b_train.py) is numerically a pure layout
    # change: identical output
    import dataclasses

    cfg_sa = dataclasses.replace(cfg, shard_activations=True)

    @jax.jit
    def run_sa(p, x):
        return dit_forward(p, cfg_sa, x, ts, ctx, ref_concat=ref,
                           concat_smpl_render=pose, image_clip_features=clip,
                           mesh=mesh)

    got_sa = np.asarray(run_sa(sp, xin))
    np.testing.assert_allclose(got_sa, want, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_engine_sharded_sampling(rng):
    """engine.sample under a TP+SP mesh == single-device sample (same key)."""
    import dataclasses

    from scail_tpu.engine import VideoDiffusionEngine
    from scail_tpu.testing import tiny_cond, tiny_model_config
    from scail_tpu.models.dit import dit_param_rules
    from scail_tpu.parallel.sharding import shard_tree

    mc = tiny_model_config()
    mc["network_config"]["params"]["dtype"] = "fp32"
    eng = VideoDiffusionEngine(mc)
    eng.init_params(jax.random.PRNGKey(0))
    cond = tiny_cond(jax.random.PRNGKey(1))
    want = np.asarray(eng.sample(jax.random.PRNGKey(2), cond, cond,
                                 batch_size=1, shape=(2, 16, 8, 8)))

    mesh = make_mesh(MeshSpec(data=1, seq=2, model=2), devices=jax.devices()[:4])
    eng.mesh = mesh
    eng.params["dit"] = shard_tree(eng.params["dit"], dit_param_rules(), mesh)

    @jax.jit
    def run(key, cond):
        return eng.sample(key, cond, cond, batch_size=1, shape=(2, 16, 8, 8))

    got = np.asarray(run(jax.random.PRNGKey(2), cond))
    # reduction-order differences compound over the chained denoise steps;
    # require tight overall agreement rather than elementwise exactness
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_engine_ulysses_e2e_sampling_and_collectives(rng):
    """VERDICT r1 item 4: jitted end-to-end engine.sample on a
    (data=1, seq=2, model=4) mesh with attn_impl='ulysses' and
    params-as-jit-args; parity vs single-device AND a mechanical check of
    the compiled HLO's collective structure (all-to-all for the Ulysses
    head<->seq reshard, all-reduce/reduce-scatter for TP) backing
    docs/MULTICHIP.md's communication model."""
    import dataclasses

    from scail_tpu.engine import VideoDiffusionEngine
    from scail_tpu.models.dit import dit_param_rules
    from scail_tpu.parallel.sharding import shard_tree
    from scail_tpu.testing import tiny_cond, tiny_model_config

    mc = tiny_model_config(hidden=32, heads=8, layers=2, inner=48)
    mc["network_config"]["params"]["dtype"] = "fp32"
    mc["sampler_config"]["params"]["num_steps"] = 2
    eng = VideoDiffusionEngine(mc)
    eng.init_params(jax.random.PRNGKey(0))
    cond = tiny_cond(jax.random.PRNGKey(1))
    want = np.asarray(eng.sample(jax.random.PRNGKey(2), cond, cond,
                                 batch_size=1, shape=(2, 16, 8, 8)))

    mesh = make_mesh(MeshSpec(data=1, seq=2, model=4))
    eng.mesh = mesh
    eng.network.config = dataclasses.replace(
        eng.network.config, attn_impl="ulysses")
    params = shard_tree(eng.params["dit"], dit_param_rules(), mesh)

    def run(params, key, cond):
        return eng.sample(key, cond, cond, batch_size=1, shape=(2, 16, 8, 8),
                          params=params)

    jitted = jax.jit(run)
    compiled = jitted.lower(params, jax.random.PRNGKey(2), cond).compile()
    hlo = compiled.as_text()
    counts = {op: hlo.count(f" {op}") for op in
              ("all-to-all", "all-reduce", "all-gather", "reduce-scatter",
               "collective-permute")}
    # Ulysses needs the 2x head<->seq all_to_all (ulysses_attn_layer.py:41-110)
    assert counts["all-to-all"] >= 2, counts
    # TP row-parallel outputs need a reduction (mappings.py:22-34 equivalent)
    assert counts["all-reduce"] + counts["reduce-scatter"] >= 1, counts

    got = np.asarray(jitted(params, jax.random.PRNGKey(2), cond))
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_dit_ulysses_impl_matches(rng):
    """attn_impl='ulysses' inside the DiT == dense attention result."""
    from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params

    base = dict(
        hidden_size=32, num_layers=2, num_heads=4, inner_hidden_size=48,
        time_embed_dim=32, text_dim=12, clip_dim=10, share_adaln=True,
        use_i2v_clip=True, dtype="float32",
    )
    cfg_dense = DiTConfig(**base, attn_impl="xla")
    cfg_uly = DiTConfig(**base, attn_impl="ulysses")
    params = init_dit_params(jax.random.PRNGKey(0), cfg_dense)

    b, T, H, W = 1, 2, 8, 8
    x = jnp.asarray(rng.standard_normal((b, T, 16, H, W)).astype(np.float32))
    ts = jnp.asarray([100.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 7, 12)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((b, 1, 16, H, W)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((b, T, 16, H // 2, W // 2)).astype(np.float32))
    clip = jnp.asarray(rng.standard_normal((b, 5, 10)).astype(np.float32))

    kw = dict(ref_concat=ref, concat_smpl_render=pose, image_clip_features=clip)
    want = np.asarray(dit_forward(params, cfg_dense, x, ts, ctx, **kw))

    mesh = make_mesh(MeshSpec(data=1, seq=2, model=2), devices=jax.devices()[:4])

    @jax.jit
    def run(p, x):
        return dit_forward(p, cfg_uly, x, ts, ctx, mesh=mesh, **kw)

    got = np.asarray(run(params, x))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_vocab_parallel_cross_entropy(rng):
    """Sharded-vocab CE == dense CE, values and grads
    (sat/mpu/cross_entropy.py semantics)."""
    from jax.sharding import NamedSharding

    from scail_tpu.parallel.cross_entropy import vocab_parallel_cross_entropy

    mesh = make_mesh(MeshSpec(data=1, seq=1, model=4),
                     devices=jax.devices()[:4])
    b, s, V = 2, 6, 32
    logits = jnp.asarray(rng.standard_normal((b, s, V)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, V, (b, s)), jnp.int32)

    dense = -jax.nn.log_softmax(logits, axis=-1)
    want = np.asarray(jnp.take_along_axis(dense, targets[..., None], -1)[..., 0])

    lsh = jax.device_put(logits, NamedSharding(mesh, P(None, None, MODEL_AXIS)))
    got = np.asarray(jax.jit(
        lambda l, t: vocab_parallel_cross_entropy(l, t, mesh))(lsh, targets))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    g_want = np.asarray(jax.grad(lambda l: jnp.sum(jnp.take_along_axis(
        -jax.nn.log_softmax(l, -1), targets[..., None], -1)))(logits))
    g_got = np.asarray(jax.jit(jax.grad(lambda l: jnp.sum(
        vocab_parallel_cross_entropy(l, targets, mesh))))(lsh))
    np.testing.assert_allclose(g_got, g_want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_dit_sta_tp_mesh_matches_dense(rng):
    """attn_impl='sta' with a full-coverage window under a TP=2 mesh ==
    unsharded dense attention: the shard_map head split composes with
    the tile-major-resident layout and the scalar-prefetch kernel
    (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from scail_tpu.models.dit import (DiTConfig, dit_forward,
                                      dit_param_rules, init_dit_params)
    from scail_tpu.parallel.sharding import shard_tree

    kw = dict(hidden_size=32, num_layers=2, num_heads=4, inner_hidden_size=48,
              time_embed_dim=32, text_dim=16, clip_dim=8, share_adaln=True,
              use_i2v_clip=True, dtype="float32")
    cfg_d = DiTConfig(**kw, attn_impl="xla")
    cfg_s = DiTConfig(**kw, attn_impl="sta", sta_tile=(1, 2),
                      sta_window=(2, 2))
    params = init_dit_params(jax.random.PRNGKey(0), cfg_d)
    x = jnp.asarray(rng.standard_normal((1, 2, 16, 8, 8)), jnp.float32)
    ts = jnp.asarray([100.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 16)), jnp.float32)
    kws = dict(
        ref_concat=jnp.asarray(rng.standard_normal((1, 1, 16, 8, 8)),
                               jnp.float32),
        concat_smpl_render=jnp.asarray(rng.standard_normal((1, 2, 16, 4, 4)),
                                       jnp.float32),
        image_clip_features=jnp.asarray(rng.standard_normal((1, 5, 8)),
                                        jnp.float32))

    want = np.asarray(dit_forward(params, cfg_d, x, ts, ctx, **kws))
    mesh = make_mesh(MeshSpec(data=1, seq=1, model=2),
                     devices=jax.devices()[:2])
    sp = shard_tree(params, dit_param_rules(), mesh)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.jit(
            lambda p, x: dit_forward(p, cfg_s, x, ts, ctx, mesh=mesh, **kws)
        )(sp, x))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_dit_sta_ulysses_mesh_matches_dense(rng):
    """attn_impl='sta' under a seq=2 x model=2 mesh: the Ulysses head
    scatter hands each shard the full tile-major sequence, the windowed
    kernel runs per head subset, and a full-coverage window equals the
    unsharded dense forward."""
    from jax.experimental.pallas import tpu as pltpu

    from scail_tpu.models.dit import (DiTConfig, dit_forward,
                                      dit_param_rules, init_dit_params)
    from scail_tpu.parallel.sharding import shard_tree

    kw = dict(hidden_size=32, num_layers=2, num_heads=4, inner_hidden_size=48,
              time_embed_dim=32, text_dim=16, clip_dim=8, share_adaln=True,
              use_i2v_clip=True, dtype="float32")
    cfg_d = DiTConfig(**kw, attn_impl="xla")
    cfg_s = DiTConfig(**kw, attn_impl="sta", sta_tile=(1, 2),
                      sta_window=(2, 2))
    params = init_dit_params(jax.random.PRNGKey(0), cfg_d)
    x = jnp.asarray(rng.standard_normal((1, 2, 16, 8, 8)), jnp.float32)
    ts = jnp.asarray([100.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 16)), jnp.float32)
    kws = dict(
        ref_concat=jnp.asarray(rng.standard_normal((1, 1, 16, 8, 8)),
                               jnp.float32),
        concat_smpl_render=jnp.asarray(rng.standard_normal((1, 2, 16, 4, 4)),
                                       jnp.float32),
        image_clip_features=jnp.asarray(rng.standard_normal((1, 5, 8)),
                                        jnp.float32))

    want = np.asarray(dit_forward(params, cfg_d, x, ts, ctx, **kws))
    mesh = make_mesh(MeshSpec(data=1, seq=2, model=2),
                     devices=jax.devices()[:4])
    sp = shard_tree(params, dit_param_rules(), mesh)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.jit(
            lambda p, x: dit_forward(p, cfg_s, x, ts, ctx, mesh=mesh, **kws)
        )(sp, x))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
