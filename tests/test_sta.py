"""Sliding-tile attention (ops/sta.py): parity with masked dense
attention under the equivalent block mask, and exact equality with
dense attention when the window covers every tile."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from scail_tpu.ops.sta import sta_attention, sta_block_mask

T, HP, WP = 4, 4, 8
REF, POSE = 8, 12
S = REF + T * HP * WP + POSE


def _masked_dense(q, k, v, mask, scale):
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(jnp.asarray(mask)[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnqk,bknd->bqnd", probs.astype(v.dtype), v)


def _qkv(seed):
    rng = np.random.default_rng(seed)
    shp = (2, S, 2, 128)
    return [jnp.asarray(rng.standard_normal(shp), jnp.float32)
            for _ in range(3)]


@pytest.mark.parametrize("window", [(1, 1), (2, 1)])
def test_sta_matches_masked_dense(window):
    q, k, v = _qkv(0)
    scale = 1.0 / math.sqrt(q.shape[-1])
    kw = dict(grid_thw=(T, HP, WP), ref_len=REF, pose_len=POSE,
              tile=(2, 2), window=window)
    with pltpu.force_tpu_interpret_mode():
        got = sta_attention(q, k, v, **kw)
    mask = sta_block_mask(S, (T, HP, WP), REF, POSE, (2, 2), window)
    want = _masked_dense(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sta_full_window_equals_dense():
    q, k, v = _qkv(1)
    scale = 1.0 / math.sqrt(q.shape[-1])
    with pltpu.force_tpu_interpret_mode():
        got = sta_attention(q, k, v, grid_thw=(T, HP, WP), ref_len=REF,
                            pose_len=POSE, tile=(2, 2), window=(2, 2))
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    want = jnp.einsum("bnqk,bknd->bqnd", probs, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sta_mask_structure():
    mask = sta_block_mask(S, (T, HP, WP), REF, POSE, (2, 2), (1, 1))
    glob = np.r_[np.arange(REF), np.arange(S - POSE, S)]
    assert mask[glob].all()          # global queries are dense
    assert mask[:, glob].all()       # everyone attends global tokens
    vid = np.setdiff1d(np.arange(S), glob)
    sub = mask[np.ix_(vid, vid)]
    assert not sub.all() and sub.any()   # genuinely sparse video block
    assert np.diag(sub).all()            # every video token sees itself


# windowed-pose variant needs the real SCAIL pose geometry
POSE_W = T * (HP // 2) * (WP // 2)
S_W = REF + T * HP * WP + POSE_W


@pytest.mark.parametrize("window", [(1, 1), (2, 2)])
def test_sta_windowed_pose_matches_masked_dense(window):
    rng = np.random.default_rng(7)
    shp = (2, S_W, 2, 128)
    q, k, v = [jnp.asarray(rng.standard_normal(shp), jnp.float32)
               for _ in range(3)]
    scale = 1.0 / math.sqrt(q.shape[-1])
    with pltpu.force_tpu_interpret_mode():
        got = sta_attention(q, k, v, grid_thw=(T, HP, WP), ref_len=REF,
                            pose_len=POSE_W, tile=(2, 2), window=window,
                            windowed_pose=True)
    mask = sta_block_mask(S_W, (T, HP, WP), REF, POSE_W, (2, 2), window,
                          windowed_pose=True)
    want = _masked_dense(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    if window == (2, 2):
        # full window: windowed-pose == dense attention exactly
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        dense = jnp.einsum("bnqk,bknd->bqnd",
                           jax.nn.softmax(logits, axis=-1), v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                   rtol=2e-4, atol=2e-4)


def test_sta_windowed_pose_restricts_pose_queries():
    m_dense_pose = sta_block_mask(S_W, (T, HP, WP), REF, POSE_W, (2, 2),
                                  (1, 1), windowed_pose=False)
    m_win_pose = sta_block_mask(S_W, (T, HP, WP), REF, POSE_W, (2, 2),
                                (1, 1), windowed_pose=True)
    pose = np.arange(S_W - POSE_W, S_W)
    vid = np.arange(REF, REF + T * HP * WP)
    assert m_dense_pose[np.ix_(pose, vid)].all()
    sub = m_win_pose[np.ix_(pose, vid)]
    assert sub.any() and not sub.all()
    # everyone still sees pose and ref; ref queries stay dense
    assert m_win_pose[:, pose].all() and m_win_pose[:REF].all()


# pose-kv windowing needs n_h % 4 == 0: use HP=8 with tile_h=2
T2, HP2, WP2 = 4, 8, 8
POSE2 = T2 * (HP2 // 2) * (WP2 // 2)
S2 = REF + T2 * HP2 * WP2 + POSE2


@pytest.mark.parametrize("pkw,window", [(1, (2, 2)), (4, (2, 4))])
def test_sta_pose_kv_window_matches_masked_dense(pkw, window):
    rng = np.random.default_rng(9)
    shp = (1, S2, 2, 128)
    q, k, v = [jnp.asarray(rng.standard_normal(shp), jnp.float32)
               for _ in range(3)]
    scale = 1.0 / math.sqrt(q.shape[-1])
    kw = dict(grid_thw=(T2, HP2, WP2), ref_len=REF, pose_len=POSE2,
              tile=(2, 2), window=window, windowed_pose=True,
              pose_kv_window=pkw)
    with pltpu.force_tpu_interpret_mode():
        got = sta_attention(q, k, v, **kw)
    mask = sta_block_mask(S2, (T2, HP2, WP2), REF, POSE2, (2, 2), window,
                          windowed_pose=True, pose_kv_window=pkw)
    want = _masked_dense(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    if pkw == 4:
        # windows cover every tile and strip: STA == dense
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        dense = jnp.einsum("bnqk,bknd->bqnd",
                           jax.nn.softmax(logits, axis=-1), v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                   rtol=2e-4, atol=2e-4)


def test_sta_pose_kv_window_mask_structure():
    m = sta_block_mask(S2, (T2, HP2, WP2), REF, POSE2, (2, 2), (1, 1),
                       windowed_pose=True, pose_kv_window=1)
    pose = np.arange(S2 - POSE2, S2)
    vid = np.arange(REF, REF + T2 * HP2 * WP2)
    sub = m[np.ix_(vid, pose)]
    assert sub.any() and not sub.all()   # video->pose now restricted
    assert m[:, :REF].all()              # ref stays visible to everyone
    assert m[:REF].all()                 # ref queries dense
    assert np.diag(m).all()              # self-attention intact


def _grad_pair(fn_got, fn_want, q, k, v):
    """Gradients of a scalar readout through both attentions."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * w)

    got = jax.grad(loss(fn_got), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss(fn_want), argnums=(0, 1, 2))(q, k, v)
    return got, want


@pytest.mark.parametrize("window", [(1, 1), (2, 1)])
def test_sta_grads_match_masked_dense(window):
    """The windowed custom VJP (dq table walk + inverse-table dk/dv) is
    exact vs autodiff through the masked-dense oracle."""
    q, k, v = _qkv(11)
    scale = 1.0 / math.sqrt(q.shape[-1])
    kw = dict(grid_thw=(T, HP, WP), ref_len=REF, pose_len=POSE,
              tile=(2, 2), window=window)
    mask = sta_block_mask(S, (T, HP, WP), REF, POSE, (2, 2), window)
    with pltpu.force_tpu_interpret_mode():
        got, want = _grad_pair(
            lambda q, k, v: sta_attention(q, k, v, **kw),
            lambda q, k, v: _masked_dense(q, k, v, mask, scale), q, k, v)
    for g, w_, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")


def test_sta_grads_production_tile_misaligned_ts():
    """Gradient parity at the PRODUCTION tile row counts: tile (3, 8) at
    Wp=56 gives ts = 1344 and pose q-tile ts//4 = 336 -- neither a
    multiple of 128, so this permanently covers the lane-padding path of
    the trainable VJP (round-3 snapshot regression: an unpadded lse
    layout asserted ts_q % 128 == 0 and broke STA training at every real
    geometry).  T=3, Hp=8 keeps the grid to one tile so the dense oracle
    stays CPU-sized while ts/ts_q match production exactly."""
    t, hp, wp = 3, 8, 56
    pose = t * (hp // 2) * (wp // 2)          # 336
    ref = 8
    s = ref + t * hp * wp + pose              # 8 + 1344 + 336
    assert (3 * 8 * wp) % 128 != 0 and (3 * 8 * wp // 4) % 128 != 0
    rng = np.random.default_rng(17)
    shp = (1, s, 2, 128)
    q, k, v = [jnp.asarray(rng.standard_normal(shp), jnp.float32)
               for _ in range(3)]
    scale = 1.0 / math.sqrt(q.shape[-1])
    kw = dict(grid_thw=(t, hp, wp), ref_len=ref, pose_len=pose,
              tile=(3, 8), window=(1, 1), windowed_pose=True)
    mask = sta_block_mask(s, (t, hp, wp), ref, pose, (3, 8), (1, 1),
                          windowed_pose=True)
    with pltpu.force_tpu_interpret_mode():
        got, want = _grad_pair(
            lambda q, k, v: sta_attention(q, k, v, **kw),
            lambda q, k, v: _masked_dense(q, k, v, mask, scale), q, k, v)
    for g, w_, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")


def test_sta_grads_windowed_pose_and_pose_kv():
    """Gradient parity for the full production sparsity: windowed pose
    queries + temporally windowed pose kv."""
    rng = np.random.default_rng(13)
    shp = (1, S2, 2, 128)
    q, k, v = [jnp.asarray(rng.standard_normal(shp), jnp.float32)
               for _ in range(3)]
    scale = 1.0 / math.sqrt(q.shape[-1])
    kw = dict(grid_thw=(T2, HP2, WP2), ref_len=REF, pose_len=POSE2,
              tile=(2, 2), window=(2, 2), windowed_pose=True,
              pose_kv_window=1)
    mask = sta_block_mask(S2, (T2, HP2, WP2), REF, POSE2, (2, 2), (2, 2),
                          windowed_pose=True, pose_kv_window=1)
    with pltpu.force_tpu_interpret_mode():
        got, want = _grad_pair(
            lambda q, k, v: sta_attention(q, k, v, **kw),
            lambda q, k, v: _masked_dense(q, k, v, mask, scale), q, k, v)
    for g, w_, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.slow
def test_engine_sample_sta_matches_dense():
    """engine.sample with attn_impl='sta' (full-coverage window) ==
    dense sampling, end to end through the RF sampler — the CLI
    --attn-impl sta path (sampler loop + tile-major residency +
    interpret kernel on CPU)."""
    import dataclasses

    from scail_tpu.engine import VideoDiffusionEngine
    from scail_tpu.testing import tiny_cond, tiny_model_config

    mc = tiny_model_config()
    mc["network_config"]["params"]["dtype"] = "fp32"
    mc["sampler_config"]["params"]["num_steps"] = 2
    eng = VideoDiffusionEngine(mc)
    eng.init_params(jax.random.PRNGKey(0))
    cond = tiny_cond(jax.random.PRNGKey(1))

    want = np.asarray(eng.sample(jax.random.PRNGKey(2), cond, cond,
                                 batch_size=1, shape=(2, 16, 8, 8)))
    eng.network.config = dataclasses.replace(
        eng.network.config, attn_impl="sta", sta_tile=(1, 2),
        sta_window=(2, 2))
    got = np.asarray(eng.sample(jax.random.PRNGKey(2), cond, cond,
                                batch_size=1, shape=(2, 16, 8, 8)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("geom", ["aligned", "unaligned_pose"])
def test_sta_train_grad_aot_mosaic_lowering(geom):
    """Regression: AOT-compile grad-through-sta_attention for REAL TPU via
    the chipless v5e topology, so Mosaic's block-shape checks actually run
    (interpret mode skips them).  Round 3 on-chip bug: the training lse
    residual's (1, 1, ts_pad) block over (B, nq, ts_pad) violated the
    sublane rule whenever nq > 1 and the whole STA train step failed to
    lower on hardware while every CPU test stayed green.

    'aligned': ts lane-aligned, nq > 1 (arms the sublane-rule trap).
    'unaligned_pose': ts = 224 and pose ts_q = 56, neither %128 -- the
    trainable VJP's query-tile lane padding must produce Mosaic-legal
    blocks (round-4 coverage for the round-3 snapshot regression)."""
    import os
    import subprocess
    import sys

    from tests.test_aot_14b import REPO, _tpu_plugin_available

    if not _tpu_plugin_available():
        pytest.skip("TPU compiler plugin not importable on this host")
    geoms = {
        # Wp=128 keeps ts (=2*2*128) lane-aligned; 2x2 tiles of a (4,4)
        # grid give nq=4 video query tiles
        "aligned": """
kw = dict(grid_thw=(4, 4, 128), ref_len=128, pose_len=0,
          tile=(2, 2), window=(2, 2))
s = 4 * 4 * 128 + 128
""",
        # ts = 2*2*56 = 224 (%128 != 0), pose q tile 56 (%128 != 0):
        # exercises the padded-tile path at a misaligned geometry like
        # the production tile (3,8)@Wp=56 (ts=1344, pose 336)
        "unaligned_pose": """
kw = dict(grid_thw=(4, 4, 56), ref_len=128,
          pose_len=4 * 2 * 28, tile=(2, 2), window=(2, 2),
          windowed_pose=True)
s = 128 + 4 * 4 * 56 + 4 * 2 * 28
""",
    }
    code = """
import numpy as np, jax, jax.numpy as jnp
from scail_tpu.utils.platform import force_platform
force_platform("cpu")
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scail_tpu.ops.sta import sta_attention

# v5e:2x2 = one full host (libtpu rejects sub-host layouts like 1x1)
topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2")
mesh = Mesh(np.array(topo.devices), ("x",))
""" + geoms[geom] + """
def loss(q, k, v):
    return jnp.sum(sta_attention(q, k, v, **kw).astype(jnp.float32) ** 2)

sh = NamedSharding(mesh, P())
st = jax.ShapeDtypeStruct((1, s, 1, 128), jnp.bfloat16)
jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
        in_shardings=(sh, sh, sh)).lower(st, st, st).compile()
print("MOSAIC_OK")
"""
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "MOSAIC_OK" in proc.stdout


def test_sta_executed_pairs_matches_block_mask():
    """sta_executed_pairs (the BENCH executed-FLOPs counter) == the
    block-mask oracle's attended-pair count on pad-free geometries, in
    all three window modes."""
    from scail_tpu.ops.sta import sta_block_mask, sta_executed_pairs

    cases = [
        # (T, Hp, Wp, ref, pose, tile, window, windowed_pose, pkw)
        (4, 4, 8, 64, 32, (2, 2), (2, 2), False, 0),
        (4, 8, 8, 64, 64, (2, 2), (2, 2), True, 0),
        (6, 8, 16, 96, 192, (3, 2), (3, 2), True, 2),
    ]
    for T, Hp, Wp, ref, pose, tile, win, wp, pkw in cases:
        s = ref + T * Hp * Wp + pose
        mask = sta_block_mask(s, (T, Hp, Wp), ref, pose, tile, win,
                              windowed_pose=wp, pose_kv_window=pkw)
        ex = sta_executed_pairs((T, Hp, Wp), ref, pose, tile, win,
                                windowed_pose=wp, pose_kv_window=pkw)
        assert ex == int(mask.sum()), (T, Hp, Wp, tile, win, wp, pkw)
    # production geometry: the sparse step executes ~33% of dense
    # self-attention pairs (pad included -- what the kernel really runs)
    ex = sta_executed_pairs((21, 32, 56), 1792, 9408, (3, 8), (3, 2),
                            windowed_pose=True, pose_kv_window=3)
    assert abs(ex / 48832 ** 2 - 0.329) < 0.002
