"""Engine.shared_step: raw-pixel training step parity pieces + sync checks."""

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.engine import VideoDiffusionEngine
from scail_tpu.testing import tiny_model_config
from scail_tpu.training.sync import check_param_sync, check_value_sync, sync_params_across_ranks
import pytest


@pytest.mark.slow
def test_shared_step_runs_and_differentiable():
    mc = tiny_model_config()
    mc["network_config"]["params"]["dtype"] = "fp32"
    eng = VideoDiffusionEngine(mc)
    eng.init_params(jax.random.PRNGKey(0))

    class _Txt:
        def __call__(self, batch):
            return {"crossattn": jnp.ones((batch["mp4"].shape[0], 7, 12))}

    class _Clip:
        params = object()

        def visual(self, v):
            return jnp.ones((v.shape[0], 5, 10))

    eng.conditioner = _Txt()
    eng.i2v_clip = _Clip()

    rng = np.random.default_rng(0)
    batch = {
        "mp4": jnp.asarray(rng.uniform(-1, 1, (1, 5, 3, 32, 32)).astype(np.float32)),
        "pose": jnp.asarray(rng.uniform(-1, 1, (1, 5, 3, 32, 32)).astype(np.float32)),
        "ref_frame": jnp.asarray(rng.uniform(-1, 1, (1, 1, 3, 32, 32)).astype(np.float32)),
        "txt": ["hi"],
    }

    loss, ld = eng.shared_step(jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    assert "diffusion loss" in ld

    def loss_of(p):
        eng.params["dit"] = p
        l, _ = eng.shared_step(jax.random.PRNGKey(1), batch)
        return l

    g = jax.grad(loss_of)(eng.params["dit"])
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_param_sync_checks():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scail_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=8))
    x = jax.device_put(jnp.ones((8, 4)), NamedSharding(mesh, P()))  # replicated
    assert check_value_sync(x) == 0.0
    params = {"w": x, "b": jnp.zeros((3,))}
    assert check_param_sync(params) == 0.0
    synced = sync_params_across_ranks(params)
    np.testing.assert_array_equal(np.asarray(synced["w"]), np.asarray(params["w"]))
