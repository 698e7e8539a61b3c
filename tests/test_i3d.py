"""JAX I3D golden parity vs the reference's vendored pytorch_i3d.py
(random weights + randomized BN running stats), plus smoke-mode shapes.
"""

import importlib.util
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scail_tpu.evals.i3d import (i3d_logits, i3d_params_from_state_dict,
                                 init_i3d_params)


def _load_ref_i3d_module():
    path = "/root/reference/eval/fvd/videogpt/pytorch_i3d.py"
    spec = importlib.util.spec_from_file_location("ref_pytorch_i3d", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_pytorch_i3d"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_i3d_smoke_shapes():
    params = init_i3d_params(jax.random.PRNGKey(0))
    x = np.zeros((2, 3, 16, 224, 224), np.float32)
    out = np.asarray(i3d_logits(params, x))
    assert out.shape == (2, 400)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_fvd_smoke_mode_end_to_end(tmp_path):
    """compute_fvd runs without external weights (random-init I3D):
    self-distance ~ 0, distinct-distribution distance > 0."""
    from scail_tpu.evals.fvd import compute_fvd

    rng = np.random.default_rng(0)
    real = rng.uniform(0.0, 0.8, (3, 16, 64, 64, 3)).astype(np.float32)
    fake = rng.uniform(0.2, 1.0, (3, 16, 64, 64, 3)).astype(np.float32)

    self_fvd = compute_fvd(real, real)
    cross_fvd = compute_fvd(real, fake)
    assert abs(self_fvd) < 1e-3
    assert cross_fvd > self_fvd + 1.0


@pytest.mark.slow
def test_i3d_golden_vs_reference():
    ref_mod = _load_ref_i3d_module()
    torch.manual_seed(0)
    ref = ref_mod.InceptionI3d(400, in_channels=3).eval()
    # randomize BN running stats so the eval-mode normalization is exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.normal_(0.0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0.0, 0.1)

    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    params = i3d_params_from_state_dict(sd)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, 3, 16, 224, 224)) * 0.5).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    got = np.asarray(jax.jit(i3d_logits)(params, x))
    assert got.shape == want.shape == (1, 400)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
