"""JAX InceptionV3 FID extractor: smoke shapes, structural strictness of
the converter, and end-to-end ref/calc FID flow."""

import jax
import numpy as np
import pytest

from scail_tpu.evals.inception import (INCEPTION_STRUCTURE,
                                       inception_features,
                                       inception_params_from_state_dict,
                                       init_inception_params)


@pytest.mark.slow
def test_inception_smoke_features_and_fid(tmp_path):
    params = init_inception_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (3, 3, 96, 96)).astype(np.float32)
    b = rng.uniform(0, 1, (3, 3, 96, 96)).astype(np.float32) ** 2
    fa = np.asarray(inception_features(params, a))
    fb = np.asarray(inception_features(params, b))
    assert fa.shape == (3, 2048) and np.isfinite(fa).all()

    from scail_tpu.evals.fid import fid_from_stats, save_ref_stats

    stats = str(tmp_path / "ref.npz")
    save_ref_stats(fa, stats)
    assert abs(fid_from_stats(fa, stats)) < 1e-6
    assert fid_from_stats(fb, stats) > 0.01


def test_inception_converter_is_strict():
    """The converter demands every expected parameter with the exact
    shape — a structural manifest of the port."""
    params = init_inception_params(jax.random.PRNGKey(0))
    sd = {}
    for block, spec in INCEPTION_STRUCTURE.items():
        units = {None: spec} if isinstance(spec, tuple) else spec
        for unit, (cin, cout, kh, kw) in units.items():
            stem = block if unit is None else f"{block}.{unit}"
            sd[f"{stem}.conv.weight"] = np.zeros((cout, cin, kh, kw), np.float32)
            sd[f"{stem}.bn.weight"] = np.ones((cout,), np.float32)
            sd[f"{stem}.bn.bias"] = np.zeros((cout,), np.float32)
            sd[f"{stem}.bn.running_mean"] = np.zeros((cout,), np.float32)
            sd[f"{stem}.bn.running_var"] = np.ones((cout,), np.float32)
    out = inception_params_from_state_dict(sd)
    # same tree structure as the random init
    assert jax.tree.structure(out) == jax.tree.structure(params)

    bad = dict(sd)
    bad["Mixed_7c.branch1x1.conv.weight"] = np.zeros((8, 8, 1, 1), np.float32)
    with pytest.raises(AssertionError):
        inception_params_from_state_dict(bad)
