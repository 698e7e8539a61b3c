"""Checkpoint conversion end to end: a fake SCAIL-Preview tree (torch .pt in
SAT layout, from the oracle models) -> scripts/convert_checkpoint.py ->
engine.load_orbax -> forward sanity."""

import json
import os
import subprocess
import sys

import numpy as np
import torch
import yaml
import pytest


@pytest.mark.slow
def test_convert_checkpoint_roundtrip(tmp_path):
    from oracles import OracleDiT
    from oracle_vae import OracleWanVAE

    src = tmp_path / "SCAIL-Preview"
    (src / "model" / "7").mkdir(parents=True)
    (src / "model" / "latest").write_text("7")

    torch.manual_seed(0)
    oracle = OracleDiT(hidden=32, heads=2, layers=2, inner=48, in_ch=20, out_ch=16,
                       patch=(1, 2, 2), text_dim=12, time_freq=16, clip_dim=10)
    sd = {"model.diffusion_model." + k: v for k, v in oracle.state_dict().items()}
    torch.save({"module": sd}, src / "model" / "7" / "mp_rank_00_model_states.pt")

    vae = OracleWanVAE(dim=8, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
                       temporal_down=(False, True, True))
    torch.save(vae.state_dict(), src / "Wan2.1_VAE.pth")

    # tiny yaml matching the oracle dims
    model_yaml = tmp_path / "tiny.yaml"
    model_yaml.write_text(yaml.safe_dump({"model": {"network_config": {"params": {
        "hidden_size": 32, "num_layers": 2, "num_attention_heads": 2,
        "inner_hidden_size": 48, "in_channels": 20, "out_channels": 16,
        "patch_size": [1, 2, 2], "text_dim": 12, "time_freq_dim": 16,
        "time_embed_dim": 32, "share_adaln": True, "elementwise_affine": False,
        "clip_dim": 10,
        "modules": {
            "pos_embed_config": {"params": {"interleaved_rope": True}},
            "adaln_layer_config": {"params": {"qk_ln": True, "qk_ln_affine": True}},
        },
    }}}}))

    dst = tmp_path / "converted"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/convert_checkpoint.py", str(src), str(dst),
         "--model-yaml", str(model_yaml)],
        capture_output=True, text=True, env=env, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    manifest = json.loads((dst / "manifest.json").read_text())
    assert set(manifest) == {"dit", "vae"}

    # load through the engine and run a forward
    import jax
    import jax.numpy as jnp

    from scail_tpu.engine import VideoDiffusionEngine
    from scail_tpu.testing import tiny_cond, tiny_model_config

    mc = tiny_model_config()
    mc["network_config"]["params"]["dtype"] = "fp32"
    mc["first_stage_config"]["params"]["z_dim"] = 4
    eng = VideoDiffusionEngine(mc)
    eng.load_orbax(str(dst))
    assert "dit" in eng.params
    assert eng.first_stage_model.params is not None

    cond = tiny_cond(jax.random.PRNGKey(1))
    out = eng.sample(jax.random.PRNGKey(0), cond, cond, batch_size=1,
                     shape=(2, 16, 8, 8))
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
