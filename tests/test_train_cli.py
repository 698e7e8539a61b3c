"""Train CLI smoke: tiny model + synthetic fixture dirs, 2 iters end to end."""

import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture
def data_root(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    for case in ("a", "b"):
        d = root / case
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (40, 64, 3), np.uint8)).save(d / "ref.png")
        for name in ("driving.gif", "rendered.gif"):
            ims = [Image.fromarray(rng.integers(0, 255, (40, 64, 3), np.uint8))
                   for _ in range(5)]
            ims[0].save(d / name, save_all=True, append_images=ims[1:], duration=60)
    return str(root)


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, data_root, monkeypatch):
    from scail_tpu.testing import tiny_model_config

    mc = tiny_model_config()
    mc["network_config"]["params"]["dtype"] = "fp32"
    # tiny conditioner stub via config is hard; drop text conditioning
    mc.pop("conditioner_config", None)
    mc["use_i2v_clip"] = False
    mc.pop("i2v_clip_config", None)
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump({"model": mc}))

    from scail_tpu.cli.train import main

    # the tiny DiT has text_dim 12; shared_step needs crossattn — patch the
    # engine to synthesize a zero text embedding when no conditioner exists
    from scail_tpu import engine as eng_mod

    orig = eng_mod.VideoDiffusionEngine.shared_step

    def patched(self, key, batch):
        if self.conditioner is None:
            import jax.numpy as jnp

            class _C:
                def __call__(s, b):
                    n = len(b["txt"]) if "txt" in b else b["mp4"].shape[0]
                    return {"crossattn": jnp.zeros((n, 4, 12))}

            self.conditioner = _C()
        return orig(self, key, batch)

    monkeypatch.setattr(eng_mod.VideoDiffusionEngine, "shared_step", patched)

    save = tmp_path / "run"
    main([
        "--base", str(cfg_path),
        "--data-root", data_root,
        "--save", str(save),
        "--train-iters", "2",
        "--image-size", "32", "32",
        "--num-frames", "5",
        "--warmup-iters", "1",
    ])
    assert (save / "latest").exists()
    assert (save / "2" / "state").exists()
    # metrics stream exists once log_interval hits; at 2 iters it may be empty
    assert (save / "model_config.json").exists()


@pytest.mark.slow
def test_train_cli_grad_accum(tmp_path, data_root, monkeypatch):
    """--grad-accum N: the loader yields N x batch_size examples and
    to_device reshapes them to a leading (N, batch, ...) axis the Trainer's
    microbatch loop slices — each microstep must see DIFFERENT examples
    (deepspeed per-microbatch semantics)."""
    from scail_tpu.testing import tiny_model_config

    mc = tiny_model_config()
    mc["network_config"]["params"]["dtype"] = "fp32"
    mc.pop("conditioner_config", None)
    mc["use_i2v_clip"] = False
    mc.pop("i2v_clip_config", None)
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump({"model": mc}))

    from scail_tpu import engine as eng_mod
    from scail_tpu.cli.train import main

    orig = eng_mod.VideoDiffusionEngine.shared_step
    seen_mp4 = []

    def patched(self, key, batch):
        # shapes after Trainer microbatch slicing: (batch_size, ...) with
        # no accum axis
        seen_mp4.append(np.asarray(batch["mp4"].shape))
        if self.conditioner is None:
            import jax.numpy as jnp

            class _C:
                def __call__(s, b):
                    n = len(b["txt"]) if "txt" in b else b["mp4"].shape[0]
                    return {"crossattn": jnp.zeros((n, 4, 12))}

            self.conditioner = _C()
        return orig(self, key, batch)

    monkeypatch.setattr(eng_mod.VideoDiffusionEngine, "shared_step", patched)
    main([
        "--base", str(cfg_path), "--data-root", data_root,
        "--train-iters", "1", "--image-size", "32", "32",
        "--num-frames", "5", "--grad-accum", "2", "--batch-size", "1",
    ])
    # the loss_fn traces once per jit compile; the traced microbatch must
    # already be sliced to (batch_size=1, ...), not (accum*bs) or (accum, bs)
    assert seen_mp4 and all(s[0] == 1 for s in seen_mp4)


@pytest.mark.slow
def test_train_cli_lora(tmp_path, data_root, monkeypatch):
    from scail_tpu.testing import tiny_model_config

    mc = tiny_model_config()
    mc["network_config"]["params"]["dtype"] = "fp32"
    mc.pop("conditioner_config", None)
    mc["use_i2v_clip"] = False
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump({"model": mc}))

    from scail_tpu import engine as eng_mod
    from scail_tpu.cli.train import main

    orig = eng_mod.VideoDiffusionEngine.shared_step

    def patched(self, key, batch):
        if self.conditioner is None:
            import jax.numpy as jnp

            class _C:
                def __call__(s, b):
                    n = len(b["txt"]) if "txt" in b else b["mp4"].shape[0]
                    return {"crossattn": jnp.zeros((n, 4, 12))}

            self.conditioner = _C()
        return orig(self, key, batch)

    monkeypatch.setattr(eng_mod.VideoDiffusionEngine, "shared_step", patched)

    main([
        "--base", str(cfg_path), "--data-root", data_root,
        "--train-iters", "1", "--image-size", "32", "32",
        "--num-frames", "5", "--lora-rank", "2",
    ])
