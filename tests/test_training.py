"""Training engine: EMA-Adam parity vs torch, AnnealingLR, full train loop
with NaN-skip + checkpoint save/resume round trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from scail_tpu.training.ema_adam import EmaAdamState, fused_ema_adam, swap_in_ema
from scail_tpu.training.engine import TrainConfig, Trainer
from scail_tpu.training.lr_schedules import annealing_lr


@pytest.mark.slow
def test_ema_adam_matches_torch_adamw():
    torch.manual_seed(0)
    w0 = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
    tp = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.AdamW([tp], lr=1e-2, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=0.01)

    tx = fused_ema_adam(1e-2, weight_decay=0.01, ema_decay=0.99)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)

    for i in range(5):
        g = np.random.default_rng(i + 1).standard_normal((4, 3)).astype(np.float32)
        tp.grad = torch.tensor(g.copy())
        opt.step()
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    # shadow is an EMA of the updated params
    ema, orig = swap_in_ema(params, state)
    assert ema["w"].shape == (4, 3)
    assert not np.allclose(np.asarray(ema["w"]), np.asarray(params["w"]))


def test_annealing_lr_shapes():
    sch = annealing_lr(1e-3, warmup_iter=10, num_iters=100, decay_style="cosine",
                       decay_ratio=0.1)
    assert float(sch(0)) == 0.0
    np.testing.assert_allclose(float(sch(5)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sch(10)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sch(100)), 1e-4, rtol=1e-4)  # floor
    lin = annealing_lr(1e-3, 0, 100, "linear", 0.0)
    np.testing.assert_allclose(float(lin(50)), 5e-4, rtol=1e-5)


def _quadratic_loss(params, key, batch):
    return jnp.mean((params["w"] @ batch["x"] - batch["y"]) ** 2)


def _data(n=2):
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32)),
        "y": jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32)),
    }
    while True:
        yield batch


def test_trainer_reduces_loss_and_saves(tmp_path):
    params = {"w": jnp.zeros((2, 3))}
    cfg = TrainConfig(train_iters=30, lr=5e-2, warmup_iters=2, log_interval=10,
                      save_interval=15, save_dir=str(tmp_path / "ckpt"),
                      grad_accum=1, clip_grad=10.0)
    tr = Trainer(params, _quadratic_loss, cfg, model_config={"toy": True})
    it = iter(_data())
    first = float(_quadratic_loss(params, None, next(iter(_data()))))
    tr.fit(it)
    last = float(_quadratic_loss(tr.state["params"], None, next(iter(_data()))))
    assert last < first
    assert os.path.exists(tmp_path / "ckpt" / "latest")
    assert (tmp_path / "ckpt" / "model_config.json").exists()

    # resume round trip continues at saved step
    tr2 = Trainer({"w": jnp.zeros((2, 3))}, _quadratic_loss, cfg)
    it_resumed = tr2.resume(str(tmp_path / "ckpt"))
    assert it_resumed == 30
    np.testing.assert_allclose(np.asarray(tr2.state["params"]["w"]),
                               np.asarray(tr.state["params"]["w"]))
    # EMA double-save exists
    assert (tmp_path / "ckpt" / "30" / "ema").exists()


def test_trainer_nan_skip():
    params = {"w": jnp.ones((2,))}

    calls = {"n": 0}

    def loss(params, key, batch):
        # every second call yields NaN
        return jnp.sum(params["w"]) * batch["scale"]

    cfg = TrainConfig(train_iters=4, lr=1e-2, warmup_iters=0, log_interval=100,
                      skip_nan=True)
    tr = Trainer(params, loss, cfg)

    def gen():
        i = 0
        while True:
            yield {"scale": jnp.asarray(np.nan if i % 2 == 0 else 1.0, jnp.float32)}
            i += 1

    tr.fit(gen())
    assert int(tr.state["skipped"]) == 2
    assert np.all(np.isfinite(np.asarray(tr.state["params"]["w"])))


def test_trainer_grad_accum():
    params = {"w": jnp.zeros((2, 3))}
    cfg = TrainConfig(train_iters=5, lr=1e-2, warmup_iters=0, grad_accum=2,
                      log_interval=100)
    tr = Trainer(params, _quadratic_loss, cfg)

    def gen():
        rng = np.random.default_rng(0)
        while True:
            yield {
                "x": jnp.asarray(rng.standard_normal((2, 3, 4)).astype(np.float32)),
                "y": jnp.asarray(rng.standard_normal((2, 2, 4)).astype(np.float32)),
            }

    tr.fit(gen())
    assert int(tr.state["step"]) == 5


def test_metrics_writer_jsonl_and_tensorboard(tmp_path):
    """MetricsWriter fans records to JSONL and tensorboard event files."""
    import json
    import os

    from scail_tpu.utils.metrics_writers import MetricsWriter

    w = MetricsWriter(str(tmp_path), enable_tensorboard=True, run_name="t")
    w.write({"step": 1, "loss": 0.5, "lr": 1e-4})
    w.write({"step": 2, "loss": 0.25, "lr": 9e-5})
    w.flush(); w.close()

    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2 and json.loads(lines[1])["loss"] == 0.25
    run_dir = tmp_path / "runs" / "t"
    assert run_dir.is_dir()
    assert any(f.startswith("events.") for f in os.listdir(run_dir))


def test_checkpoint_manager_async_gc(tmp_path):
    """Async saves commit before `latest` advances; retention keeps the
    newest keep_last plus keep_every multiples; restore is exact."""
    import jax.numpy as jnp

    from scail_tpu.training.checkpoint import (CheckpointManager,
                                               load_checkpoint, read_latest)

    mgr = CheckpointManager(str(tmp_path), keep_last=2, keep_every=4,
                            async_save=True)
    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(0)}
    for it in range(1, 7):
        mgr.save(it, {"w": state["w"] + it, "step": jnp.asarray(it)})
    mgr.close()

    assert read_latest(str(tmp_path)) == "6"
    import os

    kept = sorted(int(d) for d in os.listdir(str(tmp_path)) if d.isdigit())
    # newest two (5, 6) + keep_every=4 multiples (4)
    assert kept == [4, 5, 6], kept

    restored, it = load_checkpoint(str(tmp_path), state)
    assert it == 6
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(state["w"]) + 6)

    # explicit older iteration still restorable
    restored4, _ = load_checkpoint(str(tmp_path), state, iteration=4)
    np.testing.assert_allclose(np.asarray(restored4["w"]),
                               np.asarray(state["w"]) + 4)


def test_checkpoint_tracker_advances_without_next_save(tmp_path):
    """The `latest` tracker advances once the async write commits, NOT
    at the next save()/wait() — a crash between save intervals must not
    lose a fully committed checkpoint (ADVICE r2)."""
    import time

    import jax.numpy as jnp

    from scail_tpu.training.checkpoint import CheckpointManager, read_latest

    mgr = CheckpointManager(str(tmp_path), async_save=True)
    mgr.save(3, {"w": jnp.ones((4,))})
    deadline = time.monotonic() + 20.0
    while read_latest(str(tmp_path)) != "3" and time.monotonic() < deadline:
        time.sleep(0.05)
    assert read_latest(str(tmp_path)) == "3"
    mgr.close()


def test_trainer_train_mask_freezes_leaves():
    """Trainer(train_mask=...) leaves masked-False params untouched while
    the trainable ones move (the LoRA/prefix selective-finetune contract
    wired through cli/train.py)."""
    params = {"frozen": jnp.ones((2, 3)), "lora": jnp.ones((2, 3))}
    mask = {"frozen": False, "lora": True}

    def loss(p, key, batch):
        return jnp.sum((p["frozen"] + p["lora"]) ** 2)

    cfg = TrainConfig(train_iters=5, lr=1e-1, warmup_iters=1, log_interval=10,
                      grad_accum=1, clip_grad=10.0)
    tr = Trainer(params, loss, cfg, train_mask=mask)
    tr.fit(iter(_data()))
    np.testing.assert_array_equal(np.asarray(tr.state["params"]["frozen"]),
                                  np.ones((2, 3)))
    assert np.abs(np.asarray(tr.state["params"]["lora"]) - 1.0).max() > 1e-3


def test_trainer_train_mask_saves_checkpoint(tmp_path):
    """save() must work under train_mask: the EMA state sits inside
    multi_transform's wrapper and frozen leaves carry MaskedNode
    shadows (the LoRA checkpoint path)."""
    params = {"frozen": jnp.ones((2, 3)), "lora": jnp.ones((2, 3))}
    mask = {"frozen": False, "lora": True}

    def loss(p, key, batch):
        return jnp.sum((p["frozen"] + p["lora"]) ** 2)

    cfg = TrainConfig(train_iters=3, lr=1e-1, warmup_iters=1, log_interval=10,
                      save_interval=2, save_dir=str(tmp_path / "ckpt"),
                      grad_accum=1, clip_grad=10.0, async_save=False)
    tr = Trainer(params, loss, cfg, train_mask=mask)
    tr.fit(iter(_data()))
    assert (tmp_path / "ckpt" / "latest").exists()
    # frozen leaf exported unchanged in the EMA params
    ema = tr._ema_state()
    assert ema is not None
