"""Multi-host bring-up (parallel/distributed.py + cli/train.py): a REAL
2-process jax.distributed run on CPU (gloo collectives, coordinator on
localhost) driving the train CLI end to end with per-host data sharding —
the reference's initialize_distributed + dp-sharded loaders contract
(arguments.py:241-339, sat/data_utils/configure_data.py:168)."""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_initialize_distributed_noop_single_process(monkeypatch):
    from scail_tpu.parallel.distributed import initialize_distributed

    monkeypatch.delenv("WORLD_SIZE", raising=False)
    monkeypatch.delenv("OMPI_COMM_WORLD_SIZE", raising=False)
    assert initialize_distributed() is False


def test_trainer_applies_param_shardings():
    """Trainer(param_shardings=...) lays out params AND optimizer state on
    the mesh (the ZeRO role of deepspeed_training.py:326-336)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from scail_tpu.training.engine import TrainConfig, Trainer

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    params = {"w": jnp.ones((8, 16)), "b": jnp.ones((16,))}
    shardings = {"w": NamedSharding(mesh, P(None, "model")),
                 "b": NamedSharding(mesh, P())}

    def loss_fn(p, key, batch):
        return jnp.mean((batch["x"] @ p["w"] + p["b"]) ** 2)

    tr = Trainer(params, loss_fn, TrainConfig(train_iters=1, warmup_iters=1),
                 param_shardings=shardings)
    assert tr.state["params"]["w"].sharding.spec == P(None, "model")
    # optimizer-state leaves shaped like w inherit w's sharding via jit init
    mu_shardings = [x.sharding.spec for x in jax.tree.leaves(tr.state["opt_state"])
                    if hasattr(x, "shape") and x.shape == (8, 16)]
    assert mu_shardings and all(s == P(None, "model") for s in mu_shardings)
    state, metrics = tr._jit_step(tr.state, {"x": jnp.ones((4, 8))})
    assert state["params"]["w"].sharding.spec == P(None, "model")
    assert bool(np.isfinite(float(metrics["loss"])))


def test_trainer_shards_masked_opt_state():
    """With train_mask (multi_transform wraps the moments and swaps frozen
    leaves for MaskedNode), the trainable moments must STILL inherit the
    param shardings — a structural treedef match would silently replicate
    every moment and defeat the ZeRO layout."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from scail_tpu.training.engine import TrainConfig, Trainer

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    params = {"w": jnp.ones((8, 16)), "frozen": jnp.ones((4,))}
    shardings = {"w": NamedSharding(mesh, P(None, "model")),
                 "frozen": NamedSharding(mesh, P())}
    mask = {"w": True, "frozen": False}

    def loss_fn(p, key, batch):
        return jnp.mean((batch["x"] @ p["w"]) ** 2) + jnp.sum(p["frozen"]) * 0.0

    tr = Trainer(params, loss_fn, TrainConfig(train_iters=1, warmup_iters=1),
                 param_shardings=shardings, train_mask=mask)
    mu_shardings = [x.sharding.spec for x in jax.tree.leaves(tr.state["opt_state"])
                    if hasattr(x, "shape") and x.shape == (8, 16)]
    assert mu_shardings and all(s == P(None, "model") for s in mu_shardings)
    state, metrics = tr._jit_step(tr.state, {"x": jnp.ones((4, 8))})
    # frozen leaf untouched, trainable leaf still sharded
    np.testing.assert_array_equal(np.asarray(state["params"]["frozen"]),
                                  np.ones((4,), np.float32))
    assert state["params"]["w"].sharding.spec == P(None, "model")
    assert bool(np.isfinite(float(metrics["loss"])))


@pytest.fixture
def mh_data_root(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    # 8 examples: the sampler shards by rank, 4 per host
    for case in "abcdefgh":
        d = root / case
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (40, 64, 3), np.uint8)).save(d / "ref.png")
        for name in ("driving.gif", "rendered.gif"):
            ims = [Image.fromarray(rng.integers(0, 255, (40, 64, 3), np.uint8))
                   for _ in range(5)]
            ims[0].save(d / name, save_all=True, append_images=ims[1:], duration=60)
    return str(root)


@pytest.mark.slow
def test_train_cli_two_process_distributed(tmp_path, mh_data_root):
    """2 processes x 1 virtual CPU device each: jax.distributed init
    through the MASTER_ADDR/WORLD_SIZE/RANK env contract, global (data=2)
    mesh, per-host loader slices assembled into global batches, 2 sharded
    train steps.  Covers parallel/distributed.py end to end (round-3
    verdict: the multi-host path had zero tests).  One device per process:
    this box has a single CPU core, and two 4-device processes skew past
    the coordination-service barriers (observed SIGABRT at the shutdown
    barrier)."""
    from scail_tpu.testing import tiny_model_config

    mc = tiny_model_config()
    mc["network_config"]["params"]["dtype"] = "fp32"
    mc.pop("conditioner_config", None)
    mc["use_i2v_clip"] = False
    mc.pop("i2v_clip_config", None)
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump({"model": mc}))

    driver = textwrap.dedent("""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        import jax
        jax.config.update("jax_platforms", "cpu")

        # same conditioner stub as the single-host CLI test: the tiny DiT
        # wants a crossattn input the tiny YAML doesn't provide
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
        eng_mod.VideoDiffusionEngine.shared_step = patched

        from scail_tpu.cli.train import main

        # file barrier AFTER the heavy imports: on a loaded single-core
        # host the two ranks' import phases can skew >30s, which trips
        # gloo's internal GetKeyValue deadline inside
        # jax.distributed.initialize (observed DEADLINE_EXCEEDED under a
        # concurrent suite); synchronizing here makes init start
        # simultaneously regardless of load
        import pathlib, time
        sync = pathlib.Path(sys.argv[3])
        (sync / ("r" + os.environ["RANK"] + ".ready")).touch()
        t0 = time.time()
        while len(list(sync.glob("r*.ready"))) < 2:
            assert time.time() - t0 < 600, "peer never reached the barrier"
            time.sleep(0.2)

        main(["--base", sys.argv[1], "--data-root", sys.argv[2],
              "--train-iters", "2", "--image-size", "32", "32",
              "--num-frames", "5", "--warmup-iters", "1",
              "--batch-size", "1", "--distributed"])
        assert jax.process_count() == 2, jax.process_count()
        assert jax.device_count() == 2, jax.device_count()
        print("MH_OK", jax.process_index(), flush=True)
    """)
    def attempt(sync_dir):
        port = _free_port()
        procs = []
        for rank in range(2):
            env = {k: v for k, v in os.environ.items()
                   if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
            env.update(MASTER_ADDR="localhost", MASTER_PORT=str(port),
                       WORLD_SIZE="2", RANK=str(rank))
            procs.append(subprocess.Popen(
                [sys.executable, "-u", "-c", driver, str(cfg_path),
                 mh_data_root, str(sync_dir)],
                cwd=REPO, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))
        outs, errs = [], []
        for p in procs:
            try:
                out, err = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
            errs.append(err)
        ok = (all(p.returncode == 0 for p in procs)
              and all(f"MH_OK {r}" in outs[r] for r in range(2)))
        return ok, outs, errs

    sync1 = tmp_path / "sync1"
    sync1.mkdir()
    ok, outs, errs = attempt(sync1)
    if not ok:
        # gloo's KV rendezvous inside CPU collectives has a HARDCODED 30s
        # deadline; on this single-core box a COLD persistent-compile
        # cache makes the two ranks' jit compiles skew past it (warm
        # caches pass reliably).  Retry once for exactly that signature
        # -- the first attempt populated the cache; anything else fails
        # loudly.
        blob = "\n".join(errs)
        transient = ("DEADLINE_EXCEEDED" in blob
                     or "Shutdown barrier" in blob)
        assert transient, f"non-timeout failure:\n{blob[-4000:]}"
        # A genuinely intermittent multi-host hang that happens to print
        # DEADLINE_EXCEEDED would be masked by this retry on a 1-core
        # box.  On hosts with spare cores the compile-skew excuse doesn't
        # apply, so there the first attempt must already pass.
        assert os.cpu_count() <= 2, (
            f"retry only justified by 1-core compile skew; this "
            f"{os.cpu_count()}-core host should pass first "
            f"try:\n{blob[-4000:]}")
        sync2 = tmp_path / "sync2"
        sync2.mkdir()
        ok, outs, errs = attempt(sync2)
        assert ok, f"failed twice:\n{errs[0][-2000:]}\n{errs[1][-2000:]}"
