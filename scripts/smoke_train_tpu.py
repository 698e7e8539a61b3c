"""On-device training smoke: a few real optimizer steps of the full path
(VAE encodes -> DiT with Pallas flash fwd+bwd -> EMA-Adam) on whatever
accelerator is present.  Measured on v5e-1: ~30 it/s at toy scale after a
~2 min compile.

Usage: python scripts/smoke_train_tpu.py [--iters 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from scail_tpu.engine import VideoDiffusionEngine
    from scail_tpu.testing import tiny_model_config
    from scail_tpu.training.engine import TrainConfig, Trainer

    # head_dim 128 so the Pallas flash kernel + custom VJP engage on TPU
    mc = tiny_model_config(hidden=256, heads=2, layers=2, inner=512)
    mc["network_config"]["params"]["dtype"] = "bf16"
    eng = VideoDiffusionEngine(mc)
    eng.init_params(jax.random.PRNGKey(0))

    class _Txt:
        def __call__(self, batch):
            return {"crossattn": jnp.ones((batch["mp4"].shape[0], 7, 12), jnp.bfloat16)}

    class _Clip:
        params = object()

        def visual(self, v):
            return jnp.ones((v.shape[0], 5, 10), jnp.bfloat16)

    eng.conditioner = _Txt()
    eng.i2v_clip = _Clip()

    rng = np.random.default_rng(0)
    batch = {
        "mp4": jnp.asarray(rng.uniform(-1, 1, (1, 5, 3, 64, 64)).astype(np.float32)),
        "pose": jnp.asarray(rng.uniform(-1, 1, (1, 5, 3, 64, 64)).astype(np.float32)),
        "ref_frame": jnp.asarray(rng.uniform(-1, 1, (1, 1, 3, 64, 64)).astype(np.float32)),
    }

    def loss_fn(p, key, b):
        eng.params["dit"] = p
        loss, _ = eng.shared_step(key, b)
        return loss

    trainer = Trainer(eng.params["dit"], loss_fn,
                      TrainConfig(train_iters=args.iters, lr=1e-4,
                                  warmup_iters=1, log_interval=1))

    def gen():
        while True:
            yield batch

    t0 = time.perf_counter()
    trainer.fit(gen())
    print(f"{args.iters} train steps OK in {time.perf_counter() - t0:.1f}s "
          f"(incl compile) on {jax.devices()[0]}; skipped={int(trainer.state['skipped'])}")


if __name__ == "__main__":
    main()
