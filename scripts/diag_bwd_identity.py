"""Same-session confirmation of the bwd ceiling identity (docs/TRAINING.md).

Runs, in ONE process so chip state divides out:
  probe -> flash dq+dkv per-layer time at the production shape
        -> bench_train_step mode=fwd / mode=grad / mode=step @ save_frac 0.7

Reports the identity terms:
  - attn-bwd executed rate (7-matmul flops / measured pass time)
  - optimizer+epilogue residual (step - grad)
  - executed-FLOPs step rate vs the probe

Usage: python scripts/diag_bwd_identity.py [--iters 2]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# identity constants at the 1.3B 512p geometry (docs/TRAINING.md tables)
FWD_TF = 568.78          # counted forward
EXEC_TF_07 = 2632.29     # executed flops @ save_attn_frac=0.7
ATTN_BWD_EXEC_TF_LAYER = 51.28   # 3.5 x 4*S^2*h per layer / 1e12


def probe(tag):
    from scail_tpu.utils.benchmarking import calibration_probe

    r = calibration_probe()
    print(f"probe[{tag}]: {r['probe_matmul_tflops']:.1f} TF/s "
          f"({r['probe_frac_of_peak'] * 100:.1f}%)", flush=True)
    return r["probe_matmul_tflops"]


def flash_bwd_layer_time(iters=3):
    """dq+dkv passes at the production self-attn shape (one layer)."""
    from scail_tpu.ops.attention import _flash_bwd, _flash_fwd

    B, S, d = 12, 48832, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, do = (jax.random.normal(kk, (B, S, d), jnp.bfloat16) for kk in ks)
    scale = 1.0 / np.sqrt(d)
    o, lse = jax.jit(lambda q, k, v: _flash_fwd(q, k, v, scale, 1024, 2048))(
        q, k, v)
    bwd = jax.jit(functools.partial(
        _flash_bwd, scale=scale, block_q=1024, block_k=2048,
        dq_blocks=(2048, 2048), dkv_blocks=(2048, 2048)))
    out = bwd(q, k, v, o, lse, do)
    _ = np.asarray(out[0][0, :1, :1])      # tunnel-safe barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = bwd(q, k, v, o, lse, do)
    _ = np.asarray(out[0][0, :1, :1])
    dt = (time.perf_counter() - t0) / iters
    rate = ATTN_BWD_EXEC_TF_LAYER / dt
    print(f"flash bwd (dq+dkv, 2048/2048): {dt * 1e3:.1f} ms/layer = "
          f"{rate:.1f} TF/s on 7 executed matmuls "
          f"({rate / 197 * 100:.1f}% nominal)", flush=True)
    return dt


def bench_mode(mode, iters):
    import bench_train_step
    args = argparse.Namespace(
        iters=iters, no_remat=False, frames=81, optimizer="adafactor",
        mode=mode, remat_policy="save_attn_frac", save_frac=0.7,
        attn_impl=None)
    rep = bench_train_step.run(args)
    print(f"mode={mode}: {rep['value']} s "
          f"(mfu {rep['vs_baseline'] * 100:.1f}%, executed "
          f"{rep['extras'].get('executed_tflops', 0):.1f} TF/s)", flush=True)
    return rep["value"]


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    p0 = probe("start")
    t_layer = flash_bwd_layer_time()
    t_fwd = bench_mode("fwd", args.iters + 1)
    p1 = probe("mid")
    t_grad = bench_mode("grad", args.iters)
    t_step = bench_mode("step", args.iters)
    p2 = probe("end")

    print("--- identity terms (same session) ---", flush=True)
    print(f"fwd: {t_fwd:.3f} s = {FWD_TF / t_fwd:.1f} TF/s counted", flush=True)
    print(f"attn bwd: 30 x {t_layer * 1e3:.1f} ms = {30 * t_layer:.2f} s",
          flush=True)
    print(f"optimizer+epilogue residual (step - grad): "
          f"{t_step - t_grad:.2f} s", flush=True)
    print(f"step executed rate: {EXEC_TF_07 / t_step:.1f} TF/s vs probes "
          f"{p0:.1f}/{p1:.1f}/{p2:.1f}", flush=True)


if __name__ == "__main__":
    main()
