"""Single-session save_frac sweep for the full training step (round 4).

Step @ save_attn_frac 0.7 measured 18.38 s (47.1% 3xfwd) with the probe
at 139.6 TF/s (70.9% of nominal peak).  More saved attention outputs =
less bwd recompute (attn is ~77% of fwd FLOPs); sweep until OOM, and
time mode=grad at the winner to isolate the optimizer cost.

Usage: python scripts/diag_step_sweep.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def probe(tag):
    from scail_tpu.utils.benchmarking import calibration_probe

    r = calibration_probe()
    print(f"probe[{tag}]: {r['probe_matmul_tflops']:.1f} TF/s "
          f"({r['probe_frac_of_peak'] * 100:.1f}%)", flush=True)


def bench_mode(mode, policy, save_frac, iters=2):
    import bench_train_step
    args = argparse.Namespace(
        iters=iters, no_remat=False, frames=81, optimizer="adafactor",
        mode=mode, remat_policy=policy, save_frac=save_frac, attn_impl=None)
    try:
        rep = bench_train_step.run(args)
    except Exception as e:
        print(f"{mode} {policy}/{save_frac}: FAILED {repr(e)[:120]}",
              flush=True)
        return None
    print(f"{mode} {policy}/{save_frac}: {rep['value']} s "
          f"(mfu {rep['vs_baseline'] * 100:.1f}%)", flush=True)
    return rep["value"]


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    probe("start")
    for frac in (0.85, 0.95):
        bench_mode("step", "save_attn_frac", frac)
    bench_mode("step", "save_attn", 0.5)  # frac unused by this policy
    probe("mid")
    bench_mode("grad", "save_attn_frac", 0.85)
    probe("end")


if __name__ == "__main__":
    main()
