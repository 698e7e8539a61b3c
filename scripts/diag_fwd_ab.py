"""Single-session A/B for the bench-fwd gap (round 4).

Separate sessions measured the SAME 1.3B loss-forward at 7.285 s
(scripts/bench_train_step.py --mode fwd, 01:30) and 4.484 s
(scripts/diag_fwd_gap.py case E, 01:51).  The two builds differ only in
schedule_shift and remat_save_frac -- neither can cost 2.8 s -- so this
runs all of them in ONE process, bracketed by calibration probes, to
decide between code and chip-state drift.

Usage: python scripts/diag_fwd_ab.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FWD_TFLOPS_B1 = 568.78


def probe(tag):
    from scail_tpu.utils.benchmarking import calibration_probe

    r = calibration_probe()
    print(f"probe[{tag}]: {r['probe_matmul_tflops']:.1f} TF/s "
          f"({r['probe_frac_of_peak'] * 100:.1f}% of peak)", flush=True)


def bench_mode(mode, save_frac, iters=3, attn_impl=None):
    import bench_train_step
    args = argparse.Namespace(
        iters=iters, no_remat=False, frames=81, optimizer="adafactor",
        mode=mode, remat_policy="save_attn_frac", save_frac=save_frac,
        attn_impl=attn_impl)
    t0 = time.perf_counter()
    rep = bench_train_step.run(args)
    wall = time.perf_counter() - t0
    print(f"bench mode={mode} save_frac={save_frac}: {rep['value']} s "
          f"(mfu {rep['vs_baseline'] * 100:.1f}%, wall {wall:.0f}s)",
          flush=True)
    return rep["value"]


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    probe("start")
    f1 = bench_mode("fwd", 0.7)
    probe("after-fwd-0.7")
    f2 = bench_mode("fwd", 0.5)
    probe("after-fwd-0.5")
    s1 = bench_mode("step", 0.7, iters=2)
    probe("after-step")
    fwd_tf = FWD_TFLOPS_B1 / min(f1, f2)
    print(f"fwd best: {min(f1, f2):.3f} s = {fwd_tf:.1f} TF/s "
          f"({fwd_tf / 197 * 100:.1f}%)  step: {s1:.3f} s", flush=True)


if __name__ == "__main__":
    main()
