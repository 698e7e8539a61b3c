"""Measure the model's dense (non-attention) matmul rates directly.

The bwd ceiling identity (docs/TRAINING.md) infers the dense-matmul rate
(~89-104 TF/s) from the fwd aggregate; this times the actual layer GEMM
shapes as bare jitted matmuls in the same session as a probe, so the
"implied dense eff" becomes a measurement.  If bare GEMMs at these
shapes run well above the implied rate, the gap is elementwise/layout
overhead between them (AdaLN modulate, norms, residuals) and is worth a
fusion pass; if they match, the dense rate is a GEMM-shape property and
the identity stands as-is.

Usage: python scripts/diag_dense_rate.py [--iters 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

S, H, INNER, TXT, CLIP = 48832, 1536, 8960, 512, 257

# (name, M, K, N) for every dense GEMM in one layer (bench accounting)
SHAPES = [
    ("qkv", S, H, 3 * H),
    ("attn_out", S, H, H),
    ("cross_q", S, H, H),
    ("cross_kv_txt", TXT, H, 2 * H),
    ("cross_kv_clip", CLIP, H, 2 * H),
    ("cross_out", S, H, H),
    ("mlp_in", S, H, INNER),
    ("mlp_out", S, INNER, H),
]


def probe(tag):
    from scail_tpu.utils.benchmarking import calibration_probe

    r = calibration_probe()
    print(f"probe[{tag}]: {r['probe_matmul_tflops']:.1f} TF/s "
          f"({r['probe_frac_of_peak'] * 100:.1f}%)", flush=True)
    return r["probe_matmul_tflops"]


def time_gemm(m, k, n, iters):
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.bfloat16))
    out = f(a, b)
    _ = np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(a, b)
    _ = np.asarray(out[:1, :1])
    return (time.perf_counter() - t0) / iters


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    probe("start")
    tot_t, tot_f = 0.0, 0.0
    for name, m, k, n in SHAPES:
        dt = time_gemm(m, k, n, args.iters)
        fl = 2 * m * k * n
        tot_t += dt
        tot_f += fl
        print(f"{name:14s} ({m:6d}x{k}x{n:5d}): {dt * 1e3:7.2f} ms  "
              f"{fl / dt / 1e12:6.1f} TF/s", flush=True)
    print(f"layer dense total: {tot_t * 1e3:.1f} ms, "
          f"{tot_f / tot_t / 1e12:.1f} TF/s aggregate "
          f"(x30 layers = {30 * tot_t:.2f} s/forward)", flush=True)
    probe("end")


if __name__ == "__main__":
    main()
