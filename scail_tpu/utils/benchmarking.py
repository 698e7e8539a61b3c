"""Shared benchmarking utilities.

`calibration_probe` is the single implementation of the in-session
chip-state probe used by bench.py and the scripts/diag_* harnesses: a
pure bf16 matmul chain (the cleanest MXU roofline) timed in the SAME
process as whatever is being measured.  The attached chip's effective
speed drifts bimodally between sessions (BENCH_r01 8899.6 ms ~= r03
8894.4 ms across very different code, vs r02 7840 ms), so every
measurement session should record the probe and normalize against it —
a code regression then separates from a slow-chip day.

Timing rule (measured the hard way, scripts/diag_fwd_gap.py): block with
a tiny slice transfer or block_until_ready, never a full-array host
transfer inside the timed region — a 128 MB device->host copy made a
bare matmul chain read 5.5 TF/s.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e bf16 nominal peak; override for other chip generations
PEAK_TFLOPS = 197.0


def calibration_probe(peak_tflops: float = PEAK_TFLOPS,
                      n: int = 8192, chain: int = 16) -> dict:
    """Time a jitted chain of n x n bf16 matmuls; returns
    {probe_matmul_tflops, probe_frac_of_peak}."""
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    # spectral norm ~1 keeps the chain bounded (inf/nan-free MXU timing)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    b = (b / jnp.sqrt(jnp.float32(n)).astype(jnp.bfloat16))

    @jax.jit
    def mm_chain(a, b):
        return jax.lax.fori_loop(
            0, chain, lambda i, x: jax.lax.dot(
                x, b, preferred_element_type=jnp.bfloat16), a)

    _ = np.asarray(mm_chain(a, b)[0, :2])     # compile + warmup barrier
    t0 = time.perf_counter()
    out = mm_chain(a, b)
    _ = np.asarray(out[0, :2])                # 2-element barrier, not a copy
    dt = time.perf_counter() - t0
    tflops = chain * 2 * n ** 3 / dt / 1e12
    return {
        "probe_matmul_tflops": round(tflops, 1),
        "probe_frac_of_peak": round(tflops / peak_tflops, 4),
    }
