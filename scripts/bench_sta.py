"""Attention-only STA vs dense flash at the 512p 1.3B geometry: scans
strip-tile/window configs to pick the turbo-mode default.  Run on the
chip:  python scripts/bench_sta.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from scail_tpu.ops.attention import attention
    from scail_tpu.ops.sta import sta_attention

    T, Hp, Wp = 21, 32, 56
    ref_len, pose_len = Hp * Wp, T * (Hp // 2) * (Wp // 2)
    s = ref_len + T * Hp * Wp + pose_len
    b, n, d = 1, 12, 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, n, d), jnp.bfloat16)

    def bench(fn, iters=8):
        # sync via host transfer: the axon tunnel's block_until_ready
        # returns before device completion; transfers truly wait
        out = fn()
        _ = np.asarray(out[0, 0, 0, :2])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _ = np.asarray(out[0, 0, 0, :2])
        return (time.perf_counter() - t0) / iters * 1000

    dense = jax.jit(lambda q, k, v: attention(q, k, v, impl="pallas"))
    t_dense = bench(lambda: dense(q, k, v))
    flops = 4 * s * s * n * d * b
    print(json.dumps({"impl": "dense", "ms": round(t_dense, 2),
                      "tflops": round(flops / t_dense / 1e9, 1)}))

    for tile, window in [((3, 4), (3, 3)), ((3, 8), (3, 3)),
                         ((3, 8), (3, 2)), ((3, 16), (3, 2)),
                         ((7, 8), (3, 3)), ((3, 16), (5, 2)),
                         ((21, 8), (1, 3))]:
        f = jax.jit(lambda q, k, v, tile=tile, window=window: sta_attention(
            q, k, v, grid_thw=(T, Hp, Wp), ref_len=ref_len,
            pose_len=pose_len, tile=tile, window=window))
        try:
            ms = bench(lambda: f(q, k, v))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"impl": f"sta{tile}{window}",
                              "error": str(e)[:120]}))
            continue
        # attended pairs for the config (for an effective-TFLOP/s view)
        n_t, n_h = T // tile[0], Hp // tile[1]
        ts = tile[0] * tile[1] * Wp
        wt, wh = min(window[0], n_t), min(window[1], n_h)
        sv = T * Hp * Wp
        s_glob = ref_len + pose_len
        pad = (-s_glob) % ts
        kv_per_vq = wt * wh * ts + s_glob + pad
        pairs = sv * kv_per_vq + s_glob * s
        print(json.dumps({
            "impl": f"sta t{tile} w{window}", "ms": round(ms, 2),
            "vs_dense": round(ms / t_dense, 3),
            "pair_frac": round(pairs / (s * s), 3),
            "eff_tflops": round(4 * pairs * n * d * b / ms / 1e9, 1),
        }))


if __name__ == "__main__":
    main()
