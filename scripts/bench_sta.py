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

    for tile, window, wp, pkw in [
            ((3, 8), (3, 2), False, 0),     # video windows only
            ((3, 8), (3, 2), True, 0),      # + windowed pose queries
            ((3, 8), (3, 2), True, 3),      # + pose-kv strips (default)
            ((3, 8), (3, 3), True, 3),
            ((3, 4), (3, 3), True, 3)]:
        f = jax.jit(lambda q, k, v, tile=tile, window=window, wp=wp,
                    pkw=pkw: sta_attention(
            q, k, v, grid_thw=(T, Hp, Wp), ref_len=ref_len,
            pose_len=pose_len, tile=tile, window=window,
            windowed_pose=wp, pose_kv_window=pkw))
        try:
            ms = bench(lambda: f(q, k, v))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"impl": f"sta{tile}{window}",
                              "error": str(e)[:120]}))
            continue
        print(json.dumps({
            "impl": f"sta t{tile} w{window} wp{int(wp)} pkw{pkw}",
            "ms": round(ms, 2),
            "vs_dense": round(ms / t_dense, 3),
        }))


if __name__ == "__main__":
    main()
