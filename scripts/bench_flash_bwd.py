"""Sweep the flash-backward tile shapes independently for the dq and
dk/dv kernels (VERDICT r2 item 2: "retune _flash_dkv_kernel blocks").

The two passes nest the grid in opposite orders (dq: q outer / kv inner;
dkv: kv outer / q inner), so their best (bq, bk) differ.  This times
each pallas pass in isolation at the SCAIL self-attention shape and
prints a ranked table; winners get hard-coded in ops/attention.py
(_flash_vjp_bwd call sites).  Run manually on the chip:

  python scripts/bench_flash_bwd.py [--seq 48832] [--bn 12] \
      [--blocks 512,1024,2048,4096]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _barrier(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])


def timeit(fn, *args, iters=3):
    _barrier(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / iters


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=48832)
    ap.add_argument("--bn", type=int, default=12)
    ap.add_argument("--blocks", default="512,1024,2048,4096")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from scail_tpu.ops.attention import _flash_bwd, _flash_fwd

    B, S, d = args.bn, args.seq, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (B, S, d), jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)

    o, lse = jax.jit(lambda q, k, v: _flash_fwd(q, k, v, scale, 1024, 2048))(
        q, k, v)
    _barrier(o)

    # 5 bwd matmuls split 2 (dq) / 3 (dkv); report per-pass TF/s on the
    # theoretical pass flops
    dq_flops = 2 * 2 * B * S * S * d
    dkv_flops = 3 * 2 * B * S * S * d
    blocks = [int(x) for x in args.blocks.split(",")]

    results = {"dq": [], "dkv": []}
    for which in ("dq", "dkv"):
        for bq in blocks:
            for bk in blocks:
                kwargs = ({"dq_blocks": (bq, bk), "dkv_blocks": (1024, 1024)}
                          if which == "dq"
                          else {"dq_blocks": (1024, 1024),
                                "dkv_blocks": (bq, bk)})

                # time the FULL bwd with the other pass pinned; subtract
                # the pinned pass' own best-known time afterwards is
                # noisy -- instead rank by total, which is what matters
                fn = jax.jit(functools.partial(
                    _flash_bwd, scale=scale, block_q=1024, block_k=1024,
                    **kwargs))
                try:
                    t = timeit(lambda *a: fn(*a), q, k, v, o, lse, do,
                               iters=args.iters)
                except Exception as e:  # noqa: BLE001 - mosaic OOM etc
                    print(f"{which} bq={bq} bk={bk}: FAILED "
                          f"{str(e).splitlines()[0][:100]}", flush=True)
                    continue
                results[which].append((t, bq, bk))
                flops = dq_flops + dkv_flops
                print(f"{which:3s} bq={bq:5d} bk={bk:5d}  total-bwd "
                      f"{t * 1e3:7.1f} ms  {flops / t / 1e12:6.1f} TF/s",
                      flush=True)

    for which in ("dq", "dkv"):
        if results[which]:
            t, bq, bk = min(results[which])
            print(f"best {which}: bq={bq} bk={bk} ({t * 1e3:.1f} ms total)")


if __name__ == "__main__":
    main()
