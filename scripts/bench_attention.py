"""Flash-attention kernel micro-benchmark at the SCAIL self-attention
shape (b*heads=12, seq 48,832, head_dim 128, bf16): forward TFLOP/s and
combined fwd+bwd TFLOP/s per (block_q, block_k), vs the stock jax pallas
flash kernel.  Run manually on the chip."""

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
    # through the tunneled axon backend only a host transfer reliably waits
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
    ap.add_argument("--blocks", default="512,1024,2048")
    ap.add_argument("--lib", action="store_true", help="also bench stock jax kernel")
    ap.add_argument("--softmax-bf16", action="store_true",
                    help="fwd-only: run the online-softmax exp2 in bf16 "
                         "(2x VPU lane rate, ~0.4%% p error) — the "
                         "ROADMAP dense-ceiling experiment")
    args = ap.parse_args()

    from scail_tpu.ops.attention import _flash_attention_bnsd, _flash_fwd

    B, S, d = args.bn, args.seq, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, d), jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)

    fwd_flops = 4 * B * S * S * d
    bwd_flops = 2.5 * fwd_flops          # 5 matmuls of the theoretical bwd

    blocks = [int(x) for x in args.blocks.split(",")]
    sm_dtype = jnp.bfloat16 if args.softmax_bf16 else jnp.float32
    for bq in blocks:
        for bk in blocks:
            fwd = jax.jit(lambda q, k, v: _flash_fwd(
                q, k, v, scale, bq, bk, softmax_dtype=sm_dtype)[0])
            t_f = timeit(fwd, q, k, v)

            def loss(q, k, v):
                return jnp.sum(_flash_attention_bnsd(q, k, v, scale, bq, bk)
                               .astype(jnp.float32))

            gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t_fb = timeit(gr, q, k, v)
            print(f"bq={bq:5d} bk={bk:5d}  fwd {fwd_flops/t_f/1e12:6.1f} TF/s"
                  f"  fwd+bwd {(fwd_flops+bwd_flops)/t_fb/1e12:6.1f} TF/s"
                  f"  (t_fwd {t_f*1e3:7.1f} ms, t_fb {t_fb*1e3:7.1f} ms)",
                  flush=True)

    if args.lib:
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)

            qh = q[:, None].transpose(0, 1, 2, 3).reshape(1, B, S, d)
            kh = k.reshape(1, B, S, d)
            vh = v.reshape(1, B, S, d)

            lib_f = jax.jit(lambda q, k, v: flash_attention(
                q, k, v, causal=False, sm_scale=scale))
            t_f = timeit(lib_f, qh, kh, vh)

            def lib_loss(q, k, v):
                return jnp.sum(flash_attention(
                    q, k, v, causal=False, sm_scale=scale).astype(jnp.float32))

            lib_g = jax.jit(jax.grad(lib_loss, argnums=(0, 1, 2)))
            t_fb = timeit(lib_g, qh, kh, vh)
            print(f"stock jax kernel:  fwd {fwd_flops/t_f/1e12:6.1f} TF/s"
                  f"  fwd+bwd {(fwd_flops+bwd_flops)/t_fb/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print("stock kernel bench failed:", e)


if __name__ == "__main__":
    main()
