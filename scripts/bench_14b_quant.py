"""14B DiT denoise step on ONE v5e chip via int4/int8 weight quantization.

bf16 14B weights (28 GB) cannot fit a 16 GB chip; the W4A16 path (7 GB
packed weights + per-channel scales) can, with room for the 48,832-token
activations.  Random weights — this measures memory feasibility and step
latency of the quantized path, not quality.

Usage: python scripts/bench_14b_quant.py [--bits 4] [--cfg-batch 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _rand_int4_dense(key, shape_in, shape_out, prefix=()):
    """Random packed-int4 dense params without materializing f32 weights."""
    k1, k2 = jax.random.split(key)
    packed = jax.random.randint(
        k1, (*prefix, shape_in // 2, shape_out), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    scale = 0.02 / 7.0 * jnp.ones((*prefix, shape_out), jnp.float32)
    return {"qweight4": packed, "scale": scale,
            "bias": jnp.zeros((*prefix, shape_out), jnp.bfloat16)}


def _rand_int8_dense(key, shape_in, shape_out, prefix=()):
    k1, _ = jax.random.split(key)
    q = jax.random.randint(k1, (*prefix, shape_in, shape_out), -127, 128,
                           jnp.int32).astype(jnp.int8)
    scale = 0.02 / 127.0 * jnp.ones((*prefix, shape_out), jnp.float32)
    return {"qweight": q, "scale": scale,
            "bias": jnp.zeros((*prefix, shape_out), jnp.bfloat16)}


def build_random_quant_params(cfg, bits):
    """Random W4A16/W8A16 DiT params for the given config: dense layers are
    packed-int weights + scales (never materialized at f32), everything else
    small bf16.  Shared by bench_14b_quant.py and bench_14b_e2e.py."""
    h, inner, L = cfg.hidden_size, cfg.inner_hidden_size, cfg.num_layers
    mk = _rand_int4_dense if bits == 4 else _rand_int8_dense
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 32))

    def small(shape):
        return 0.02 * jax.random.normal(next(keys), shape, jnp.bfloat16)

    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_channels * pt * ph * pw
    params = {
        "patch_embed": {
            "proj": {"kernel": small((patch_in, h)), "bias": small((h,))},
            "proj_pose": {"kernel": small((patch_in, h)), "bias": small((h,))},
        },
        "time_embed": {
            "fc1": {"kernel": small((cfg.time_freq_dim, h)), "bias": small((h,))},
            "fc2": {"kernel": small((h, h)), "bias": small((h,))},
        },
        "adaln_projection": {"fc": {"kernel": small((h, 6 * h)), "bias": small((6 * h,))}},
        "text_embedding": {
            "fc1": {"kernel": small((cfg.text_dim, h)), "bias": small((h,))},
            "fc2": {"kernel": small((h, h)), "bias": small((h,))},
        },
        "clip_proj": {
            "ln_in": {"scale": jnp.ones((cfg.clip_dim,)), "bias": jnp.zeros((cfg.clip_dim,))},
            "fc1": {"kernel": small((cfg.clip_dim, cfg.clip_dim)), "bias": small((cfg.clip_dim,))},
            "fc2": {"kernel": small((cfg.clip_dim, h)), "bias": small((h,))},
            "ln_out": {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))},
        },
        "final_layer": {
            "adaln": small((2, h)).astype(jnp.float32),
            "linear": {"kernel": small((h, pt * ph * pw * cfg.out_channels)),
                       "bias": small((pt * ph * pw * cfg.out_channels,))},
        },
        "layers": {
            "qkv": mk(next(keys), h, 3 * h, (L,)),
            "attn_out": mk(next(keys), h, h, (L,)),
            "cross_q": mk(next(keys), h, h, (L,)),
            "cross_kv": mk(next(keys), h, 2 * h, (L,)),
            "cross_out": mk(next(keys), h, h, (L,)),
            "mlp_in": mk(next(keys), h, inner, (L,)),
            "mlp_out": mk(next(keys), inner, h, (L,)),
            "clip_kv": mk(next(keys), h, 2 * h, (L,)),
            "adaln": (h ** -0.5) * jax.random.normal(next(keys), (L, 6, h), jnp.float32),
            "q_norm": {"scale": jnp.ones((L, h))},
            "k_norm": {"scale": jnp.ones((L, h))},
            "cross_q_norm": {"scale": jnp.ones((L, h))},
            "cross_k_norm": {"scale": jnp.ones((L, h))},
            "clip_k_norm": {"scale": jnp.ones((L, h))},
        },
    }
    return params


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=[4, 8])
    ap.add_argument("--cfg-batch", type=int, default=2)
    ap.add_argument("--attn", default="pallas", choices=["pallas", "sta"])
    args = ap.parse_args()

    from scail_tpu.models.dit import DiTConfig, dit_forward

    cfg = DiTConfig(dtype="bfloat16", attn_impl=args.attn)  # 14B defaults
    params = build_random_quant_params(cfg, args.bits)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"param bytes: {nbytes / 1e9:.2f} GB (bits={args.bits})", flush=True)

    b = args.cfg_batch
    T, H, W = 21, 64, 112
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    x = jax.random.normal(ks[0], (b, T, 16, H, W), jnp.bfloat16)
    tsteps = jnp.full((b,), 500.0, jnp.float32)
    context = jax.random.normal(ks[1], (b, 512, cfg.text_dim), jnp.bfloat16)
    ref = jax.random.normal(ks[2], (b, 1, 16, H, W), jnp.bfloat16)
    pose = jax.random.normal(ks[3], (b, T, 16, H // 2, W // 2), jnp.bfloat16)
    clip_f = jax.random.normal(ks[4], (b, 257, cfg.clip_dim), jnp.bfloat16)

    @jax.jit
    def step(params, x, tsteps, context, ref, pose, clip_f):
        return dit_forward(params, cfg, x, tsteps, context, ref_concat=ref,
                           concat_smpl_render=pose, image_clip_features=clip_f)

    print("compiling ...", flush=True)
    t0 = time.perf_counter()
    out = step(params, x, tsteps, context, ref, pose, clip_f)
    _ = np.asarray(out[0, 0, 0, 0, :2])
    print(f"first step (incl compile): {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(3):
        out = step(params, x, tsteps, context, ref, pose, clip_f)
    _ = np.asarray(out[0, 0, 0, 0, :2])
    ms = (time.perf_counter() - t0) / 3 * 1000

    print(json.dumps({
        "metric": f"dit_14b_w{args.bits}a16_step_ms_512p",
        "value": round(ms, 1),
        "param_gb": round(nbytes / 1e9, 2),
        "cfg_batch": b,
        "derived_sec_per_clip_50step": round(ms * 50 / 1000 * (2 // b), 1),
    }))


if __name__ == "__main__":
    main()
