"""Diagnose the training-fwd efficiency gap (round 4).

mode=fwd of bench_train_step measured 7.285 s while the inference bench
runs the same per-forward work in ~3.9-4.4 s (batch-2 CFG step / 2).
This times the pieces in ONE session so chip-state divides out:

  A. calibration probe (bare bf16 matmul chain)
  B. bare dit_forward, batch 1, remat OFF
  C. bare dit_forward, batch 1, remat ON (save_attn_frac 0.7, pre-split)
  D. bare dit_forward, batch 2, remat OFF  (the inference shape)
  E. full RF-loss fwd, batch 1, remat ON   (= bench_train_step mode=fwd)

Usage: python scripts/diag_fwd_gap.py [--iters 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

FWD_TFLOPS_B1 = 568.78  # 30-layer 1.3B fwd at S=48832 (bench accounting)


def timeit(fn, *args, iters=3):
    # block via block_until_ready, NOT np.asarray(full array): a host
    # transfer of the 128MB probe output over the tunnel inside the timed
    # region read 5.5 TF/s for a bare matmul chain (2026-08-19)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from scail_tpu.models.dit import (DiTConfig, dit_forward, init_dit_params,
                                      split_layer_params)

    # --- A: probe (shared implementation, utils/benchmarking.py)
    from scail_tpu.utils.benchmarking import calibration_probe

    r = calibration_probe()
    print(f"A probe: {r['probe_matmul_tflops']:.1f} TF/s "
          f"({r['probe_frac_of_peak'] * 100:.1f}% of peak)", flush=True)

    b_, T, H, W = 1, 21, 64, 112
    s_txt, s_clip = 512, 257

    def build(remat, policy="default"):
        return DiTConfig(
            hidden_size=1536, num_layers=30, num_heads=12,
            inner_hidden_size=8960, time_embed_dim=1536, share_adaln=True,
            use_i2v_clip=True, dtype="bfloat16", attn_impl="pallas",
            remat=remat, remat_policy=policy, remat_save_frac=0.7)

    cfg0 = build(False)
    key = jax.random.PRNGKey(1)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                          init_dit_params(key, cfg0))

    def inputs(b):
        ks = jax.random.split(jax.random.PRNGKey(2), 8)
        return dict(
            x=jax.random.normal(ks[0], (b, T, 16, H, W), jnp.float32),
            timesteps=jnp.full((b,), 500.0, jnp.float32),
            context=jax.random.normal(ks[1], (b, s_txt, 4096), jnp.bfloat16),
            ref_concat=jax.random.normal(ks[2], (b, 1, 16, H, W), jnp.bfloat16),
            concat_smpl_render=jax.random.normal(
                ks[3], (b, T, 16, H // 2, W // 2), jnp.bfloat16),
            image_clip_features=jax.random.normal(
                ks[4], (b, s_clip, 1280), jnp.bfloat16),
        )

    def run_case(label, cfg, p, b):
        inp = inputs(b)

        @jax.jit
        def f(p, inp):
            return dit_forward(p, cfg, inp["x"], inp["timesteps"],
                               inp["context"], ref_concat=inp["ref_concat"],
                               concat_smpl_render=inp["concat_smpl_render"],
                               image_clip_features=inp["image_clip_features"])

        t = timeit(f, p, inp, iters=args.iters)
        tf = b * FWD_TFLOPS_B1 / t
        print(f"{label}: {t:.3f} s  {tf:.1f} TF/s ({tf / 197 * 100:.1f}%)",
              flush=True)
        return t

    run_case("B b=1 remat=off", cfg0, params, 1)
    cfg_r = build(True, "save_attn_frac")
    p_split = split_layer_params(params, cfg_r)
    run_case("C b=1 remat=frac", cfg_r, p_split, 1)
    run_case("D b=2 remat=off", cfg0, params, 2)

    # --- E: the full RF-loss fwd (bench_train_step mode=fwd equivalent)
    from scail_tpu.diffusion.denoiser import Denoiser
    from scail_tpu.diffusion.loss import RFLoss

    denoiser = Denoiser(
        weighting_config={"target": "sgm.modules.diffusionmodules."
                                    "denoiser_weighting.EpsWeighting"},
        scaling_config={"target": "sgm.modules.diffusionmodules."
                                  "denoiser_scaling.RFScaling"},
    )
    loss_obj = RFLoss(sigma_sampler_config={
        "target": "sgm.modules.diffusionmodules.sigma_sampling.RFSampling"})
    inp = inputs(1)
    latents = jax.random.normal(jax.random.PRNGKey(5), (1, T, 16, H, W),
                                jnp.float32)
    cond = {"crossattn": inp["context"], "ref_concat": inp["ref_concat"],
            "concat_smpl_render": inp["concat_smpl_render"],
            "image_clip_features": inp["image_clip_features"]}

    @jax.jit
    def loss_fn(p, key):
        def net(x, c_noise, c, **kw):
            return dit_forward(p, cfg_r, x, c_noise, c["crossattn"],
                               ref_concat=c["ref_concat"],
                               concat_smpl_render=c["concat_smpl_render"],
                               image_clip_features=c["image_clip_features"])

        return jnp.mean(loss_obj(key, net, denoiser, cond, latents))

    t = timeit(loss_fn, p_split, jax.random.PRNGKey(6), iters=args.iters)
    tf = FWD_TFLOPS_B1 / t
    print(f"E b=1 loss remat=frac: {t:.3f} s  {tf:.1f} TF/s "
          f"({tf / 197 * 100:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
