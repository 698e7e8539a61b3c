"""MEASURED end-to-end 14B clip on ONE v5e chip (W4A16 int4 weights).

Runs the full 50-step RF sampling loop (hunyuan shift schedule, CFG 4)
with the 14B DiT geometry at 512x896/81f and random quantized weights,
then the streamed Wan-VAE decode, and reports the measured wall-clock
clip time — converting the per-step arithmetic of bench_14b_quant.py
("18.1 s/CFG half" etc.) into one measured number.  The reference needs
8xA100 for this model (scripts/sample_sgl_14Bsc_xc_cli.sh); one 16 GB
v5e chip cannot hold bf16 14B at all.

CFG halves run as two separate single-batch forwards per step: measured
faster than the batch-2 forward at this memory pressure (49.2 s vs
54.7 s per step) and the per-half jit keeps peak HBM lower.  The loop is
host-driven per step because the axon tunnel kills device programs that
run >~3 min; per-step dispatch overhead is <0.1% at 20 s/step.

Usage: python scripts/bench_14b_e2e.py [--steps 50] [--attn pallas|sta]
Plan ~25-45 min of chip time for a full 50-step run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--bits", type=int, default=4, choices=[4, 8])
    ap.add_argument("--attn", default="pallas", choices=["pallas", "sta"])
    ap.add_argument("--sta-window", type=int, nargs=2, default=[3, 2])
    ap.add_argument("--sta-tile", type=int, nargs=2, default=[3, 8])
    ap.add_argument("--skip-decode", action="store_true")
    args = ap.parse_args()

    from bench_14b_quant import build_random_quant_params
    from scail_tpu.diffusion.denoiser import Denoiser
    from scail_tpu.diffusion.samplers import RFSampler
    from scail_tpu.models.dit import DiTConfig, dit_forward
    from scail_tpu.models.wan_vae import (WanVAEConfig, init_wan_vae_params,
                                          vae_decode)

    T = (args.frames - 1) // 4 + 1
    H, W = 512 // 8, 896 // 8

    cfg = DiTConfig(  # 14B defaults
        dtype="bfloat16", attn_impl=args.attn,
        sta_window=tuple(args.sta_window), sta_tile=tuple(args.sta_tile),
    )
    params = build_random_quant_params(cfg, args.bits)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"param bytes: {nbytes / 1e9:.2f} GB (bits={args.bits}, "
          f"attn={args.attn})", flush=True)

    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    cond = {
        "crossattn": jax.random.normal(ks[1], (1, 512, cfg.text_dim), jnp.bfloat16),
        "ref_concat": jax.random.normal(ks[2], (1, 1, 16, H, W), jnp.bfloat16),
        "concat_smpl_render": jax.random.normal(
            ks[3], (1, T, 16, H // 2, W // 2), jnp.bfloat16),
        "image_clip_features": jax.random.normal(
            ks[4], (1, 257, cfg.clip_dim), jnp.bfloat16),
    }
    uc = dict(cond)
    uc["crossattn"] = jnp.zeros_like(cond["crossattn"])

    sampler = RFSampler(
        hunyuan_schedule=True, shift_scale=5, num_steps=args.steps,
        mode="normal",
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.RFDiscretization"},
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
            "params": {"scale": 4}},
    )
    denoiser = Denoiser(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"},
    )

    # One CFG half: single-batch denoise.  params/cond as jit args so the
    # 8.6 GB of packed weights never bake into the HLO.
    @jax.jit
    def denoise_half(params, c, x, sigma):
        def net(x, c_noise, c, **kw):
            return dit_forward(params, cfg, x, c_noise, c["crossattn"],
                               ref_concat=c["ref_concat"],
                               concat_smpl_render=c["concat_smpl_render"],
                               image_clip_features=c["image_clip_features"])

        s = jnp.full((1,), sigma, jnp.float32)
        return denoiser(net, x, s, c).astype(jnp.float32)

    @jax.jit
    def euler_update(x, v_c, v_u, pair):
        v = v_u + sampler.guider.scale * (v_c - v_u)
        return x + (pair[1] - pair[0]) * v

    x = jax.random.normal(jax.random.PRNGKey(7), (1, T, 16, H, W), jnp.float32)
    sigmas = sampler.sigma_schedule(x.shape)
    pairs = np.stack([sigmas[:-1], sigmas[1:]], axis=1)

    print("compiling ...", flush=True)
    t0 = time.perf_counter()
    p0 = jnp.asarray(pairs[0])
    v_c = denoise_half(params, cond, x, p0[0])
    v_u = denoise_half(params, uc, x, p0[0])
    x = euler_update(x, v_c, v_u, p0)
    _ = np.asarray(x[0, 0, 0, 0, :2])
    print(f"first step (incl compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    for i in range(1, len(pairs)):
        p = jnp.asarray(pairs[i])
        v_c = denoise_half(params, cond, x, p[0])
        v_u = denoise_half(params, uc, x, p[0])
        x = euler_update(x, v_c, v_u, p)
    _ = np.asarray(x[0, 0, 0, 0, :2])
    t_rest = time.perf_counter() - t0
    step_s = t_rest / (len(pairs) - 1)
    t_sample = step_s * args.steps  # steady-state for all steps
    print(f"steps 2..{len(pairs)} measured: {t_rest:.1f}s "
          f"({step_s:.2f} s/step, both CFG halves)", flush=True)

    out = {
        "metric": f"sec_per_clip_14b_w{args.bits}a16_512p_{args.attn}",
        "sampling_s_measured_after_compile_step": round(t_rest, 1),
        "measured_steps": len(pairs) - 1,
        "step_s": round(step_s, 2),
        # steady-state step time x args.steps; the first (compile) step
        # is excluded from the measurement, so this is partly projected
        f"sampling_s_extrapolated_{args.steps}step": round(t_sample, 1),
        "steps": args.steps,
        "param_gb": round(nbytes / 1e9, 2),
    }

    if not args.skip_decode:
        vcfg = WanVAEConfig(dtype="bfloat16")
        vparams = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                               init_wan_vae_params(jax.random.PRNGKey(1), vcfg))

        @jax.jit
        def decode(vparams, z):
            return vae_decode(vparams, vcfg, z.astype(jnp.bfloat16),
                              streamed=True)

        t0 = time.perf_counter()
        vid = decode(vparams, x)
        _ = np.asarray(vid[0, 0, 0, 0, :2])
        t_dec_incl = time.perf_counter() - t0
        t0 = time.perf_counter()
        vid = decode(vparams, x)
        _ = np.asarray(vid[0, 0, 0, 0, :2])
        t_dec = time.perf_counter() - t0
        out.update({
            "vae_decode_s": round(t_dec, 1),
            "vae_decode_fps": round(args.frames / t_dec, 2),
            "decode_compile_s": round(t_dec_incl - t_dec, 1),
            "value": round(t_sample + t_dec, 1),
            "unit": (f"s/clip ({args.steps}-step sampling extrapolated "
                     "from steady-state steps + streamed decode measured)"),
        })
    else:
        out.update({"value": round(t_sample, 1),
                    "unit": (f"s ({args.steps}-step sampling extrapolated "
                             "from steady-state steps)")})

    print(json.dumps(out))


if __name__ == "__main__":
    main()
