"""End-to-end clip benchmark on the real chip: full RF sampling loop
(50 steps, CFG) + streamed VAE decode at 512p with the 1.3B DiT and
random weights.  Reports sec/clip and VAE decode fps -- the BASELINE.json
north-star metrics measured directly rather than derived.

Heavier than bench.py (several minutes of device time); run manually:
  python scripts/bench_e2e.py [--steps 50] [--frames 81]

--per-step jits ONE CFG denoise step and loops on the host: the axon
tunnel kills single device programs that run for minutes (observed
twice at >=25 fused steps: "TPU worker process crashed or restarted"),
and per-step launch overhead is <0.1% at 7.9 s/step anyway.  --attn
selects the self-attention impl (pallas | sta).
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


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=896)
    ap.add_argument("--per-step", action="store_true")
    ap.add_argument("--attn", default="pallas", choices=["pallas", "sta"])
    ap.add_argument("--sta-window", type=int, nargs=2, default=[3, 2])
    ap.add_argument("--sta-tile", type=int, nargs=2, default=[3, 8])
    args = ap.parse_args()

    from scail_tpu.diffusion.denoiser import Denoiser
    from scail_tpu.diffusion.samplers import RFSampler
    from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params
    from scail_tpu.models.wan_vae import WanVAEConfig, init_wan_vae_params, vae_decode

    T = (args.frames - 1) // 4 + 1
    H, W = args.height // 8, args.width // 8

    cfg = DiTConfig(
        hidden_size=1536, num_layers=30, num_heads=12, inner_hidden_size=8960,
        time_embed_dim=1536, share_adaln=True, use_i2v_clip=True,
        dtype="bfloat16", attn_impl=args.attn,
        sta_window=tuple(args.sta_window), sta_tile=tuple(args.sta_tile),
    )
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                          init_dit_params(key, cfg))

    ks = jax.random.split(key, 8)
    cond = {
        "crossattn": jax.random.normal(ks[1], (1, 512, cfg.text_dim), jnp.bfloat16),
        "ref_concat": jax.random.normal(ks[2], (1, 1, 16, H, W), jnp.bfloat16),
        "concat_smpl_render": jax.random.normal(ks[3], (1, T, 16, H // 2, W // 2), jnp.bfloat16),
        "image_clip_features": jax.random.normal(ks[4], (1, 257, cfg.clip_dim), jnp.bfloat16),
    }
    uc = dict(cond)
    uc["crossattn"] = jnp.zeros_like(cond["crossattn"])

    sampler = RFSampler(
        hunyuan_schedule=True, shift_scale=5, num_steps=args.steps, mode="normal",
        discretization_config={"target": "sgm.modules.diffusionmodules.discretizer.RFDiscretization"},
        guider_config={"target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
                       "params": {"scale": 4}},
    )
    denoiser = Denoiser(
        weighting_config={"target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={"target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"},
    )

    # params and cond MUST be jit arguments, not closure captures: captured
    # multi-GB constants get baked into the HLO and sink compilation.
    @jax.jit
    def sample(params, cond, uc, key):
        def net(x, c_noise, c, **kw):
            return dit_forward(params, cfg, x, c_noise, c["crossattn"],
                               ref_concat=c["ref_concat"],
                               concat_smpl_render=c["concat_smpl_render"],
                               image_clip_features=c["image_clip_features"])

        def denoise_fn(x, sigma, c, cfg_scale=None, **kw):
            return denoiser(net, x, sigma, c)

        x0 = jax.random.normal(key, (1, T, 16, H, W), jnp.float32)
        return sampler(denoise_fn, x0, cond, uc=uc)

    @jax.jit
    def one_step(params, cond, uc, x, pair):
        def net(x, c_noise, c, **kw):
            return dit_forward(params, cfg, x, c_noise, c["crossattn"],
                               ref_concat=c["ref_concat"],
                               concat_smpl_render=c["concat_smpl_render"],
                               image_clip_features=c["image_clip_features"])

        merged = sampler.guider.prepare_cond(cond, uc)
        sigma, next_sigma = pair[0], pair[1]
        s2 = jnp.full((2,), sigma, jnp.float32)
        x2 = jnp.concatenate([x, x], axis=0)
        v = denoiser(net, x2, s2, merged).astype(jnp.float32)
        v = sampler.guider(v, sigma, scale=sampler.guider.scale)
        return x + (next_sigma - sigma) * v

    print("compiling + sampling ...", flush=True)
    if args.per_step:
        x = jax.random.normal(jax.random.PRNGKey(7), (1, T, 16, H, W),
                              jnp.float32)
        sigmas = sampler.sigma_schedule(x.shape)
        pairs = np.stack([sigmas[:-1], sigmas[1:]], axis=1)
        t0 = time.perf_counter()
        x = one_step(params, cond, uc, x, jnp.asarray(pairs[0]))
        _ = np.asarray(x[0, 0, 0, 0, :2])
        t_compile = time.perf_counter() - t0
        print(f"step compile+run: {t_compile:.1f}s", flush=True)
        t0 = time.perf_counter()
        for i in range(1, len(pairs)):
            x = one_step(params, cond, uc, x, jnp.asarray(pairs[i]))
        _ = np.asarray(x[0, 0, 0, 0, :2])
        t_sample = (time.perf_counter() - t0) / (len(pairs) - 1) * args.steps
        z = x
        print(f"sampling steady: {t_sample:.1f}s "
              f"({t_sample / args.steps * 1000:.0f} ms/step)", flush=True)
    else:
        t0 = time.perf_counter()
        z = sample(params, cond, uc, jax.random.PRNGKey(7))
        z_np = np.asarray(z[0, 0, 0, 0, :2])
        t_sample_total = time.perf_counter() - t0
        print(f"sampling (incl compile): {t_sample_total:.1f}s", flush=True)

        t0 = time.perf_counter()
        z = sample(params, cond, uc, jax.random.PRNGKey(8))
        z_np = np.asarray(z[0, 0, 0, 0, :2])
        t_sample = time.perf_counter() - t0
        print(f"sampling steady: {t_sample:.1f}s "
              f"({t_sample / args.steps * 1000:.0f} ms/step)", flush=True)

    vcfg = WanVAEConfig(dtype="bfloat16")
    vparams = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                           init_wan_vae_params(jax.random.PRNGKey(1), vcfg))

    @jax.jit
    def decode(vparams, z):
        return vae_decode(vparams, vcfg, z.astype(jnp.bfloat16), streamed=True)

    t0 = time.perf_counter()
    vid = decode(vparams, z)
    _ = np.asarray(vid[0, 0, 0, 0, :2])
    t_dec_total = time.perf_counter() - t0
    t0 = time.perf_counter()
    vid = decode(vparams, z)
    _ = np.asarray(vid[0, 0, 0, 0, :2])
    t_dec = time.perf_counter() - t0
    fps = args.frames / t_dec

    print(json.dumps({
        "sec_per_clip_1p3b_512p": round(t_sample + t_dec, 1),
        "sampling_s": round(t_sample, 1),
        "ms_per_step": round(t_sample / args.steps * 1000, 1),
        "vae_decode_s": round(t_dec, 1),
        "vae_decode_fps": round(fps, 2),
        "decode_compile_s": round(t_dec_total - t_dec, 1),
        "attn": args.attn,
    }))


if __name__ == "__main__":
    main()
