"""Long-video tiled sampler benchmark (VERDICT r4 item 2): RFSamplerLong
at 161 frames / 512p on the 1.3B DiT, dense vs STA, measured ON CHIP.

Matches /root/reference/sgm/modules/diffusionmodules/sampling.py:986-1084:
41 latent frames tiled into 21-frame tiles with overlap 8 (the CLI
defaults), per-tile pose conditioning, triangle-window blending.  One
tiled step = 2*(n_tiles-1) CFG-doubled tile denoises, so the
overlap-blend overhead vs `n_tiles x` the single-tile cost is
2*(n_tiles-1)/n_tiles in FLOPs; this script measures the realized ratio.

Host-driven per step (one jitted tiled step per device program -- the
axon tunnel kills multi-minute programs); steady-state step time is
extrapolated to --steps with an explicitly-named key.

  python scripts/bench_long_clip.py [--attn pallas|sta] [--measure-steps 2]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--measure-steps", type=int, default=2,
                    help="steady-state tiled steps to time (after the "
                         "compile step)")
    ap.add_argument("--frames", type=int, default=161)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=896)
    ap.add_argument("--tile", type=int, default=21, help="latent frames/tile")
    ap.add_argument("--overlap", type=int, default=8)
    ap.add_argument("--attn", default="pallas", choices=["pallas", "sta"])
    args = ap.parse_args()
    print(json.dumps(run(args)))


def run(args):
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from scail_tpu.diffusion.denoiser import Denoiser
    from scail_tpu.diffusion.samplers import RFSamplerLong, make_tile_indices
    from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if on_tpu:
        T = (args.frames - 1) // 4 + 1
        H, W = args.height // 8, args.width // 8
        cfg = DiTConfig(
            hidden_size=1536, num_layers=30, num_heads=12,
            inner_hidden_size=8960, time_embed_dim=1536, share_adaln=True,
            use_i2v_clip=True, dtype="bfloat16", attn_impl=args.attn)
        s_txt, s_clip = 512, 257
        tile, overlap = args.tile, args.overlap
    else:
        # CPU smoke: tiny geometry so the script (and its test) always runs
        T, H, W = 6, 8, 8
        cfg = DiTConfig(
            hidden_size=64, num_layers=2, num_heads=2, inner_hidden_size=128,
            time_embed_dim=64, text_dim=32, clip_dim=16, share_adaln=True,
            use_i2v_clip=True, dtype="float32", attn_impl="xla")
        s_txt, s_clip = 16, 9
        tile, overlap = 4, 2

    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda p: p.astype(cfg.compute_dtype),
                          init_dit_params(key, cfg))
    ks = jax.random.split(key, 8)
    cdt = cfg.compute_dtype
    tiles = make_tile_indices(T, tile, overlap)
    n_tiles = len(tiles)
    Tt = len(tiles[0])
    cond = {
        "crossattn": jax.random.normal(ks[1], (1, s_txt, cfg.text_dim), cdt),
        "ref_concat": jax.random.normal(ks[2], (1, 1, 16, H, W), cdt),
        "image_clip_features": jax.random.normal(
            ks[3], (1, s_clip, cfg.clip_dim), cdt),
        # per-tile pose conditioning (sampling.py:1047-1050)
        "smpl_tiled": jax.random.normal(
            ks[4], (1, n_tiles, Tt, 16, H // 2, W // 2), cdt),
    }
    uc = dict(cond)
    uc["crossattn"] = jnp.zeros_like(cond["crossattn"])

    sampler = RFSamplerLong(
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

    def net(x, c_noise, c, **kw):
        return dit_forward(params, cfg, x, c_noise, c["crossattn"],
                           ref_concat=c["ref_concat"],
                           concat_smpl_render=c["concat_smpl_render"],
                           image_clip_features=c["image_clip_features"])

    def denoise_fn(x, sigma, c, cfg_scale=None, **kw):
        return denoiser(net, x, sigma, c)

    tile_t = tuple(tuple(t) for t in tiles)

    @jax.jit
    def long_step(x, pair, cond, uc):
        return sampler.long_step(denoise_fn, x, pair, tile_t, cond, uc)

    @jax.jit
    def single_tile_step(x_tile, pair, cond, uc):
        # one CFG-doubled tile denoise + euler update: the unit the
        # overlap-blend overhead is measured against
        c = {k: v for k, v in cond.items() if k != "smpl_tiled"}
        c["concat_smpl_render"] = cond["smpl_tiled"][:, 0]
        u = {k: v for k, v in uc.items() if k != "smpl_tiled"}
        u["concat_smpl_render"] = uc["smpl_tiled"][:, 0]
        merged = sampler.guider.prepare_cond(c, u)
        sigma, next_sigma = pair[0], pair[1]
        s2 = jnp.full((2,), sigma, jnp.float32)
        x2 = jnp.concatenate([x_tile, x_tile], axis=0)
        v = denoiser(net, x2, s2, merged).astype(jnp.float32)
        v = sampler.guider(v, sigma, scale=sampler.guider.scale)
        return x_tile + (next_sigma - sigma) * v

    x = jax.random.normal(jax.random.PRNGKey(7), (1, T, 16, H, W),
                          jnp.float32)
    sigmas = sampler.sigma_schedule(x.shape)
    pairs = np.stack([sigmas[:-1], sigmas[1:]], axis=1)

    # diagnostics go to stderr: bench.py imports run() and its stdout is
    # the ONE-JSON-line driver contract
    print(f"tiles={tile_t}  (n={n_tiles}, {2 * (n_tiles - 1)} tile "
          f"denoises per tiled step)", flush=True, file=sys.stderr)
    t0 = time.perf_counter()
    x = long_step(x, jnp.asarray(pairs[0]), cond, uc)
    _ = np.asarray(x[0, 0, 0, 0, :2])
    t_compile = time.perf_counter() - t0
    print(f"tiled step compile+run: {t_compile:.1f}s", flush=True,
          file=sys.stderr)

    n_meas = max(1, min(args.measure_steps, len(pairs) - 1))
    t0 = time.perf_counter()
    for i in range(1, 1 + n_meas):
        x = long_step(x, jnp.asarray(pairs[i]), cond, uc)
    _ = np.asarray(x[0, 0, 0, 0, :2])
    step_s = (time.perf_counter() - t0) / n_meas
    print(f"tiled step steady: {step_s:.2f}s", flush=True, file=sys.stderr)

    # single-tile reference cost, same session
    xt = x[:, jnp.asarray(np.asarray(tiles[0], np.int32))]
    xt = single_tile_step(xt, jnp.asarray(pairs[0]), cond, uc)
    _ = np.asarray(xt[0, 0, 0, 0, :2])  # compile barrier
    t0 = time.perf_counter()
    xt = single_tile_step(xt, jnp.asarray(pairs[1]), cond, uc)
    _ = np.asarray(xt[0, 0, 0, 0, :2])
    tile_s = time.perf_counter() - t0

    t_total = step_s * args.steps
    suffix = "_sta" if args.attn == "sta" else ""
    return {
        "metric": f"long_clip_{args.frames}f_512p_{args.attn}",
        # steady-state tiled-step time x args.steps (first/compile step
        # excluded) -- partly projected, named so
        f"sampling_s_extrapolated_{args.steps}step": round(t_total, 1),
        "value": round(t_total, 1),
        "unit": f"s ({args.steps}-step tiled sampling, extrapolated "
                "from steady-state steps)",
        "tiled_step_s": round(step_s, 2),
        "measured_steps": n_meas,
        "single_tile_step_s": round(tile_s, 2),
        "n_tiles": n_tiles,
        "tile_denoises_per_step": 2 * (n_tiles - 1),
        # realized overhead vs n_tiles x the single-tile cost: the
        # overlap-blend redundancy (FLOP-level floor: 2*(n_tiles-1)/n_tiles)
        "overlap_overhead_vs_ntiles": round(step_s / (n_tiles * tile_s), 3),
        "flop_floor_ratio": round(2 * (n_tiles - 1) / n_tiles, 3),
        f"long_clip_s{suffix}": round(t_total, 1),
        "device": str(dev),
    }


if __name__ == "__main__":
    main()
