"""Training-step benchmark at the full 512p SCAIL geometry (VERDICT r1
item 7): RF loss + backward + fused EMA-Adam update on the 1.3B DiT,
48,832-token fused sequence, bf16, Pallas flash attention with custom
VJP, remat on.

Reports step time and achieved TFLOP/s using the standard 3x-forward
training-FLOPs convention (remat recompute excluded, so printed MFU is
conservative).  Run manually on the chip:
  python scripts/bench_train_step.py [--iters 4] [--no-remat]
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
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--frames", type=int, default=81)
    # Adam+EMA keeps 3 full-size states (sat/ops/csrc parity) = 7.9GB at
    # 1.3B bf16 on top of params+grads+remat carries -> exceeds one 16GB
    # chip; production trains it with the opt state sharded over the mesh
    # (ZeRO layout).  Single-chip default is Adafactor, the classic
    # TPU-native big-model optimizer (factored second moment ~ 0 extra).
    ap.add_argument("--optimizer", choices=["adafactor", "ema_adam"],
                    default="adafactor")
    ap.add_argument("--mode", choices=["step", "grad", "fwd"], default="step",
                    help="time the full step, grad-only, or fwd-only loss")
    ap.add_argument("--remat-policy", default="default",
                    choices=["default", "save_attn", "offload_attn",
                             "save_attn_frac"])
    ap.add_argument("--save-frac", type=float, default=0.5)
    ap.add_argument("--attn-impl", default=None,
                    help="override the self-attention impl (e.g. 'sta' to "
                         "measure the windowed-VJP training step)")
    args = ap.parse_args()
    print(json.dumps(run(args)))


def run(args):
    """Build + time the training step; returns the report dict (also used
    by bench.py to fold a measured train-step number into its extras)."""
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import optax

    from scail_tpu.diffusion.denoiser import Denoiser
    from scail_tpu.diffusion.loss import RFLoss
    from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params
    from scail_tpu.training.ema_adam import fused_ema_adam

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if on_tpu:
        cfg = DiTConfig(
            hidden_size=1536, num_layers=30, num_heads=12,
            inner_hidden_size=8960, time_embed_dim=1536, share_adaln=True,
            use_i2v_clip=True, dtype="bfloat16", attn_impl="pallas",
            remat=not args.no_remat, remat_policy=args.remat_policy,
            remat_save_frac=args.save_frac)
        b, T, H, W = 1, (args.frames - 1) // 4 + 1, 64, 112
        s_txt, s_clip = 512, 257
        peak_tflops = 197.0
    else:
        cfg = DiTConfig(
            hidden_size=128, num_layers=2, num_heads=2, inner_hidden_size=256,
            time_embed_dim=128, text_dim=64, clip_dim=32, share_adaln=True,
            use_i2v_clip=True, dtype="float32", attn_impl="xla",
            remat=not args.no_remat, remat_policy=args.remat_policy,
            remat_save_frac=args.save_frac)
        b, T, H, W = 1, 2, 8, 8
        s_txt, s_clip = 16, 9
        peak_tflops = 1.0
    if args.attn_impl:
        import dataclasses
        cfg = dataclasses.replace(cfg, attn_impl=args.attn_impl)

    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda p: p.astype(cfg.compute_dtype),
                          init_dit_params(key, cfg))
    if cfg.remat_policy == "save_attn_frac":
        from scail_tpu.models.dit import split_layer_params
        # pre-split outside jit so the two scans don't materialize
        # head/tail copies next to the stacked originals (+2.6GB at 1.3B)
        params = split_layer_params(params, cfg)
    n_params = sum(p.size for p in jax.tree.leaves(params))

    if args.optimizer == "ema_adam":
        tx = fused_ema_adam(lambda _: 1e-4, weight_decay=0.01,
                            ema_decay=0.9999)
    else:
        tx = optax.adafactor(1e-4)
    opt_state = tx.init(params)

    ks = jax.random.split(key, 8)
    latents = jax.random.normal(ks[0], (b, T, 16, H, W), jnp.float32)
    cond = {
        "crossattn": jax.random.normal(ks[1], (b, s_txt, cfg.text_dim),
                                       cfg.compute_dtype),
        "ref_concat": jax.random.normal(ks[2], (b, 1, 16, H, W),
                                        cfg.compute_dtype),
        "concat_smpl_render": jax.random.normal(
            ks[3], (b, T, 16, H // 2, W // 2), cfg.compute_dtype),
        "image_clip_features": jax.random.normal(
            ks[4], (b, s_clip, cfg.clip_dim), cfg.compute_dtype),
    }

    loss_obj = RFLoss(
        schedule_shift=True,
        sigma_sampler_config={
            "target": "sgm.modules.diffusionmodules.sigma_sampling.RFSampling",
            "params": {"p_mean": 0.0, "p_std": 1.0}})
    denoiser = Denoiser(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"})

    def train_step(params, opt_state, key, latents, cond):
        def loss_of(p):
            def net(x, c_noise, c, **kw):
                return dit_forward(
                    p, cfg, x, c_noise, c["crossattn"],
                    ref_concat=c["ref_concat"],
                    concat_smpl_render=c["concat_smpl_render"],
                    image_clip_features=c["image_clip_features"])

            return jnp.mean(loss_obj(key, net, denoiser, cond, latents))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def loss_of_p(p, key):
        def net(x, c_noise, c, **kw):
            return dit_forward(
                p, cfg, x, c_noise, c["crossattn"],
                ref_concat=c["ref_concat"],
                concat_smpl_render=c["concat_smpl_render"],
                image_clip_features=c["image_clip_features"])

        return jnp.mean(loss_obj(key, net, denoiser, cond, latents))

    if args.mode == "fwd":
        fwd_fn = jax.jit(loss_of_p)
        loss = fwd_fn(params, ks[5])
        _ = float(loss)
        t0 = time.perf_counter()
        for i in range(args.iters):
            loss = fwd_fn(params, jax.random.fold_in(ks[5], i))
        _ = float(loss)
        step_s = (time.perf_counter() - t0) / args.iters
    elif args.mode == "grad":
        # self-feeding (grads have the params tree) + donation keeps one
        # param-sized buffer live
        gfn = jax.jit(lambda p, key: jax.grad(loss_of_p)(p, key),
                      donate_argnums=(0,))
        params = gfn(params, ks[5])
        _ = float(jax.tree.leaves(params)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for i in range(args.iters):
            params = gfn(params, jax.random.fold_in(ks[5], i))
        _ = float(jax.tree.leaves(params)[0].reshape(-1)[0])
        step_s = (time.perf_counter() - t0) / args.iters
        loss = jnp.zeros([])
    else:
        step = jax.jit(train_step, donate_argnums=(0, 1))
        params, opt_state, loss = step(params, opt_state, ks[5], latents, cond)
        _ = float(loss)  # compile + warmup barrier
        t0 = time.perf_counter()
        for i in range(args.iters):
            params, opt_state, loss = step(
                params, opt_state, jax.random.fold_in(ks[5], i), latents, cond)
        _ = float(loss)
        step_s = (time.perf_counter() - t0) / args.iters

    # standard training-FLOPs convention: 3x a forward (1x for mode=fwd)
    Hp, Wp = H // 2, W // 2
    S = Hp * Wp + T * Hp * Wp + T * (Hp // 2) * (Wp // 2)
    h, inner, L = cfg.hidden_size, cfg.inner_hidden_size, cfg.num_layers
    attn_pl = 4 * S * S * h + 4 * S * (s_txt + s_clip) * h
    per_layer = (2 * S * 3 * h * h + 2 * S * h * h
                 + 2 * S * h * h + 2 * s_txt * 2 * h * h
                 + 2 * s_clip * 2 * h * h + attn_pl
                 + 2 * S * h * h + 2 * S * 2 * h * inner)
    fwd = b * L * per_layer
    counted_mult = 1 if args.mode == "fwd" else 3
    counted = fwd * counted_mult
    tflops = counted / step_s / 1e12
    extras = {
        "seq_tokens": S,
        "params": n_params,
        # counted = counted_multiplier x one DENSE forward (the standard
        # training-FLOPs convention); for attn_impl='sta' this makes the
        # MFU a DENSE-EQUIVALENT number -- see executed_tflops for the
        # rate of work actually performed
        "counted_multiplier": counted_mult,
        "achieved_tflops_counted": round(tflops, 1),
        "train_mfu_vs_peak": round(tflops / peak_tflops, 4),
        "remat": cfg.remat,
        "remat_policy": cfg.remat_policy,
        "optimizer": args.optimizer,
        "attn_impl": cfg.attn_impl,
        "loss": float(loss),
        "device": str(dev),
    }
    if args.mode != "fwd":
        # keep the historical key, but ONLY when it really is 3x-forward
        # (a mode=fwd run used to reuse it for a 1x number)
        extras["achieved_tflops_3xfwd"] = round(tflops, 1)
    # EXECUTED flops (the bwd ceiling identity, docs/TRAINING.md):
    # flash bwd runs 7 matmuls per tile = 3.5x its fwd, remat re-runs
    # (L-k) full + k dense-only layers; the 3xfwd convention books
    # none of that.  executed/time is the rate to compare against the
    # calibration probe.  For sta the self-attention term shrinks to the
    # executed (q, kv) pairs of the block table (ops/sta.py
    # sta_executed_pairs; fwd/bwd kernels walk the same tables).
    self_f = b * L * 4 * S * S * h
    cross_f = b * L * attn_pl - self_f
    dense_f = fwd - b * L * attn_pl
    # mirror dit_forward's dense fallback: sta only engages when the
    # strip tiles divide the latent grid (models/dit.py sta_resident)
    sta_sparse = (cfg.attn_impl == "sta"
                  and T % cfg.sta_tile[0] == 0 and Hp % cfg.sta_tile[1] == 0)
    if sta_sparse:
        from scail_tpu.ops.sta import sta_executed_pairs

        pairs = sta_executed_pairs(
            (T, Hp, Wp), Hp * Wp, T * (Hp // 2) * (Wp // 2),
            cfg.sta_tile, cfg.sta_window,
            windowed_pose=cfg.sta_windowed_pose,
            pose_kv_window=cfg.sta_pose_kv_window)
        self_exec = b * L * 4 * pairs * h
        extras["sta_attn_exec_frac"] = round(pairs / (S * S), 4)
    else:
        self_exec = self_f
    attn_exec = self_exec + cross_f
    fwd_exec = dense_f + attn_exec
    if args.mode == "fwd":
        executed = fwd_exec
    else:
        if cfg.remat:
            if cfg.remat_policy in ("save_attn", "offload_attn"):
                k_head = L
            elif cfg.remat_policy == "save_attn_frac":
                from scail_tpu.models.dit import save_attn_head_layers
                k_head = save_attn_head_layers(cfg)
            else:
                k_head = 0
            rec = (k_head / L) * dense_f + ((L - k_head) / L) * fwd_exec
        else:
            rec = 0.0
        executed = fwd_exec + rec + 2 * dense_f + 3.5 * attn_exec
    extras["executed_tflops"] = round(executed / step_s / 1e12, 1)
    extras["executed_over_counted"] = round(executed / counted, 3)
    return {
        "metric": "dit_1p3b_train_step_s_512p" if on_tpu else "train_smoke_s",
        "value": round(step_s, 3),
        "unit": "s",
        "vs_baseline": round(tflops / peak_tflops, 4),
        "extras": extras,
    }


if __name__ == "__main__":
    main()
