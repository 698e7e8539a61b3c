"""Benchmark: DiT denoise step at the full SCAIL 512p workload.

Runs the flagship DiT architecture at the real sampling geometry (latent
21x64x112, fused sequence 48,832 tokens, CFG batch 2, bf16, Pallas flash
attention) on whatever accelerator is available and prints ONE JSON line:

  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The upstream repo publishes no wall-clock numbers (BASELINE.md), so
`vs_baseline` reports model FLOPs utilisation (measured TFLOP/s divided by
peak bf16 TFLOP/s of the chip) -- a hardware-portable figure of merit.

The single available chip (v5e, 16GB) cannot hold 14B bf16 params, so the
measured model is the 1.3B config (configs/video_model/scail_1p3b.yaml) at
the identical sequence geometry.  On TPU, `extras` additionally MEASURES
the BASELINE.json north-star companions (train-step s/MFU via
scripts/bench_train_step.run, VAE decode fps) in the same process — the
tunnel is exclusive, so no subprocesses (memory: env quirks).  Set
SCAIL_BENCH_FAST=1 to skip the extras.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _flops_per_forward(cfg, batch, S, s_txt, s_clip, T, Hp, Wp):
    h, inner, L = cfg.hidden_size, cfg.inner_hidden_size, cfg.num_layers
    per_layer = (
        2 * S * (3 * h * h)            # qkv
        + 2 * S * h * h                # attn out
        + 4 * S * S * h                # self attention (qk + pv)
        + 2 * S * h * h                # cross q
        + 2 * s_txt * 2 * h * h        # text kv
        + 2 * s_clip * 2 * h * h       # clip kv
        + 4 * S * (s_txt + s_clip) * h # cross attention x2 streams
        + 2 * S * h * h                # cross out
        + 2 * S * 2 * h * inner        # mlp
    )
    patch = 2 * S * (20 * 4) * h + 2 * (T * Hp * Wp) * h * (4 * 16)
    return batch * (L * per_layer + patch)


def _bench_inference(on_tpu, dev):
    from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params

    if on_tpu:
        cfg = DiTConfig(
            hidden_size=1536, num_layers=30, num_heads=12, inner_hidden_size=8960,
            time_embed_dim=1536, share_adaln=True, use_i2v_clip=True,
            dtype="bfloat16", attn_impl="pallas",
        )
        b, T, H, W = 1, 21, 64, 112          # 512x896, 81 frames
        s_txt, s_clip = 512, 257
        peak_tflops = 197.0                   # v5e bf16 peak
        label = "dit_1p3b_step_ms_512p"
    else:
        # CPU smoke fallback so the bench always emits a line
        cfg = DiTConfig(
            hidden_size=128, num_layers=2, num_heads=2, inner_hidden_size=256,
            time_embed_dim=128, text_dim=64, clip_dim=32, share_adaln=True,
            use_i2v_clip=True, dtype="float32", attn_impl="xla",
        )
        b, T, H, W = 1, 2, 8, 8
        s_txt, s_clip = 16, 9
        peak_tflops = 1.0
        label = "dit_smoke_step_ms"

    key = jax.random.PRNGKey(0)
    params = init_dit_params(key, cfg)
    params = jax.tree.map(lambda p: p.astype(cfg.compute_dtype), params)

    ks = jax.random.split(key, 8)
    cb = 2 * b  # CFG doubled batch
    x = jax.random.normal(ks[0], (cb, T, 16, H, W), cfg.compute_dtype)
    tsteps = jnp.full((cb,), 500.0, jnp.float32)
    context = jax.random.normal(ks[1], (cb, s_txt, cfg.text_dim), cfg.compute_dtype)
    ref = jax.random.normal(ks[2], (cb, 1, 16, H, W), cfg.compute_dtype)
    pose = jax.random.normal(ks[3], (cb, T, 16, H // 2, W // 2), cfg.compute_dtype)
    clip_f = jax.random.normal(ks[4], (cb, s_clip, cfg.clip_dim), cfg.compute_dtype)

    @jax.jit
    def step(params, x, tsteps, context, ref, pose, clip_f):
        return dit_forward(
            params, cfg, x, tsteps, context,
            ref_concat=ref, concat_smpl_render=pose, image_clip_features=clip_f,
        )

    # compile + warmup; a host transfer (device_get) is the only reliable
    # completion barrier through the tunneled backend
    _ = np.asarray(step(params, x, tsteps, context, ref, pose, clip_f)[0, 0, 0, 0, :2])

    n_iter = 6 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(params, x, tsteps, context, ref, pose, clip_f)
    _ = np.asarray(out[0, 0, 0, 0, :2])
    step_ms = (time.perf_counter() - t0) / n_iter * 1000.0

    Hp, Wp = H // 2, W // 2
    S = Hp * Wp + T * Hp * Wp + T * (Hp // 2) * (Wp // 2)
    flops = _flops_per_forward(cfg, cb, S, s_txt, s_clip, T, Hp, Wp)
    tflops = flops / (step_ms / 1000.0) / 1e12
    mfu = tflops / peak_tflops
    return label, step_ms, mfu, tflops, S


def _calibration_probe(peak_tflops: float = 197.0):
    """In-session chip-state calibration (`mfu_normalized` = step MFU /
    probe_frac_of_peak, so a code regression separates from a slow-chip
    day).  Single shared implementation: utils/benchmarking.py."""
    from scail_tpu.utils.benchmarking import calibration_probe

    return calibration_probe(peak_tflops)


def _bench_train_step(attn_impl=None):
    """Measured train-step (1.3B, 48.8k tokens, remat save_attn_frac=0.7,
    Adafactor) via the shared scripts/bench_train_step.run;
    attn_impl='sta' measures the windowed-VJP sparse training step on the
    same geometry (same-session A/B vs the dense number)."""
    import argparse
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "scripts"))
    import bench_train_step

    args = argparse.Namespace(
        iters=2, no_remat=False, frames=81, optimizer="adafactor",
        mode="step", remat_policy="save_attn_frac", save_frac=0.7,
        attn_impl=attn_impl)
    rep = bench_train_step.run(args)
    suffix = f"_{attn_impl}" if attn_impl else ""
    out = {f"train_step_s{suffix}": rep["value"]}
    if attn_impl == "sta":
        # DENSE-EQUIVALENT MFU: the dense 3xfwd FLOP count over the
        # sparse step's time (the step deliberately skips most of that
        # work) -- useful as a speedup-vs-dense figure, NOT a real MFU
        out["train_denseq_mfu_sta"] = rep["vs_baseline"]
    else:
        out["train_mfu_vs_peak"] = rep["vs_baseline"]
        out["train_tflops_3xfwd"] = rep["extras"]["achieved_tflops_3xfwd"]
    # rate of work actually performed (bwd 3.5x identity + remat
    # recompute + sta executed pairs; scripts/bench_train_step.py)
    out[f"train_executed_tflops{suffix}"] = rep["extras"]["executed_tflops"]
    out[f"train_executed_over_counted{suffix}"] = (
        rep["extras"]["executed_over_counted"])
    if "sta_attn_exec_frac" in rep["extras"]:
        out["sta_attn_exec_frac"] = rep["extras"]["sta_attn_exec_frac"]
    return out


def _bench_long_clip(attn: str):
    """Measured long-video tiled sampling (RFSamplerLong, 161 frames /
    41 latent / 512p, 3 overlapping 21-frame tiles) via the shared
    scripts/bench_long_clip.run -- host-driven per tiled step."""
    import argparse
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "scripts"))
    import bench_long_clip

    args = argparse.Namespace(
        steps=50, measure_steps=2, frames=161, height=512, width=896,
        tile=21, overlap=8, attn=attn)
    rep = bench_long_clip.run(args)
    suffix = "_sta" if attn == "sta" else ""
    return {
        f"long_clip_s{suffix}": rep[f"long_clip_s{suffix}"],
        f"long_clip_tiled_step_s{suffix}": rep["tiled_step_s"],
        f"long_clip_overlap_overhead{suffix}":
            rep["overlap_overhead_vs_ntiles"],
    }


def _bench_vae_decode():
    """Streamed WanVAE decode of the 512p latent (21x64x112 -> 81 frames
    at 512x896); fps is the BASELINE.json north-star companion."""
    from scail_tpu.models.wan_vae import (WanVAEConfig, init_wan_vae_params,
                                          vae_decode)

    vcfg = WanVAEConfig(dtype="bfloat16")
    vparams = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                           init_wan_vae_params(jax.random.PRNGKey(1), vcfg))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 21, 16, 64, 112),
                          jnp.bfloat16)

    @jax.jit
    def decode(vparams, z):
        return vae_decode(vparams, vcfg, z, streamed=True)

    vid = decode(vparams, z)
    _ = np.asarray(vid[0, 0, 0, 0, :2])  # compile barrier
    t0 = time.perf_counter()
    vid = decode(vparams, z)
    _ = np.asarray(vid[0, 0, 0, 0, :2])
    t_dec = time.perf_counter() - t0
    return {"vae_decode_s": round(t_dec, 2),
            "vae_decode_fps": round(81 / t_dec, 2)}


def _probe_tpu(timeout_s: int = 240) -> bool:
    """The axon tunnel can wedge so hard that jax.devices() HANGS (not
    errors) — observed for 6+ hours straight on 2026-08-17.  Probe it in
    a killable subprocess so the bench always emits its JSON line (CPU
    smoke fallback) instead of hanging the driver."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices()[0]; print(d.platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0 and r.stdout.strip() in ("tpu", "axon")
    except subprocess.TimeoutExpired:
        return False


def main():
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if not os.environ.get("SCAIL_BENCH_SKIP_PROBE") and not _probe_tpu():
        print("bench: TPU probe failed/hung; falling back to the CPU "
              "smoke path", flush=True, file=sys.stderr)
        from scail_tpu.utils.platform import force_platform

        force_platform("cpu")
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"

    probe = {}
    if on_tpu:
        try:
            probe = _calibration_probe()
        except Exception as e:  # pragma: no cover - tunnel flake path
            probe = {"probe_error": repr(e)[:200]}

    label, step_ms, mfu, tflops, S = _bench_inference(on_tpu, dev)

    extras = {
        "seq_tokens": S,
        "achieved_tflops": round(tflops, 1),
        "mfu_vs_peak": round(mfu, 4),
        "derived_sec_per_clip_50step": round(step_ms * 50 / 1000.0, 2),
        # Historical measurements (14B e2e, W4A16, prior-round e2e) live
        # in README.md's dated RECORDED table -- this artifact carries
        # only numbers measured in THIS session plus the probe.
        "device": str(dev),
    }
    extras.update(probe)
    if probe.get("probe_frac_of_peak"):
        # step MFU normalized by today's bare-matmul fraction of peak:
        # chip-state drift divides out, code regressions remain
        extras["mfu_normalized"] = round(mfu / probe["probe_frac_of_peak"], 4)

    if on_tpu and not os.environ.get("SCAIL_BENCH_FAST"):
        # fail-soft: a flaky tunnel must not cost the primary metric
        try:
            extras.update(_bench_train_step())
        except Exception as e:  # pragma: no cover - tunnel flake path
            extras["train_step_error"] = repr(e)[:200]
        try:
            extras.update(_bench_train_step(attn_impl="sta"))
        except Exception as e:  # pragma: no cover
            extras["train_step_sta_error"] = repr(e)[:200]
        try:
            extras.update(_bench_vae_decode())
        except Exception as e:  # pragma: no cover
            extras["vae_decode_error"] = repr(e)[:200]
        for attn in ("pallas", "sta"):
            try:
                extras.update(_bench_long_clip(attn))
            except Exception as e:  # pragma: no cover
                extras[f"long_clip_{attn}_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": label,
        "value": round(step_ms, 2),
        "unit": "ms",
        "vs_baseline": round(mfu, 4),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
