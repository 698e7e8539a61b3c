"""Deterministic end-to-end fingerprints for weights day (VERDICT r4
item 7): fixed-seed, random-weight sampling statistics -- per-step latent
norms + final-sample stats/hash -- for the dense, STA, and long-tile
paths, recorded as goldens and re-checked each round.

Why: when real weights land, quality deltas must separate CONVERSION
bugs from CODE drift; these goldens pin full-geometry numerics
round-over-round (the examples/001 fidelity-anchor role,
/root/reference/README.md:102-110, until the real anchor is runnable).

Two golden sets:
  * tiny geometry, CPU  -> goldens/fingerprints_cpu.json, enforced by
    tests/test_fingerprints.py every suite run (tight rtol).
  * full 512p geometry, TPU -> goldens/fingerprints_tpu.json, recorded /
    re-checked on-chip each round:
      python scripts/fingerprints.py record   # writes/updates goldens
      python scripts/fingerprints.py check    # compares, rc!=0 on drift

Norms are the pass/fail signal (bitwise hashes are informational only:
they break on any compiler/runtime version bump, norms survive
reduction-order changes within rtol).
"""

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GOLDENS_DIR = os.path.join(os.path.dirname(__file__), "..", "goldens")

# full-geometry paths (TPU): 1.3B at the production 512p workload
FULL_GEOMS = {
    "dense": dict(kind="step", frames=81, attn="pallas", steps=4),
    "sta": dict(kind="step", frames=81, attn="sta", steps=4),
    "long_tile": dict(kind="long", frames=161, attn="pallas", steps=3),
}
# tiny-geometry paths (CPU test): same code paths, toy sizes
TINY_GEOMS = {
    "dense": dict(kind="step", frames=9, attn="xla", steps=4, tiny=True),
    "sta": dict(kind="step", frames=9, attn="sta", steps=4, tiny=True),
    "long_tile": dict(kind="long", frames=25, attn="xla", steps=3, tiny=True),
}


def _build(geom):
    """Build (step_fn, x0, pairs) for one path; step_fn: (x, pair) -> x."""
    import jax
    import jax.numpy as jnp

    from scail_tpu.diffusion.denoiser import Denoiser
    from scail_tpu.diffusion.samplers import (RFSampler, RFSamplerLong,
                                              make_tile_indices)
    from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params

    tiny = geom.get("tiny", False)
    if tiny:
        T = (geom["frames"] - 1) // 4 + 1
        H, W = 8, 8
        cfg = DiTConfig(
            hidden_size=64, num_layers=2, num_heads=2, inner_hidden_size=128,
            time_embed_dim=64, text_dim=32, clip_dim=16, share_adaln=True,
            use_i2v_clip=True, dtype="float32", attn_impl=geom["attn"],
            sta_tile=(1, 2), sta_window=(2, 2))
        s_txt, s_clip = 16, 9
        tile, overlap = 3, 1
    else:
        T = (geom["frames"] - 1) // 4 + 1
        H, W = 64, 112
        cfg = DiTConfig(
            hidden_size=1536, num_layers=30, num_heads=12,
            inner_hidden_size=8960, time_embed_dim=1536, share_adaln=True,
            use_i2v_clip=True, dtype="bfloat16", attn_impl=geom["attn"])
        s_txt, s_clip = 512, 257
        tile, overlap = 21, 8

    import jax

    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda p: p.astype(cfg.compute_dtype),
                          init_dit_params(key, cfg))
    ks = jax.random.split(key, 8)
    cdt = cfg.compute_dtype
    cond = {
        "crossattn": jax.random.normal(ks[1], (1, s_txt, cfg.text_dim), cdt),
        "ref_concat": jax.random.normal(ks[2], (1, 1, 16, H, W), cdt),
        "image_clip_features": jax.random.normal(
            ks[3], (1, s_clip, cfg.clip_dim), cdt),
    }
    denoiser = Denoiser(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"},
    )
    skw = dict(
        hunyuan_schedule=True, shift_scale=5, num_steps=50, mode="normal",
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.RFDiscretization"},
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
            "params": {"scale": 4}},
    )

    def net(x, c_noise, c, **kw):
        return dit_forward(params, cfg, x, c_noise, c["crossattn"],
                           ref_concat=c["ref_concat"],
                           concat_smpl_render=c["concat_smpl_render"],
                           image_clip_features=c["image_clip_features"])

    def denoise_fn(x, sigma, c, cfg_scale=None, **kw):
        return denoiser(net, x, sigma, c)

    x0 = jax.random.normal(jax.random.PRNGKey(7), (1, T, 16, H, W),
                           jnp.float32)

    if geom["kind"] == "long":
        sampler = RFSamplerLong(**skw)
        tiles = make_tile_indices(T, tile, overlap)
        tile_t = tuple(tuple(t) for t in tiles)
        Tt = len(tiles[0])
        cond = dict(cond)
        cond["smpl_tiled"] = jax.random.normal(
            ks[4], (1, len(tiles), Tt, 16, H // 2, W // 2), cdt)
        uc = dict(cond)
        uc["crossattn"] = jnp.zeros_like(cond["crossattn"])

        @jax.jit
        def step_fn(x, pair):
            return sampler.long_step(denoise_fn, x, pair, tile_t, cond, uc)
    else:
        sampler = RFSampler(**skw)
        cond = dict(cond)
        cond["concat_smpl_render"] = jax.random.normal(
            ks[4], (1, T, 16, H // 2, W // 2), cdt)
        uc = dict(cond)
        uc["crossattn"] = jnp.zeros_like(cond["crossattn"])
        merged = sampler.guider.prepare_cond(cond, uc)

        @jax.jit
        def step_fn(x, pair):
            sigma, next_sigma = pair[0], pair[1]
            s2 = jnp.full((2,), sigma, jnp.float32)
            x2 = jnp.concatenate([x, x], axis=0)
            v = denoiser(net, x2, s2, merged).astype(jnp.float32)
            v = sampler.guider(v, sigma, scale=sampler.guider.scale)
            return x + (next_sigma - sigma) * v

    sigmas = sampler.sigma_schedule(x0.shape)
    pairs = np.stack([sigmas[:-1], sigmas[1:]], axis=1)
    return step_fn, x0, pairs


def compute_fingerprint(geom):
    """Run `steps` denoise steps; return per-step latent norms + final
    stats + an informational content hash."""
    import jax.numpy as jnp

    step_fn, x, pairs = _build(geom)
    norms, deltas = [], []
    prev = np.asarray(x, np.float32)
    for i in range(min(geom["steps"], len(pairs))):
        x = step_fn(x, jnp.asarray(pairs[i]))
        xa = np.asarray(x, np.float32)
        norms.append(float(np.linalg.norm(xa)))
        # the per-step UPDATE norm is the sensitive signal: ||x|| barely
        # moves early in the sigma ladder, the velocity-sized delta does
        deltas.append(float(np.linalg.norm(xa - prev)))
        prev = xa
    return {
        "step_norms": [round(n, 4) for n in norms],
        "delta_norms": [round(n, 5) for n in deltas],
        "final_mean": round(float(xa.mean()), 6),
        "final_std": round(float(xa.std()), 6),
        "final_hash": hashlib.sha256(xa.tobytes()).hexdigest()[:16],
    }


def compute_all(geoms, verbose=True):
    out = {}
    for name, geom in geoms.items():
        t0 = time.perf_counter()
        out[name] = compute_fingerprint(geom)
        if verbose:
            print(f"{name}: norms={out[name]['step_norms']} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
    return out


def compare(got, want, rtol):
    """Return a list of drift messages (empty = match).  Norms/stats are
    the contract; the hash is reported but not enforced."""
    msgs = []
    for name, w in want.items():
        g = got.get(name)
        if g is None:
            msgs.append(f"{name}: missing from current run")
            continue
        for key in ("step_norms", "delta_norms"):
            for a, b in zip(g.get(key, []), w.get(key, [])):
                if abs(a - b) > rtol * abs(b):
                    msgs.append(f"{name}: {key} drifted {g[key]} "
                                f"vs golden {w[key]}")
                    break
        for k in ("final_mean", "final_std"):
            if abs(g[k] - w[k]) > rtol * max(abs(w[k]), 1e-3):
                msgs.append(f"{name}: {k} {g[k]} vs golden {w[k]}")
        if g["final_hash"] != w["final_hash"]:
            msgs.append(f"{name}: hash changed (informational; norms "
                        f"{'match' if not msgs else 'ALSO drifted'})")
    # hash-only changes are informational -> filter unless paired with drift
    hard = [m for m in msgs if "informational" not in m]
    return hard, msgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["record", "check"])
    ap.add_argument("--set", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--rtol", type=float, default=5e-3,
                    help="norm tolerance for check (bf16 full geometry; "
                         "use 1e-5 for the fp32 cpu set)")
    args = ap.parse_args()

    geoms = FULL_GEOMS if args.set == "tpu" else TINY_GEOMS
    path = os.path.join(GOLDENS_DIR, f"fingerprints_{args.set}.json")
    os.makedirs(GOLDENS_DIR, exist_ok=True)

    if args.set == "cpu":
        from scail_tpu.utils.platform import force_platform

        force_platform("cpu")
    got = compute_all(geoms)

    if args.mode == "record":
        import jax

        with open(path, "w") as f:
            json.dump({"device": str(jax.devices()[0]),
                       "fingerprints": got}, f, indent=2)
        print(f"recorded -> {path}")
        return
    with open(path) as f:
        want = json.load(f)["fingerprints"]
    hard, msgs = compare(got, want, args.rtol)
    for m in msgs:
        print(("DRIFT: " if m in hard else "note: ") + m)
    if hard:
        sys.exit(1)
    print("fingerprints match")


if __name__ == "__main__":
    main()
