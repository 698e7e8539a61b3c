"""One-command weights-day validation (VERDICT r2 item 5).

The released SCAIL checkpoints are the only gate left on the BASELINE
configs; when they land, this single command runs the whole acceptance
chain (reference pipeline: eval/calculate_fvd.py:24-120 + README
"Evaluation"):

  1. convert   released torch artifacts -> Orbax bundle
               (scripts/convert_checkpoint.py)
  2. sample    every example case, dense attention
               (scail_tpu.cli.sample_video, the production CLI path)
  3. sample    the same cases with --attn-impl sta (turbo sampling)
  4. eval      FVD(GT, dense), FVD(GT, sta), CLIP-score(dense, prompts)
  5. gate      if FVD_sta <= FVD_dense * --sta-tol the STA quality is
               validated: write <ckpt>/sta_validated.json, which flips
               the CLI's default attn_impl to 'sta' for this checkpoint
               (scail_tpu/cli/arguments.py).

Without real weights every stage still runs (random init + synthetic
example = smoke mode — exercised by tests/test_validate_weights.py), so
weights-day is turnkey: only the artifact paths change.

Each stage is a subprocess: the TPU tunnel is exclusive (memory: env
quirks), so the orchestrator itself must never import jax.

Usage:
  python scripts/validate_weights.py --weights SCAIL-Preview/ \
      --examples examples/ --out runs/validate \
      --i3d i3d_pretrained_400.pt --clip-weights CLIP-ViT-g-14.bin
  # smoke (no weights):
  python scripts/validate_weights.py --smoke --out /tmp/validate
"""

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    return subprocess.run(cmd, cwd=REPO, text=True, capture_output=True, **kw)


def find_cases(examples_dir):
    """Example dirs with a ref image + rendered pose video (the CLI's
    input contract); prompt from <case>/prompt.txt else a default."""
    cases = []
    for d in sorted(glob.glob(os.path.join(examples_dir, "*"))):
        if not os.path.isdir(d):
            continue
        has_ref = any(glob.glob(os.path.join(d, p))
                      for p in ("ref.*", "ref_image.*"))
        has_pose = any(glob.glob(os.path.join(d, p))
                       for p in ("rendered*.mp4", "rendered*.gif",
                                 "rendered*.npz", "rendered*.npy"))
        if has_ref and has_pose:
            pf = os.path.join(d, "prompt.txt")
            prompt = (open(pf).read().strip() if os.path.isfile(pf)
                      else "a person dancing, high quality video")
            cases.append((d, prompt))
    return cases


def write_prompt_file(cases, path):
    with open(path, "w") as f:
        for d, prompt in cases:
            f.write(f"{prompt}@@{d}\n")


def collect_outputs(sample_out_dir, dst):
    """Flatten <out>/<case>/<case>_output_*.mp4 into one dir for FVD."""
    os.makedirs(dst, exist_ok=True)
    n = 0
    for f in sorted(glob.glob(os.path.join(sample_out_dir, "*", "*output*"))):
        if f.endswith((".mp4", ".gif")):
            shutil.copy(f, os.path.join(dst, f"{n:04d}_" + os.path.basename(f)))
            n += 1
    return n


def collect_gt(cases, dst):
    os.makedirs(dst, exist_ok=True)
    n = 0
    for d, _ in cases:
        for f in sorted(glob.glob(os.path.join(d, "GT.*"))):
            if f.endswith((".mp4", ".gif")):
                shutil.copy(f, os.path.join(dst, f"{n:04d}_" + os.path.basename(f)))
                n += 1
    return n


def extract_middle_frames(video_dir, dst):
    """Middle frame of each video as PNG (for the CLIP-score stage);
    imageio only — the orchestrator never imports jax."""
    import imageio.v2 as imageio

    os.makedirs(dst, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(video_dir)):
        if not f.endswith((".mp4", ".gif")):
            continue
        try:
            frames = imageio.mimread(os.path.join(video_dir, f), memtest=False)
        except Exception:
            continue
        if frames:
            imageio.imwrite(os.path.join(dst, f + ".png"),
                            np.asarray(frames[len(frames) // 2])[..., :3])
            n += 1
    return n


def parse_tail_float(text, prefix):
    """Last 'prefix: <float>' line in text."""
    val = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith(prefix):
            try:
                val = float(line[len(prefix):].split()[0])
            except ValueError:
                pass
    return val


def sta_gate(fvd_dense, fvd_sta, tol):
    """STA is validated when its FVD is within tol of dense (both vs GT).
    tol is multiplicative on the dense score with an absolute floor of
    +5.0 FVD for near-zero dense scores."""
    if fvd_dense is None or fvd_sta is None:
        return False
    return fvd_sta <= max(fvd_dense * tol, fvd_dense + 5.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help="released torch artifact dir (SCAIL-Preview); "
                         "omit for random-init smoke mode")
    ap.add_argument("--converted", default=None,
                    help="existing converted Orbax dir (skips conversion)")
    ap.add_argument("--model-yaml",
                    default="configs/video_model/scail_14b.yaml")
    ap.add_argument("--sampling-yaml", default="configs/sampling/pose_cli.yaml")
    ap.add_argument("--examples", default="examples_synth")
    ap.add_argument("--out", default="runs/validate")
    ap.add_argument("--i3d", default=None, help="i3d_pretrained_400.pt")
    ap.add_argument("--clip-weights", default=None,
                    help="HF CLIPModel weights for the CLIP score")
    ap.add_argument("--sta-tol", type=float, default=1.10,
                    help="STA passes if FVD_sta <= FVD_dense * tol")
    ap.add_argument("--smoke", action="store_true",
                    help="random weights, CPU, tiny geometry, 2 steps")
    ap.add_argument("--sample-extra", nargs="*", default=[],
                    help="extra flags forwarded to the sampling CLI")
    args = ap.parse_args(argv)

    if args.smoke and args.model_yaml == "configs/video_model/scail_14b.yaml":
        # CPU smoke at 14B is hours; the 1.3B config exercises the same path
        args.model_yaml = "configs/video_model/scail_1p3b.yaml"

    os.makedirs(args.out, exist_ok=True)
    report = {"stages": {}}

    # ---- stage 1: convert -------------------------------------------------
    converted = args.converted
    if converted is None and args.weights:
        converted = os.path.join(args.out, "converted")
        r = sh([sys.executable, "scripts/convert_checkpoint.py",
                args.weights, converted, "--model-yaml", args.model_yaml],
               env=dict(os.environ, JAX_PLATFORMS="cpu"))
        report["stages"]["convert"] = {"rc": r.returncode,
                                       "tail": r.stdout[-500:]}
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            print(json.dumps(report))
            return 1
    elif converted is None:
        print("[validate] no --weights: random-init smoke mode")

    # ---- stage 2+3: sample dense, then sta --------------------------------
    cases = find_cases(args.examples)
    if not cases:
        print(f"[validate] no example cases under {args.examples}",
              file=sys.stderr)
        print(json.dumps(report))
        return 1
    prompts_path = os.path.join(args.out, "prompts.txt")
    write_prompt_file(cases, prompts_path)

    base_cmd = [sys.executable, "-m", "scail_tpu.cli.sample_video",
                "--base", args.model_yaml, args.sampling_yaml,
                "--input-type", "txt", "--input-file", prompts_path]
    if converted:
        base_cmd += ["--load", converted]
    if args.smoke:
        base_cmd += ["--platform", "cpu", "--sampling-steps", "2",
                     "--image-size", "64", "64", "--sampling-num-frames", "5"]
    base_cmd += list(args.sample_extra)

    results = {}
    for mode, impl_flags in (("dense", []), ("sta", ["--attn-impl", "sta"])):
        out_dir = os.path.join(args.out, f"samples_{mode}")
        r = sh(base_cmd + ["--output-dir", out_dir] + impl_flags)
        n = collect_outputs(out_dir, os.path.join(args.out, f"flat_{mode}"))
        report["stages"][f"sample_{mode}"] = {"rc": r.returncode, "videos": n}
        if r.returncode != 0 or n == 0:
            print(r.stderr[-3000:], file=sys.stderr)
            print(json.dumps(report))
            return 1
        results[mode] = os.path.join(args.out, f"flat_{mode}")

    # ---- stage 4: eval ----------------------------------------------------
    n_gt = collect_gt(cases, os.path.join(args.out, "flat_gt"))
    report["stages"]["gt_videos"] = n_gt
    fvd = {}
    for mode in ("dense", "sta"):
        cmd = [sys.executable, "eval/calculate_fvd.py",
               "--real", os.path.join(args.out, "flat_gt"),
               "--fake", results[mode]]
        if args.i3d:
            cmd += ["--i3d", args.i3d]
        if args.smoke:
            # env alone is ignored (sitecustomize pins the tunnel); the
            # flag sets jax.config too, keeping smoke off the exclusive TPU
            cmd += ["--platform", "cpu"]
        r = sh(cmd)
        fvd[mode] = parse_tail_float(r.stdout, "FVD:")
        report["stages"][f"fvd_{mode}"] = {"rc": r.returncode,
                                           "value": fvd[mode]}

    # CLIP score runs on frames: pull the middle frame of every dense
    # output video (eval/eval_clip_score.py scores image dirs, matching
    # the reference's frame-dump workflow)
    img_dir = os.path.join(args.out, "frames_dense")
    n_frames = extract_middle_frames(results["dense"], img_dir)
    clip_score = None
    if n_frames:
        pf = os.path.join(args.out, "clip_prompts.txt")
        with open(pf, "w") as f:
            for _, prompt in cases:
                f.write(prompt + "\n")
        cmd = [sys.executable, "eval/eval_clip_score.py",
               "--images", img_dir, "--prompts", pf]
        if args.clip_weights:
            cmd += ["--clip-weights", args.clip_weights]
        if args.smoke:
            cmd += ["--platform", "cpu"]
        r = sh(cmd)
        clip_score = parse_tail_float(r.stdout, "CLIP score:")
        report["stages"]["clip_score"] = {"rc": r.returncode,
                                          "value": clip_score}

    # ---- stage 5: the STA gate -------------------------------------------
    validated = sta_gate(fvd["dense"], fvd["sta"], args.sta_tol)
    report.update(fvd_dense=fvd["dense"], fvd_sta=fvd["sta"],
                  clip_score=clip_score, sta_validated=bool(validated),
                  smoke=bool(args.smoke or not converted))
    if validated and converted:
        marker = os.path.join(converted, "sta_validated.json")
        with open(marker, "w") as f:
            json.dump({"validated": True, "fvd_dense": fvd["dense"],
                       "fvd_sta": fvd["sta"], "sta_tol": args.sta_tol}, f)
        report["marker"] = marker
        print(f"[validate] STA quality gate PASSED -> {marker} "
              "(CLI now defaults to attn_impl='sta' for this checkpoint)")
    elif validated:
        print("[validate] STA gate passed (smoke mode: no marker written "
              "without a converted checkpoint)")
    else:
        print(f"[validate] STA gate NOT passed "
              f"(dense={fvd['dense']}, sta={fvd['sta']}); "
              "dense stays the default")

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
