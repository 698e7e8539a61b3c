"""CLIP score of an image directory vs a prompt file
(reference: eval/eval_clip_score.py, open_clip ViT-g-14)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a jax platform (the sitecustomize-pinned env "
                         "var is otherwise ignored; cpu = run off-tunnel)")
    ap.add_argument("--images", required=True)
    ap.add_argument("--prompts", required=True)
    ap.add_argument("--clip-weights", default=None,
                    help="HF CLIPModel state dict (.bin/.safetensors), e.g. "
                         "laion/CLIP-ViT-g-14-laion2B-s12B-b42K; smoke mode "
                         "with random init when omitted")
    ap.add_argument("--tokenizer", default=None,
                    help="HF tokenizer dir/name (fallback hash tokenizer "
                         "without it)")
    args = ap.parse_args()
    from scail_tpu.utils.platform import force_platform

    force_platform(args.platform)

    from PIL import Image

    from scail_tpu.evals.clip_score import JaxClipScorer, compute_clip_score

    with open(args.prompts) as f:
        prompts = [l.strip() for l in f if l.strip()]
    names = sorted(f for f in os.listdir(args.images)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    images = [Image.open(os.path.join(args.images, n)).convert("RGB") for n in names]
    assert len(images) == len(prompts), (len(images), len(prompts))

    scorer = JaxClipScorer(args.clip_weights, args.tokenizer)
    score = compute_clip_score(images, prompts, scorer.image_embed,
                               scorer.text_embed)
    # the reference prints the plain mean cosine (eval_clip_score.py:96-99)
    print(f"CLIP score: {score:.4f} (Average CLIP Score: {score / 100.0:.6f})")


if __name__ == "__main__":
    main()
