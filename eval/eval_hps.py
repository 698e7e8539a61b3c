"""HPSv2 human-preference score (reference: eval/eval_hps.py): mean cosine
of normalized image/text embeddings under the HPS_v2-fine-tuned open_clip
ViT-H-14.  Pass --hps-weights HPS_v2*.pt (open_clip state dict, loaded
from checkpoint['state_dict']); without it the scorer runs the pipeline in
random-init smoke mode."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a jax platform (the sitecustomize-pinned env "
                         "var is otherwise ignored; cpu = run off-tunnel)")
    ap.add_argument("--images", required=True)
    ap.add_argument("--prompts", required=True)
    ap.add_argument("--hps-weights", default=None,
                    help="HPS_v2*.pt (open_clip ViT-H state dict) or an "
                         "HF-format CLIP state dict")
    ap.add_argument("--tokenizer", default=None)
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

    scorer = JaxClipScorer(args.hps_weights, args.tokenizer)
    score = compute_clip_score(images, prompts, scorer.image_embed,
                               scorer.text_embed)
    # the reference prints the plain mean cosine (eval_hps.py:125-129)
    print(f"Average HPS: {score / 100.0:.6f}")


if __name__ == "__main__":
    main()
