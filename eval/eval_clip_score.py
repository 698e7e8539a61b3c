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
    ap.add_argument("--images", required=True)
    ap.add_argument("--prompts", required=True)
    ap.add_argument("--open-clip-model", default="ViT-g-14")
    ap.add_argument("--open-clip-pretrained", default="laion2b_s12b_b42k")
    args = ap.parse_args()

    from PIL import Image

    from scail_tpu.evals.clip_score import compute_clip_score

    with open(args.prompts) as f:
        prompts = [l.strip() for l in f if l.strip()]
    names = sorted(f for f in os.listdir(args.images)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    images = [Image.open(os.path.join(args.images, n)).convert("RGB") for n in names]

    try:
        import open_clip
        import torch

        model, _, preprocess = open_clip.create_model_and_transforms(
            args.open_clip_model, pretrained=args.open_clip_pretrained)
        tokenizer = open_clip.get_tokenizer(args.open_clip_model)

        def image_embed(imgs):
            with torch.no_grad():
                x = torch.stack([preprocess(i) for i in imgs])
                return model.encode_image(x).numpy()

        def text_embed(txts):
            with torch.no_grad():
                return model.encode_text(tokenizer(txts)).numpy()
    except ImportError as e:
        raise SystemExit(f"open_clip unavailable ({e}); CLIP score needs it") from e

    score = compute_clip_score(images, prompts, image_embed, text_embed)
    print(f"CLIP score: {score:.4f}")


if __name__ == "__main__":
    main()
