"""LAION aesthetic score (reference: eval/eval_aes.py): CLIP ViT-L/14
image embeddings -> normalized -> 5-layer MLP -> scalar rating.  Pass
--clip-weights (openai ViT-L/14, open_clip or HF layout) and --mlp
(sac+logos+ava1-l14-linearMSE.pth); without them runs in random-init /
identity smoke mode."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a jax platform (the sitecustomize-pinned env "
                         "var is otherwise ignored; cpu = run off-tunnel)")
    ap.add_argument("--images", required=True)
    ap.add_argument("--clip-weights", default=None)
    ap.add_argument("--mlp", default=None,
                    help="LAION aesthetic MLP weights (.pth)")
    args = ap.parse_args()
    from scail_tpu.utils.platform import force_platform

    force_platform(args.platform)

    from PIL import Image

    from scail_tpu.evals.aesthetic import aesthetic_score_from_clip_embeddings
    from scail_tpu.evals.clip_score import JaxClipScorer
    from scail_tpu.models.clip_score import ClipScoreConfig

    names = sorted(f for f in os.listdir(args.images)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    images = [Image.open(os.path.join(args.images, n)).convert("RGB") for n in names]

    # weights: detect/auto (vit_l14 geometry); smoke: tiny towers but the
    # real 768-d embedding width the aesthetic MLP expects
    cfg = ClipScoreConfig.vit_l14() if args.clip_weights else ClipScoreConfig(
        vision_width=64, vision_layers=2, vision_heads=4, vision_mlp=96,
        text_width=64, text_layers=2, text_heads=4, text_mlp=96,
        embed_dim=768, hidden_act="quick_gelu")
    scorer = JaxClipScorer(args.clip_weights, cfg=cfg)
    emb = scorer.image_embed(images)

    if args.mlp:
        from scail_tpu.convert.torch_ckpt import load_torch_state_dict

        mlp = load_torch_state_dict(args.mlp)
        scores = aesthetic_score_from_clip_embeddings(emb, mlp)
    else:
        rng = np.random.default_rng(0)
        mlp = {}
        sizes = [(768, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
        for i, (din, dout) in zip([0, 2, 4, 6, 7], sizes):
            mlp[f"layers.{i}.weight"] = rng.standard_normal(
                (dout, din)).astype(np.float32) * 0.02
            mlp[f"layers.{i}.bias"] = np.zeros((dout,), np.float32)
        scores = aesthetic_score_from_clip_embeddings(emb, mlp)
        print("(random-init smoke mode: scores are not meaningful)")

    print(f"Average aesthetic score: {float(np.mean(scores)):.4f} "
          f"over {len(images)} images")


if __name__ == "__main__":
    main()
