"""FID driver (reference: eval/eval_fid.py): `ref` builds stats npz from a
directory of images; `calc` scores generated images against stats."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def _load_images(path):
    from PIL import Image

    names = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    return np.stack([np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
                     for n in names])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a jax platform (the sitecustomize-pinned env "
                         "var is otherwise ignored; cpu = run off-tunnel)")
    ap.add_argument("mode", choices=["ref", "calc"])
    ap.add_argument("--images", required=True)
    ap.add_argument("--stats", required=True, help="ref-stats npz path")
    ap.add_argument("--detector", default=None,
                    help="pt_inception-2015-12-05*.pth (JAX) or EDM "
                         "torchscript; random-init smoke mode when omitted")
    args = ap.parse_args()
    from scail_tpu.utils.platform import force_platform

    force_platform(args.platform)

    from scail_tpu.evals.fid import (InceptionFeatureExtractor, fid_from_stats,
                                     save_ref_stats)

    feats = InceptionFeatureExtractor(args.detector)(_load_images(args.images))
    if args.mode == "ref":
        save_ref_stats(feats, args.stats)
        print(f"saved stats -> {args.stats}")
    else:
        print(f"FID: {fid_from_stats(feats, args.stats):.4f}")


if __name__ == "__main__":
    main()
