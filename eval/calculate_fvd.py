"""FVD between two directories of videos (reference: eval/calculate_fvd.py).

Usage: python eval/calculate_fvd.py --real <dir> --fake <dir> \
           [--i3d /path/to/i3d_pretrained_400.pt] [--num 64]

Without --i3d the JAX I3D runs with random init (smoke mode: exercises the
full pipeline; scores are only relatively meaningful).
"""

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
    ap.add_argument("--real", required=True)
    ap.add_argument("--fake", required=True)
    ap.add_argument("--i3d", default=None,
                    help="i3d_pretrained_400.pt (JAX) or *torchscript.pt (torch)")
    ap.add_argument("--num", type=int, default=None)
    args = ap.parse_args()
    from scail_tpu.utils.platform import force_platform

    force_platform(args.platform)

    from scail_tpu.evals.fvd import I3DFeatureExtractor, load_video_dir
    from scail_tpu.evals.frechet import frechet_from_features

    extractor = I3DFeatureExtractor(args.i3d)
    real = np.stack(load_video_dir(args.real, args.num))
    fake = np.stack(load_video_dir(args.fake, args.num))
    fvd = frechet_from_features(extractor(real), extractor(fake))
    print(f"FVD: {fvd:.3f}")


if __name__ == "__main__":
    main()
