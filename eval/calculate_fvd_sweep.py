"""dp-sharded FVD sweep over two video directories
(reference: eval/calculate_fvd_multiprocess.py — one worker per GPU,
list split across workers; here: file list splits across hosts, batches
shard across local chips on a ('data',) mesh, features all-gather).

Usage: python eval/calculate_fvd_sweep.py \
           --real_video_dir <dir> --generated_video_dir <dir> \
           [--num_frames 16] [--sample_rate 1] [--resolution 224] \
           [--crop_size 224] [--batch 8] [--i3d weights.pt] [--max_videos N]

Without --i3d the JAX I3D runs with random init (smoke mode).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a jax platform (the sitecustomize-pinned env "
                         "var is otherwise ignored; cpu = run off-tunnel)")
    ap.add_argument("--real_video_dir", required=True)
    ap.add_argument("--generated_video_dir", required=True)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--sample_rate", type=int, default=1)
    ap.add_argument("--resolution", type=int, default=224)
    ap.add_argument("--crop_size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--i3d", default=None,
                    help="i3d_pretrained_400.pt (JAX) or *torchscript.pt (torch)")
    ap.add_argument("--max_videos", type=int, default=None)
    args = ap.parse_args()
    from scail_tpu.utils.platform import force_platform

    force_platform(args.platform)

    from scail_tpu.evals.sweep import fvd_sweep

    fvd = fvd_sweep(
        args.real_video_dir, args.generated_video_dir, i3d_path=args.i3d,
        num_frames=args.num_frames, sample_rate=args.sample_rate,
        resolution=args.resolution, crop_size=args.crop_size,
        batch=args.batch, max_videos=args.max_videos)
    print(f"FVD: {fvd:.3f}")


if __name__ == "__main__":
    main()
