"""Generate a synthetic example fixture (ref image + rendered pose video)
so the pipeline can be smoke-tested without SCAIL-Pose or video codecs.

Usage: python scripts/make_synthetic_example.py examples_synth/001 \
           [--frames 9] [--size 256 448]
Writes ref.png + rendered.gif (+ GT.gif) into the target dir.
"""

import argparse
import os

import numpy as np


def _stick_figure_frames(n, h, w, seed=0):
    """Crude moving stick figure on black -- a stand-in for an SMPL render."""
    rng = np.random.default_rng(seed)
    frames = np.zeros((n, h, w, 3), np.uint8)
    cx, cy = w // 2, h // 2
    for t in range(n):
        phase = 2 * np.pi * t / max(n, 1)
        img = frames[t]
        # torso
        img[cy - h // 8 : cy + h // 8, cx - 2 : cx + 2] = (200, 180, 160)
        # arms swing
        for s in (-1, 1):
            dx = int(np.cos(phase + (0 if s > 0 else np.pi)) * w // 8)
            dy = int(abs(np.sin(phase)) * h // 10)
            y0, y1 = cy - h // 10, cy - h // 10 + dy + 2
            x = np.clip(cx + s * abs(dx), 2, w - 3)
            img[min(y0, y1) : max(y0, y1) + 2, x - 1 : x + 1] = (160, 200, 240)
        # head
        yy, xx = np.ogrid[:h, :w]
        head = (yy - (cy - h // 6)) ** 2 + (xx - cx) ** 2 < (h // 20) ** 2
        img[head] = (240, 220, 200)
        frames[t] = img
    noise = rng.integers(0, 20, frames.shape, np.uint8)
    return np.clip(frames.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--size", type=int, nargs=2, default=[256, 448])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    h, w = args.size
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    ref = rng.integers(40, 216, (h, w, 3), np.uint8)
    Image.fromarray(ref).save(os.path.join(args.out_dir, "ref.png"))

    frames = _stick_figure_frames(args.frames, h, w, args.seed)
    ims = [Image.fromarray(f) for f in frames]
    ims[0].save(os.path.join(args.out_dir, "rendered.gif"), save_all=True,
                append_images=ims[1:], duration=63, loop=0)
    ims[0].save(os.path.join(args.out_dir, "GT.gif"), save_all=True,
                append_images=ims[1:], duration=63, loop=0)
    print(f"wrote synthetic fixture -> {args.out_dir}")


if __name__ == "__main__":
    main()
