"""Host input-pipeline benchmark (VERDICT r4 item 3 / SURVEY hard part 6):
frames/s through decode -> resize -> normalize -> prefetch at the 512p
training geometry, the tario native tar path vs the pure-python tarfile
path, and the stall fraction against the measured train steps.

Matches /root/reference/data_video.py:109-170 (decode + rectangle-crop
resize + normalize) and sat/data_utils/webds.py (tar shards).  Pure host
work -- runs identically with or without the TPU; the numbers only mean
something on the box that also runs the train step, so run it there:

  python scripts/bench_input_pipeline.py [--items 6] [--frames 81]
"""

import argparse
import itertools
import json
import os
import shutil
import sys
import tarfile
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# measured train-step times this pipeline must hide behind (BENCH_r04
# extras, same geometry); update from the latest BENCH_r0N extras when
# the measured steps move
TRAIN_STEP_S = {"sta": 11.26, "dense": 18.7}


def _write_mp4(path: str, frames_u8: np.ndarray, fps: float = 16.0) -> None:
    import cv2

    h, w = frames_u8.shape[1:3]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert vw.isOpened(), "cv2 VideoWriter failed to open"
    for f in frames_u8:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


def _synth_frames(rng, T, H, W):
    """Compressible-but-nontrivial content: moving smooth gradients plus
    mild noise (pure noise makes the codec the bottleneck in a way no
    real video is)."""
    t = np.arange(T, dtype=np.float32)[:, None, None]
    y = np.linspace(0, 4 * np.pi, H, dtype=np.float32)[None, :, None]
    x = np.linspace(0, 4 * np.pi, W, dtype=np.float32)[None, None, :]
    base = 127.5 + 80 * np.sin(x + 0.3 * t) * np.cos(y - 0.2 * t)
    out = np.stack([base, np.roll(base, 7, axis=2), np.roll(base, 13, axis=1)],
                   axis=-1)
    out = out + rng.normal(0, 6, out.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def build_dataset(root: str, n_items: int, frames: int, src_hw=(576, 1024)):
    """n_items example dirs (driving.mp4 + rendered.mp4 + ref.jpg) at a
    realistic source resolution the loader must decode AND resize."""
    from PIL import Image

    rng = np.random.default_rng(0)
    H, W = src_hw
    for i in range(n_items):
        d = os.path.join(root, f"{i:03d}")
        os.makedirs(d, exist_ok=True)
        fr = _synth_frames(rng, frames, H, W)
        _write_mp4(os.path.join(d, "driving.mp4"), fr)
        _write_mp4(os.path.join(d, "rendered.mp4"), fr[:, ::2, ::2])
        Image.fromarray(fr[0]).save(os.path.join(d, "ref.jpg"))
    return root


def bench_video_pose(root: str, n_measure: int, image_size, frames: int):
    """decode -> resize_for_rectangle_crop -> normalize -> prefetch via the
    production VideoPoseDataset + DataLoader (data_video.py:30-170 path)."""
    from scail_tpu.data.datasets import (DataLoader, DistributedBatchSampler,
                                         VideoPoseDataset)

    ds = VideoPoseDataset(root, image_size=image_size, num_frames=frames)
    sampler = DistributedBatchSampler(len(ds), batch_size=1, shuffle=False)
    loader = DataLoader(ds, sampler, prefetch=2)
    it = iter(loader)
    _ = next(it)  # warm the prefetch thread + any lazy imports
    t0 = time.perf_counter()
    for _ in range(n_measure):
        batch = next(it)
    dt = (time.perf_counter() - t0) / n_measure
    assert batch["mp4"].shape[1] == frames
    return dt


def build_tar_shard(root: str, shard_path: str):
    with tarfile.open(shard_path, "w") as tf:
        for d in sorted(os.listdir(root)):
            if not os.path.isdir(os.path.join(root, d)):
                continue  # e.g. the shard itself when it lives in root
            for fname in ("driving.mp4", "rendered.mp4", "ref.jpg"):
                tf.add(os.path.join(root, d, fname), arcname=f"{d}.{fname}")


def bench_tar(shard_path: str, n_measure: int, image_size, frames: int,
              force_python: bool):
    """Tar-shard read + full decode/resize pipeline; force_python=True
    swaps the native tario index for the tarfile fallback."""
    from scail_tpu.data import datasets as dsmod
    from scail_tpu.data.video import (frames_to_tchw_normalized,
                                      load_video_frames, pad_last_frame,
                                      resize_for_rectangle_crop)
    from scail_tpu.native import tario

    def process(sample):
        out = {}
        for key, field in (("mp4", "driving.mp4"), ("pose", "rendered.mp4")):
            with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
                f.write(sample[field])
                f.flush()
                fr, _ = load_video_frames(f.name)
            fr = pad_last_frame(fr, frames)
            out[key] = np.asarray(resize_for_rectangle_crop(
                frames_to_tchw_normalized(fr), list(image_size), "center"))
        return out

    saved = tario._LIB
    if force_python:
        tario._LIB = False  # get_lib() -> None: tarfile/pread fallback
    try:
        ds = dsmod.TarShardDataset([shard_path], process_fn=process,
                                   shuffle_shards=False)
        it = iter(ds)
        _ = next(it)
        t0 = time.perf_counter()
        for s in itertools.islice(it, n_measure):
            pass
        dt = (time.perf_counter() - t0) / n_measure
    finally:
        tario._LIB = saved
    return dt


def bench_tar_io_only(shard_path: str, force_python: bool):
    """Raw shard IO rate (index + member reads, no decode): isolates what
    the native path actually buys."""
    from scail_tpu.native import tario

    saved = tario._LIB
    if force_python:
        tario._LIB = False
    try:
        t0 = time.perf_counter()
        idx = tario.TarShardIndex(shard_path)
        nbytes = 0
        for i in range(len(idx)):
            s = idx.read_sample(i)
            nbytes += sum(len(v) for k, v in s.items() if k != "__key__")
        dt = time.perf_counter() - t0
    finally:
        tario._LIB = saved
    return nbytes / dt / 1e6  # MB/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=6)
    ap.add_argument("--measure", type=int, default=4)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--image-size", type=int, nargs=2, default=[512, 896])
    ap.add_argument("--root", default=None,
                    help="reuse an existing dataset dir instead of synthesizing")
    args = ap.parse_args()
    print(json.dumps(run(args)))


def run(args):
    image_size = tuple(args.image_size)
    tmp = None
    root = args.root
    if root is None:
        tmp = tempfile.mkdtemp(prefix="scail_pipe_")
        root = os.path.join(tmp, "data")
        os.makedirs(root)
        print(f"synthesizing {args.items} items at source 576x1024 x "
              f"{args.frames}f ...", flush=True)
        build_dataset(root, args.items, args.frames)

    try:
        # every stage is measured twice and reported as the min: the first
        # pass through a mode pays one-time costs (lazy imports, codec
        # thread pools, page cache) that an A/B read would misattribute
        # to the mode itself -- measured: first-pass ~3x inflation on
        # whichever mode runs first, modes equal once warm
        def twice(f, *a, **kw):
            return min(f(*a, **kw), f(*a, **kw))

        item_s = twice(bench_video_pose, root, args.measure, image_size,
                       args.frames)
        shard = os.path.join(tmp or root, "shard-000000.tar")
        build_tar_shard(root, shard)
        tar_native_s = twice(bench_tar, shard, args.measure, image_size,
                             args.frames, force_python=False)
        tar_python_s = twice(bench_tar, shard, args.measure, image_size,
                             args.frames, force_python=True)
        io_native = max(bench_tar_io_only(shard, force_python=False)
                        for _ in range(2))
        io_python = max(bench_tar_io_only(shard, force_python=True)
                        for _ in range(2))
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)

    fps = args.frames / item_s
    out = {
        "metric": "input_pipeline_512p",
        "value": round(fps, 1),
        "unit": "frames/s (decode+resize+normalize+prefetch, video+pose "
                "pair counted once)",
        "item_s": round(item_s, 2),
        "tar_native_item_s": round(tar_native_s, 2),
        "tar_python_item_s": round(tar_python_s, 2),
        "tar_io_native_mbps": round(io_native, 1),
        "tar_io_python_mbps": round(io_python, 1),
    }
    # stall fraction: with prefetch>=1 the loader hides fully when
    # item_s <= step_s; otherwise the step stalls (item_s - step_s) per step
    for name, step_s in TRAIN_STEP_S.items():
        out[f"loader_over_step_{name}"] = round(item_s / step_s, 3)
        out[f"stall_s_per_step_{name}"] = round(max(0.0, item_s - step_s), 2)
    return out


if __name__ == "__main__":
    main()
