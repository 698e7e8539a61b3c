"""Host-side video/image IO and preprocessing
(reference: data_video.py, sample_video.py:35-70, :309-400).

decord is not available here; decoding goes through imageio/ffmpeg (or cv2
as fallback).  Resize parity with torchvision bicubic (antialias=True) comes
from scail_tpu.ops.resize.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

# jax is imported lazily inside the jax-array branches: this module is
# the HOST side of the pipeline, and importing it from loader tooling
# (bench_input_pipeline, multi-process workers) must not spin up a
# device client that is never used.


def find_file_with_patterns(directory: str, patterns: List[str]) -> Optional[str]:
    """(sample_video.py:64-70)"""
    for pattern in patterns:
        p = os.path.join(directory, pattern)
        if os.path.exists(p):
            return p
    return None


def load_video_frames(path: str) -> Tuple[np.ndarray, float]:
    """Decode all frames -> (T, H, W, 3) uint8 plus fps
    (load_video_for_pose_sample, sample_video.py:48-54).

    Tries, in order: imageio/pyav, imageio/ffmpeg, OpenCV, GIF via Pillow,
    .npy/.npz archives, and directories of numbered image frames -- the
    codec-less fallbacks matter on machines without ffmpeg.
    """
    if os.path.isdir(path):
        frames = _load_frame_dir(path)
        return frames, 16.0
    if path.endswith((".npy", ".npz")):
        data = np.load(path)
        if isinstance(data, np.lib.npyio.NpzFile):
            fps = float(data["fps"]) if "fps" in data else 16.0
            return np.asarray(data["frames"]), fps
        return np.asarray(data), 16.0

    for plugin in ("pyav", "ffmpeg", None):
        try:
            import imageio.v3 as iio

            kw = {"plugin": plugin} if plugin else {}
            frames = np.asarray(iio.imread(path, **kw))
            try:
                meta = iio.immeta(path, **kw)
                fps = float(meta.get("fps", 0.0) or 0.0)
                if not fps and meta.get("duration"):
                    fps = 1000.0 / float(meta["duration"])  # GIF per-frame ms
            except Exception:
                fps = 16.0
            if frames.ndim == 3:
                frames = frames[None]
            if frames.shape[-1] == 4:
                frames = frames[..., :3]
            return frames, fps or 16.0
        except Exception:
            continue

    import cv2

    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 16.0
    out = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        out.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not out:
        raise RuntimeError(
            f"could not decode {path}: no working video backend (install "
            "imageio[pyav] or ffmpeg), or provide a .gif/.npz/frame-directory")
    return np.stack(out), float(fps)


def _load_frame_dir(path: str) -> np.ndarray:
    from PIL import Image

    names = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    assert names, f"no frames in {path}"
    frames = [np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
              for n in names]
    return np.stack(frames)


def load_image_chw_normalized(path: str) -> np.ndarray:
    """(sample_video.py:35-45): (1, 3, H, W) float32 in [-1, 1]."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    img = img.transpose(2, 0, 1)[None]
    return img * 2.0 - 1.0


def frames_to_tchw_normalized(frames: np.ndarray) -> np.ndarray:
    """uint8 (T,H,W,3) -> float32 (T,3,H,W) in [-1,1]
    ((x - 127.5)/127.5, sample_video.py:316, :341).

    The multi-threaded native kernel (csrc/frameproc.cpp) fuses the
    transpose+normalize without materializing the strided intermediate --
    this is the dominant pure-host cost per item at 512p, and on a TPU
    host the loader competes with JAX dispatch for cores."""
    if frames.dtype == np.uint8 and frames.ndim == 4:
        from scail_tpu.native import normalize_frames

        return normalize_frames(frames)
    x = frames.astype(np.float32).transpose(0, 3, 1, 2)
    return (x - 127.5) / 127.5


def resize_for_rectangle_crop(arr, image_size, reshape_mode: str = "center",
                              rng: Optional[np.random.Generator] = None):
    """Aspect-preserving torch-bicubic resize + crop (data_video.py:141-170).

    arr: (T, C, H, W) float.  image_size: [H_out, W_out].

    numpy input stays entirely on the HOST (native banded kernel +
    fused crop, csrc/frameproc.cpp): the data loader must not dispatch
    to the accelerator -- on a TPU host that ships raw decoded frames
    over PCIe and serializes with the train step.  jax input keeps the
    on-device einsum path (ops/resize.py); both share one weight-matrix
    source (native/resize_kernels.py) so they agree to f32 rounding.
    """
    host = isinstance(arr, np.ndarray)
    if not host:
        import jax.numpy as jnp

        arr = jnp.asarray(arr)
    t, c, h, w = arr.shape
    th, tw = image_size
    if w / h > tw / th:
        nh, nw = th, int(w * th / h)
    else:
        nh, nw = int(h * tw / w), tw
    dh, dw = nh - th, nw - tw
    if reshape_mode == "center":
        top, left = dh // 2, dw // 2
    elif reshape_mode in ("random", "none"):
        rng = rng or np.random.default_rng()
        top = int(rng.integers(0, dh + 1))
        left = int(rng.integers(0, dw + 1))
    else:
        raise NotImplementedError(reshape_mode)
    if host:
        from scail_tpu.native import center_crop, resize_bicubic_host

        out = resize_bicubic_host(arr, nh, nw, antialias=True)
        return center_crop(out, top, left, th, tw)
    from scail_tpu.ops.resize import resize_bicubic

    arr = resize_bicubic(arr, nh, nw, antialias=True)
    return arr[:, :, top : top + th, left : left + tw]


def smpl_downsample(video_tchw):
    """0.5x bilinear downsample of the pose render
    (sample_video.py:350-351)."""
    t, c, h, w = video_tchw.shape
    if isinstance(video_tchw, np.ndarray):
        from scail_tpu.native import resize_bilinear_host

        return resize_bilinear_host(video_tchw, h // 2, w // 2)
    import jax.numpy as jnp

    from scail_tpu.ops.resize import resize_bilinear

    return resize_bilinear(jnp.asarray(video_tchw), h // 2, w // 2)


def pad_last_frame(tensor: np.ndarray, num_frames: int) -> np.ndarray:
    """Repeat the last frame up to num_frames (data_video.py:173-186)."""
    if tensor.shape[0] >= num_frames:
        return tensor[:num_frames]
    pad = np.repeat(tensor[-1:], num_frames - tensor.shape[0], axis=0)
    return np.concatenate([tensor, pad], axis=0)


def save_mp4(frames01: np.ndarray, path: str, fps: float) -> str:
    """frames01: (T, H, W, 3) float in [0,1]
    (save_video_as_grid_and_mp4, sample_video.py:201-217).

    Falls back to GIF when no mp4 encoder exists; returns the path written.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = (np.clip(frames01, 0, 1) * 255.0).astype(np.uint8)
    return _write_video(data, path, fps)


def _write_video(data_u8: np.ndarray, path: str, fps: float) -> str:
    import imageio

    try:
        with imageio.get_writer(path, fps=fps) as w:
            for f in data_u8:
                w.append_data(f)
        return path
    except Exception:
        from PIL import Image

        gif_path = os.path.splitext(path)[0] + ".gif"
        ims = [Image.fromarray(f) for f in data_u8]
        ims[0].save(gif_path, save_all=True, append_images=ims[1:],
                    duration=max(1, int(1000 / fps)), loop=0)
        return gif_path


def save_multi_video_grid_and_mp4(video_batches, save_dir: str, fps: float, key: str):
    """Stack several (B,T,C,H,W) streams side by side per frame
    (sample_video.py:181-198)."""
    os.makedirs(save_dir, exist_ok=True)
    stacked = np.stack([np.asarray(v) for v in video_batches], axis=2)  # b t n c h w
    written = []
    for i, vid in enumerate(stacked):
        frames = []
        for fr in vid:  # (n, c, h, w)
            fr = fr.transpose(2, 0, 3, 1)  # h n w c
            fr = fr.reshape(fr.shape[0], -1, fr.shape[3])
            frames.append(np.clip(fr * 255.0, 0, 255).astype(np.uint8))
        out = os.path.join(save_dir, f"{key}_{i:06d}.mp4")
        written.append(_write_video(np.stack(frames), out, fps))
    return written
