"""dp-sharded batched eval sweeps over video directories.

TPU-native counterpart of the reference's multiprocess FVD driver
(eval/calculate_fvd_multiprocess.py:1-268): where the reference forks one
worker per GPU and splits the video list across them, here the file list
shards across HOSTS (jax.process_index) and each batch shards across the
local chips over a ('data',) mesh — the I3D conv network is pure XLA, so
the SPMD partitioner splits it with zero code; features are gathered with
multihost_utils and the Frechet distance closes on host 0.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def sample_frames(frames: np.ndarray, num_frames: int,
                  sample_rate: int = 1) -> np.ndarray:
    """Uniform frame subsampling, the reference's _load_video policy
    (calculate_fvd_multiprocess.py:51-74): take num_frames spread over
    the first num_frames*sample_rate frames; shorter clips scale down
    proportionally."""
    total = frames.shape[0]
    want_len = num_frames * sample_rate
    if total >= want_len:
        e, n = want_len, num_frames
    else:
        e = total
        n = max(1, int(total / want_len * num_frames))
    idx = np.linspace(0, e - 1, n, dtype=int)
    return frames[idx]


def center_crop(frames: np.ndarray, crop: int) -> np.ndarray:
    """(T, H, W, C) center crop (CenterCropVideo equivalent)."""
    h, w = frames.shape[1:3]
    top = max(0, (h - crop) // 2)
    left = max(0, (w - crop) // 2)
    return frames[:, top:top + crop, left:left + crop]


def short_side_scale(frames01: np.ndarray, size: int) -> np.ndarray:
    """(T, H, W, 3) in [0,1]: bilinear-resize so min(H, W) == size
    (pytorchvideo ShortSideScale equivalent)."""
    import jax.numpy as jnp

    from scail_tpu.ops.resize import resize_bilinear

    t, h, w = frames01.shape[:3]
    if h <= w:
        nh, nw = size, max(1, int(round(w * size / h)))
    else:
        nh, nw = max(1, int(round(h * size / w))), size
    v = frames01.transpose(0, 3, 1, 2)  # t c h w
    v = np.asarray(resize_bilinear(jnp.asarray(v, jnp.float32), nh, nw))
    return v.transpose(0, 2, 3, 1)


def paired_video_files(real_dir: str, fake_dir: str) -> Tuple[List[str], List[str]]:
    """Sorted basename pairing, the reference's _combine_without_prefix
    (calculate_fvd_multiprocess.py:76-86)."""

    def walk(d):
        return sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if not f.startswith(".") and os.path.isfile(os.path.join(d, f))
            and f.endswith((".mp4", ".gif", ".npz", ".npy")))

    real, fake = walk(real_dir), walk(fake_dir)
    assert len(real) == len(fake), (
        f"video count mismatch: {len(real)} real vs {len(fake)} generated")
    return real, fake


def _load_clip(path: str, num_frames: int, sample_rate: int,
               resolution: int, crop_size: Optional[int]) -> np.ndarray:
    from scail_tpu.data.video import load_video_frames

    frames, _ = load_video_frames(path)
    frames01 = frames.astype(np.float32) / 255.0
    frames01 = sample_frames(frames01, num_frames, sample_rate)
    if frames01.shape[0] < num_frames:
        # short clips take the proportional subsample (reference policy,
        # kept above) then pad by repeating the last frame so every clip
        # stacks to one (num_frames, H, W, 3) batch for the dp shard
        pad = np.repeat(frames01[-1:], num_frames - frames01.shape[0], axis=0)
        frames01 = np.concatenate([frames01, pad])
    frames01 = short_side_scale(frames01, resolution)
    if crop_size:
        frames01 = center_crop(frames01, crop_size)
    return frames01


def dp_sharded_features(extractor, clips01: Sequence[np.ndarray], *,
                        batch: int = 8, devices=None) -> np.ndarray:
    """Run an I3DFeatureExtractor-like callable with each batch sharded
    over the local devices' 'data' axis.  Clips must share a shape.

    The last partial batch is padded by repetition and the pad rows
    dropped — every device keeps a full shard so one jitted executable
    serves the whole sweep."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = list(devices if devices is not None else jax.local_devices())
    n_dev = len(devices)
    batch = max(batch, n_dev) // n_dev * n_dev
    mesh = Mesh(np.asarray(devices), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    from scail_tpu.evals.fvd import preprocess_for_i3d

    feats = []
    arr = np.stack(clips01)
    for i in range(0, arr.shape[0], batch):
        chunk = arr[i:i + batch]
        n_real = chunk.shape[0]
        if n_real % n_dev:
            pad = (-n_real) % n_dev
            # wrap-around repeat: pad can exceed n_real (1 clip on 8
            # devices needs 7 pad rows)
            idx = np.arange(n_real + pad) % n_real
            chunk = chunk[idx]
        if extractor._ts_model is not None:
            # torchscript flavour runs on host (no dp sharding) and does
            # its own preprocessing
            f = extractor(chunk)
        else:
            import jax.numpy as jnp

            x = preprocess_for_i3d(chunk, size=extractor.size)
            xs = jax.device_put(jnp.asarray(x), sharding)
            f = np.asarray(extractor._fn(extractor.params, xs))
        feats.append(f[:n_real])
    return np.concatenate(feats)


def fvd_sweep(real_dir: str, fake_dir: str, *, i3d_path: Optional[str] = None,
              num_frames: int = 16, sample_rate: int = 1,
              resolution: int = 224, crop_size: Optional[int] = 224,
              batch: int = 8, devices=None, max_videos: Optional[int] = None,
              i3d_size: int = 224) -> Optional[float]:
    """dp-sharded FVD between two directories of videos.

    Multi-host: the pair list splits across jax.process_index(); features
    all-gather before the Frechet solve.  Returns the FVD on every host
    (None never — the gather replicates features).
    """
    import jax

    real_files, fake_files = paired_video_files(real_dir, fake_dir)
    if max_videos:
        real_files, fake_files = real_files[:max_videos], fake_files[:max_videos]
    pidx, pcount = jax.process_index(), jax.process_count()
    mine = list(range(pidx, len(real_files), pcount))

    def clips(paths):
        return [_load_clip(p, num_frames, sample_rate, resolution, crop_size)
                for p in paths]

    from scail_tpu.evals.fvd import I3DFeatureExtractor
    from scail_tpu.evals.frechet import frechet_from_features

    extractor = I3DFeatureExtractor(i3d_path, batch=batch, size=i3d_size)

    def feats(paths):
        if not paths:
            return None  # hosts past the file count contribute nothing
        return dp_sharded_features(extractor, clips(paths),
                                   batch=batch, devices=devices)

    f_real = feats([real_files[i] for i in mine])
    f_fake = feats([fake_files[i] for i in mine])
    if pcount > 1:
        from jax.experimental import multihost_utils

        # process_allgather requires IDENTICAL per-host shapes; the
        # round-robin split leaves hosts with ceil vs floor(n/p) clips,
        # so pad every host to the max count and drop pads after (each
        # host knows every count from (n, pcount) alone — no extra comm)
        n = len(real_files)
        counts = [len(range(p, n, pcount)) for p in range(pcount)]
        cmax = max(counts)

        def pad_gather(f):
            dim = f.shape[1] if f is not None else 400
            buf = np.zeros((cmax, dim), f.dtype if f is not None
                           else np.float32)
            if f is not None:
                buf[: f.shape[0]] = f
            g = multihost_utils.process_allgather(buf)  # (pcount, cmax, D)
            return np.concatenate([g[p, : counts[p]] for p in range(pcount)])

        f_real = pad_gather(f_real)
        f_fake = pad_gather(f_fake)
    return frechet_from_features(f_real, f_fake)
