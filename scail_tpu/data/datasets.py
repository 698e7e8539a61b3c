"""Dataset plumbing (reference: sat/data_utils/configure_data.py,
datasets.py, samplers.py, data_video.py).

Map-style datasets + weighted/alternating mixtures + a distributed batch
sampler with deterministic `start_iter` resume, feeding numpy batches to
the jitted train step through a background prefetch thread (the reference
guards hung video decode with timeout threads, data_video.py:109-138; the
prefetcher plays that role here).
"""

from __future__ import annotations

import io
import itertools
import json
import os
import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class Dataset:
    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int):
        raise NotImplementedError


class TensorDictDataset(Dataset):
    """In-memory dict-of-arrays dataset (first axis indexes examples)."""

    def __init__(self, data: Dict[str, np.ndarray]):
        self.data = data
        self.n = len(next(iter(data.values())))

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return {k: v[idx] for k, v in self.data.items()}


class JsonlDataset(Dataset):
    """(reference: sat/data_utils/jsonlds.py)"""

    def __init__(self, path: str, process_fn: Callable = None):
        import json

        with open(path) as f:
            self.rows = [json.loads(l) for l in f if l.strip()]
        self.process_fn = process_fn or (lambda r: r)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        return self.process_fn(self.rows[idx])


class VideoPoseDataset(Dataset):
    """Paired video+pose example dirs, the training-side analogue of
    data_video.load_video_with_pose (data_video.py:30-108): each item dir
    holds a driving video, a rendered pose video and a reference image."""

    def __init__(self, root: str, image_size=(256, 448), num_frames: int = 9):
        import os

        self.root = root
        self.dirs = sorted(
            os.path.join(root, d) for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        self.image_size = image_size
        self.num_frames = num_frames

    def __len__(self):
        return len(self.dirs)

    def __getitem__(self, idx):
        from scail_tpu.data.video import (
            find_file_with_patterns, frames_to_tchw_normalized,
            load_image_chw_normalized, load_video_frames, pad_last_frame,
            resize_for_rectangle_crop,
        )

        d = self.dirs[idx]
        vid_path = find_file_with_patterns(
            d, ["driving.mp4", "driving.gif", "GT.mp4", "GT.gif", "driving.npz"])
        pose_path = find_file_with_patterns(
            d, ["rendered.mp4", "rendered.gif", "rendered.npz", "rendered"])
        ref_path = find_file_with_patterns(d, ["ref.jpg", "ref.png"])
        frames, fps = load_video_frames(vid_path)
        pose, _ = load_video_frames(pose_path)
        frames = pad_last_frame(frames, self.num_frames)
        pose = pad_last_frame(pose, self.num_frames)
        mp4 = np.asarray(resize_for_rectangle_crop(
            frames_to_tchw_normalized(frames), list(self.image_size), "center"))
        pose = np.asarray(resize_for_rectangle_crop(
            frames_to_tchw_normalized(pose), list(self.image_size), "center"))
        ref = np.asarray(resize_for_rectangle_crop(
            load_image_chw_normalized(ref_path), list(self.image_size), "center"))
        return {"mp4": mp4, "pose": pose, "ref_frame": ref,
                "first_frame": mp4[:1], "txt": ""}


class WeightedConcatDataset(Dataset):
    """Sample datasets proportionally to weights
    (sat/data_utils/configure_data.py:303-380)."""

    def __init__(self, datasets: Sequence[Dataset], weights: Sequence[float],
                 seed: int = 0):
        self.datasets = list(datasets)
        w = np.asarray(weights, np.float64)
        self.probs = w / w.sum()
        self.rng = np.random.default_rng(seed)
        # virtual length: weighted harmonic like the reference's scale-up
        self.n = int(sum(len(d) for d in self.datasets))

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        di = int(self.rng.choice(len(self.datasets), p=self.probs))
        d = self.datasets[di]
        return d[int(self.rng.integers(0, len(d)))]


class AlterDataset(Dataset):
    """Round-robin alternation (configure_data.py:383-446)."""

    def __init__(self, datasets: Sequence[Dataset]):
        self.datasets = list(datasets)
        self.n = sum(len(d) for d in self.datasets)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        di = idx % len(self.datasets)
        d = self.datasets[di]
        return d[(idx // len(self.datasets)) % len(d)]


class DistributedBatchSampler:
    """Deterministic shuffled epochs sharded over dp replicas with
    `start_iter` resume (sat/data_utils/samplers.py)."""

    def __init__(self, n: int, batch_size: int, rank: int = 0, world_size: int = 1,
                 shuffle: bool = True, seed: int = 0, start_iter: int = 0,
                 drop_last: bool = True):
        self.n, self.batch_size = n, batch_size
        self.rank, self.world_size = rank, world_size
        self.shuffle, self.seed = shuffle, seed
        self.start_iter = start_iter
        self.drop_last = drop_last

    def epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(self.n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + epoch).permutation(idx)
        per = self.n // self.world_size if self.drop_last else -(-self.n // self.world_size)
        return idx[self.rank * per : (self.rank + 1) * per]

    def __iter__(self) -> Iterator[List[int]]:
        it = 0
        for epoch in itertools.count():
            idx = self.epoch_indices(epoch)
            for i in range(0, len(idx) - self.batch_size + 1, self.batch_size):
                if it >= self.start_iter:
                    yield idx[i : i + self.batch_size].tolist()
                it += 1


def default_collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(vals[0], (int, float)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals
    return out


class DataLoader:
    """Background-thread prefetching loader with a per-batch timeout guard
    against hung decodes (the reference wraps video decode in timeout
    threads, data_video.py:109-138)."""

    def __init__(self, dataset: Dataset, sampler: DistributedBatchSampler,
                 collate_fn: Callable = default_collate, prefetch: int = 2,
                 timeout: Optional[float] = None):
        self.dataset, self.sampler = dataset, sampler
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.timeout = timeout

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            for batch_idx in self.sampler:
                if stop.is_set():
                    return
                try:
                    batch = self.collate_fn([self.dataset[i] for i in batch_idx])
                except Exception as e:  # skip corrupt samples, keep training
                    from scail_tpu.utils.logging import print_rank0

                    print_rank0(f"dataloader: skipping batch {batch_idx}: {e}",
                                "warning")
                    continue
                # stop-aware bounded put: an abandoned iterator (early
                # stop) must not strand the thread on a full queue
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                yield q.get(timeout=self.timeout)
        finally:
            stop.set()


class TarShardDataset:
    """Streaming webdataset-style tar shards
    (reference: sat/data_utils/webds.py SimpleDistributedWebDataset).

    Shards are .tar files whose members group by basename prefix
    (`000001.jpg`, `000001.txt`, ...).  Iteration yields dicts keyed by
    extension; shards are interleaved across (rank, world_size) and workers
    resume deterministically by shard index.
    """

    def __init__(self, shard_paths: Sequence[str], process_fn: Callable = None,
                 rank: int = 0, world_size: int = 1, seed: int = 0,
                 shuffle_shards: bool = True):
        self.shards = sorted(shard_paths)
        if shuffle_shards:
            self.shards = list(np.random.default_rng(seed).permutation(self.shards))
        self.shards = self.shards[rank::world_size]
        self.process_fn = process_fn or (lambda s: s)

    def _begin_shard(self, shard: str) -> None:
        """Per-shard hook before iteration (MetaTarShardDataset loads its
        sidecar metadata here)."""

    def __iter__(self):
        for shard in itertools.cycle(self.shards):
            self._begin_shard(shard)
            if os.path.isfile(shard):
                yield from self._iter_local(shard)
            else:
                yield from self._iter_stream(shard)

    def _iter_local(self, shard):
        """Local shard: one-pass native index (csrc/tario.cpp) + pread
        member reads on a prefetch thread -- the foreign calls release
        the GIL, so reading the next sample overlaps process_fn and the
        device step (tarfile fallback applies transparently)."""
        from scail_tpu.native.tario import TarShardIndex

        if not hasattr(self, "_index_cache"):
            self._index_cache = {}
        idx = self._index_cache.get(shard)
        if idx is None:
            idx = self._index_cache[shard] = TarShardIndex(shard)
        q: "queue.Queue" = queue.Queue(maxsize=4)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded put with a stop check: if the consumer abandons the
            # generator mid-shard (early stop, islice), the thread exits
            # instead of blocking on a full queue forever and pinning the
            # shard (ADVICE r2).  Applies to EVERY put — the end sentinel
            # and exception paths block just the same when the queue is
            # full at shard end.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def reader():
            try:
                for i in range(len(idx)):
                    if not put_or_stop(idx.read_sample(i)):
                        return
                put_or_stop(None)
            except BaseException as e:  # surface in the consumer
                put_or_stop(e)

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        try:
            while True:
                s = q.get()
                if s is None:
                    break
                if isinstance(s, BaseException):
                    raise s
                yield self.process_fn(s)
        finally:
            # runs on generator close/GC too (GeneratorExit)
            stop.set()

    def _iter_stream(self, shard):
        import tarfile

        from scail_tpu.data.gopen import gopen

        # scheme-dispatched stream (file/pipe/rclone/s3/http), the
        # reference's gopen surface (webds.py:290-368)
        with gopen(shard) as stream, tarfile.open(
                fileobj=stream, mode="r|*") as tf:
            sample: Dict[str, Any] = {}
            key = None
            for member in tf:
                if not member.isfile():
                    continue
                base, _, ext = member.name.partition(".")
                if key is not None and base != key and sample:
                    yield self.process_fn(dict(sample, __key__=key))
                    sample = {}
                key = base
                sample[ext] = tf.extractfile(member).read()
            if sample:
                yield self.process_fn(dict(sample, __key__=key))


def braceexpand(pattern: str) -> List[str]:
    """Minimal brace expansion for shard patterns: numeric ranges
    `{000..123}` (zero-padding preserved) and comma lists `{a,b}`,
    recursively.  Covers the webdataset shard-url idiom the reference
    gets from the braceexpand package (sat/data_utils/webds.py:260)."""
    import re

    m = re.search(r"\{([^{}]*)\}", pattern)
    if not m:
        return [pattern]
    head, tail = pattern[:m.start()], pattern[m.end():]
    body = m.group(1)
    rng = re.fullmatch(r"(\d+)\.\.(\d+)", body)
    if rng:
        a, b = rng.group(1), rng.group(2)
        width = len(a) if a.startswith("0") or len(a) == len(b) else 0
        parts = [str(i).zfill(width) for i in range(int(a), int(b) + 1)]
    else:
        parts = body.split(",")
    out: List[str] = []
    for p in parts:
        out.extend(braceexpand(head + p + tail))
    return out


def expand_shard_paths(path: str = "", include_dirs: Optional[str] = None) -> List[str]:
    """Expand a brace pattern plus `dirA,dirB*3`-style include dirs into a
    concrete shard list (MetaDistributedWebDataset.__init__,
    webds.py:243-268: walk each dir for non-empty .tar files, an optional
    `*n` suffix repeats a dir's shards n times for weighting).

    The reference computes this on rank 0 and broadcasts (the os.walk
    order is filesystem-dependent); here the walk is sorted, so every
    host computes the identical list deterministically — no broadcast
    needed on the jax.distributed side.
    """
    paths: List[str] = list(braceexpand(path)) if path else []
    if include_dirs:
        for spec in include_dirs.split(","):
            n = 1
            if "*" in spec:
                spec, rep = spec.rsplit("*", 1)
                n = int(rep)
            found: List[str] = []
            for cur, _dirs, files in sorted(os.walk(spec)):
                for f in sorted(files):
                    full = os.path.join(cur, f)
                    if f.endswith(".tar") and os.path.getsize(full) > 0:
                        found.append(full)
            paths.extend(found * n)
    return paths


class MetaTarShardDataset(TarShardDataset):
    """Tar shards with sidecar metadata (MetaDistributedWebDataset,
    sat/data_utils/webds.py:233-289): next to each `X.tar` an optional
    `X.meta.jsonl` holds one JSON object per line with a 'key' field
    matching the sample key; the requested `meta_names` fields are
    injected into each matching sample before process_fn runs.
    Malformed jsonl lines are skipped exactly like the reference
    (webds.py:110-117)."""

    def __init__(self, shard_paths: Sequence[str],
                 process_fn: Callable = None, *,
                 meta_names: Sequence[str] = (), **kw):
        self.meta_names = list(meta_names)
        self._meta: Dict[str, Dict[str, Any]] = {}
        inner = process_fn or (lambda s: s)

        def inject(sample):
            md = self._meta.get(sample.get("__key__"), None)
            if md:
                for name in self.meta_names:
                    if name in md:
                        sample[name] = md[name]
            return inner(sample)

        super().__init__(shard_paths, inject, **kw)

    @staticmethod
    def meta_path_for(shard: str) -> str:
        d, fname = os.path.split(shard)
        # strip only the final extension: 'clips.v2-000.tar' must map to
        # 'clips.v2-000.meta.jsonl', not 'clips.meta.jsonl'
        return os.path.join(d, os.path.splitext(fname)[0] + ".meta.jsonl")

    def _load_meta(self, shard: str) -> Dict[str, Dict[str, Any]]:
        if not self.meta_names:
            return {}
        meta_path = self.meta_path_for(shard)
        out: Dict[str, Dict[str, Any]] = {}
        try:
            if os.path.isfile(meta_path):
                stream = open(meta_path, "r")
            else:
                from scail_tpu.data.gopen import gopen

                stream = io.TextIOWrapper(gopen(meta_path))
        except (OSError, ValueError):
            return {}
        with stream:
            for line in stream:
                try:
                    item = json.loads(line)
                except ValueError:
                    continue  # skip malformed lines (webds.py:110-117)
                if not isinstance(item, dict) or "key" not in item:
                    continue  # same skip for well-formed-but-keyless JSON
                entry = out.setdefault(item["key"], {})
                for name in self.meta_names:
                    if name in item:
                        entry[name] = item[name]
        return out

    def _begin_shard(self, shard: str) -> None:
        self._meta = self._load_meta(shard)


def make_loaders(train_ds: Dataset, batch_size: int, *, valid_ds: Optional[Dataset] = None,
                 rank: int = 0, world_size: int = 1, seed: int = 0,
                 start_iter: int = 0):
    """(configure_data.py:168-264) train/val loader pair, dp-sharded."""
    train = DataLoader(train_ds, DistributedBatchSampler(
        len(train_ds), batch_size, rank, world_size, True, seed, start_iter))
    valid = None
    if valid_ds is not None:
        valid = DataLoader(valid_ds, DistributedBatchSampler(
            len(valid_ds), batch_size, rank, world_size, False, seed))
    return train, valid
