"""Data pipeline: datasets, samplers with resume, loader prefetching,
video IO fallbacks, and the VideoPoseDataset over a synthetic fixture."""

import numpy as np
import pytest

from scail_tpu.data.datasets import (
    AlterDataset, DataLoader, DistributedBatchSampler, TensorDictDataset,
    VideoPoseDataset, WeightedConcatDataset, default_collate, make_loaders,
)
from scail_tpu.data.video import (
    load_video_frames, pad_last_frame, resize_for_rectangle_crop, save_mp4,
)


def test_sampler_shards_and_resumes():
    s0 = DistributedBatchSampler(20, 2, rank=0, world_size=2, seed=1)
    s1 = DistributedBatchSampler(20, 2, rank=1, world_size=2, seed=1)
    b0 = [b for _, b in zip(range(5), iter(s0))]
    b1 = [b for _, b in zip(range(5), iter(s1))]
    assert not set(sum(b0, [])) & set(sum(b1, []))  # disjoint shards per epoch

    resumed = DistributedBatchSampler(20, 2, rank=0, world_size=2, seed=1, start_iter=2)
    br = [b for _, b in zip(range(3), iter(resumed))]
    assert br == b0[2:5]


def test_weighted_and_alter_datasets():
    a = TensorDictDataset({"x": np.zeros((10, 2))})
    b = TensorDictDataset({"x": np.ones((10, 2))})
    w = WeightedConcatDataset([a, b], [0.0, 1.0])
    assert np.all(w[0]["x"] == 1)
    alt = AlterDataset([a, b])
    assert np.all(alt[0]["x"] == 0) and np.all(alt[1]["x"] == 1)


def test_loader_prefetch_and_collate():
    ds = TensorDictDataset({"x": np.arange(12, dtype=np.float32).reshape(12, 1)})
    train, _ = make_loaders(ds, batch_size=3, seed=0)
    it = iter(train)
    batch = next(it)
    assert batch["x"].shape == (3, 1)
    batch2 = next(it)
    assert batch2["x"].shape == (3, 1)


def test_collate_mixed_types():
    out = default_collate([{"a": np.zeros(2), "t": "hi", "n": 1},
                           {"a": np.ones(2), "t": "yo", "n": 2}])
    assert out["a"].shape == (2, 2)
    assert out["t"] == ["hi", "yo"]
    assert out["n"].tolist() == [1, 2]


def test_video_roundtrip_gif(tmp_path):
    frames = np.random.default_rng(0).uniform(0, 1, (5, 16, 24, 3)).astype(np.float32)
    written = save_mp4(frames, str(tmp_path / "clip.mp4"), fps=8)
    loaded, fps = load_video_frames(written)
    assert loaded.shape == (5, 16, 24, 3)
    assert fps > 0


def test_video_npz_roundtrip(tmp_path):
    frames = (np.random.default_rng(0).uniform(0, 255, (4, 8, 8, 3))).astype(np.uint8)
    np.savez(tmp_path / "clip.npz", frames=frames, fps=12.0)
    loaded, fps = load_video_frames(str(tmp_path / "clip.npz"))
    np.testing.assert_array_equal(loaded, frames)
    assert fps == 12.0


def test_pad_last_frame():
    x = np.arange(3)[:, None].repeat(4, 1)
    out = pad_last_frame(x, 5)
    assert out.shape == (5, 4)
    assert np.all(out[3:] == 2)


def test_tar_shard_dataset(tmp_path):
    import io
    import tarfile

    from scail_tpu.data.datasets import TarShardDataset

    p = tmp_path / "shard-000.tar"
    with tarfile.open(p, "w") as tf:
        for i in range(3):
            for ext, payload in (("txt", f"caption {i}".encode()),
                                 ("bin", bytes([i] * 4))):
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    ds = TarShardDataset([str(p)], shuffle_shards=False)
    items = [s for _, s in zip(range(3), iter(ds))]
    assert items[0]["txt"] == b"caption 0"
    assert items[2]["bin"] == bytes([2] * 4)
    assert items[1]["__key__"] == "000001"


def test_video_pose_dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for case in ("a", "b"):
        d = tmp_path / case
        d.mkdir()
        Image.fromarray(rng.integers(0, 255, (30, 50, 3), np.uint8)).save(d / "ref.png")
        for name in ("driving.gif", "rendered.gif"):
            ims = [Image.fromarray(rng.integers(0, 255, (30, 50, 3), np.uint8))
                   for _ in range(5)]
            ims[0].save(d / name, save_all=True, append_images=ims[1:], duration=60)
    ds = VideoPoseDataset(str(tmp_path), image_size=(16, 32), num_frames=5)
    assert len(ds) == 2
    item = ds[0]
    assert item["mp4"].shape == (5, 3, 16, 32)
    assert item["pose"].shape == (5, 3, 16, 32)
    assert item["ref_frame"].shape == (1, 3, 16, 32)
    assert abs(item["mp4"]).max() <= 1.0 + 1e-5


def test_gopen_file_and_pipe(tmp_path):
    """gopen scheme dispatch (reference webds.py:290-368 surface)."""
    from scail_tpu.data.gopen import Pipe, gopen

    p = tmp_path / "blob.bin"
    p.write_bytes(b"hello scail")
    with gopen(str(p)) as f:
        assert f.read() == b"hello scail"
    with gopen(f"file://{p}") as f:
        assert f.read() == b"hello scail"
    with gopen(f"pipe:cat {p}") as f:
        assert f.read() == b"hello scail"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        gopen("gs://nope/x")
    with _pytest.raises(OSError):
        Pipe("exit 3").close()


def test_tar_shard_dataset_via_pipe(tmp_path):
    """Tar shards stream through the pipe backend end-to-end."""
    import tarfile
    import io as _io

    from scail_tpu.data.datasets import TarShardDataset

    p = tmp_path / "shard-000.tar"
    with tarfile.open(p, "w") as tf:
        for i in range(3):
            for ext, payload in (("txt", f"cap {i}".encode()),
                                 ("bin", bytes([i] * 4))):
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(payload)
                tf.addfile(info, _io.BytesIO(payload))

    ds = TarShardDataset([f"pipe:cat {p}"], shuffle_shards=False)
    it = iter(ds)
    got = [next(it) for _ in range(3)]
    assert [g["txt"] for g in got] == [b"cap 0", b"cap 1", b"cap 2"]
    assert got[1]["bin"] == bytes([1] * 4)


def test_tar_shard_prefetch_thread_exits_on_abandon(tmp_path):
    """Abandoning the local-shard iterator mid-shard releases the
    prefetch thread (it used to block forever on q.put — ADVICE r2)."""
    import io
    import tarfile
    import threading
    import time

    from scail_tpu.data.datasets import TarShardDataset

    p = tmp_path / "shard-000.tar"
    with tarfile.open(p, "w") as tf:
        for i in range(32):  # >> queue maxsize so the reader blocks
            payload = bytes(64)
            info = tarfile.TarInfo(f"{i:06d}.bin")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))

    before = threading.active_count()
    ds = TarShardDataset([str(p)], shuffle_shards=False)
    it = iter(ds)
    next(it)
    it.close()  # triggers GeneratorExit -> finally -> stop event
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
