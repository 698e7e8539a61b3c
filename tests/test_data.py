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


# ---------------------------------------------------------------------------
# Meta-injected webdataset + shard-path expansion (webds.py:233-289)
# ---------------------------------------------------------------------------
def _write_tar(p, n=3):
    import io
    import tarfile

    with tarfile.open(p, "w") as tf:
        for i in range(n):
            payload = f"caption {i}".encode()
            info = tarfile.TarInfo(f"{i:06d}.txt")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))


def test_braceexpand():
    from scail_tpu.data.datasets import braceexpand

    assert braceexpand("s-{000..002}.tar") == [
        "s-000.tar", "s-001.tar", "s-002.tar"]
    assert braceexpand("{a,b}/{0..1}.tar") == [
        "a/0.tar", "a/1.tar", "b/0.tar", "b/1.tar"]
    assert braceexpand("plain.tar") == ["plain.tar"]


def test_expand_shard_paths_include_dirs(tmp_path):
    from scail_tpu.data.datasets import expand_shard_paths

    (tmp_path / "A").mkdir()
    (tmp_path / "B").mkdir()
    _write_tar(tmp_path / "A" / "a0.tar")
    _write_tar(tmp_path / "B" / "b0.tar")
    (tmp_path / "B" / "empty.tar").write_bytes(b"")  # skipped: size 0
    got = expand_shard_paths(
        "", include_dirs=f"{tmp_path}/A,{tmp_path}/B*2")
    assert got == [str(tmp_path / "A" / "a0.tar"),
                   str(tmp_path / "B" / "b0.tar"),
                   str(tmp_path / "B" / "b0.tar")]


def test_meta_tar_shard_dotted_name_and_keyless_lines(tmp_path):
    """Review findings: shard basenames with dots must map to the right
    sidecar (splitext, not split('.')[0]); well-formed JSON without a
    'key' (or non-dict JSON) is skipped like malformed lines."""
    import json

    from scail_tpu.data.datasets import MetaTarShardDataset

    p = tmp_path / "clips.v2-000.tar"
    _write_tar(p, n=2)
    assert MetaTarShardDataset.meta_path_for(str(p)).endswith(
        "clips.v2-000.meta.jsonl")
    with open(tmp_path / "clips.v2-000.meta.jsonl", "w") as f:
        f.write(json.dumps({"score": 0.1}) + "\n")      # keyless: skipped
        f.write("42\n")                                  # non-dict: skipped
        f.write(json.dumps({"key": "000001", "score": 0.9}) + "\n")
    ds = MetaTarShardDataset([str(p)], meta_names=["score"],
                             shuffle_shards=False)
    items = [s for _, s in zip(range(2), iter(ds))]
    assert "score" not in items[0]
    assert items[1]["score"] == 0.9


def test_expand_shard_paths_suffix_and_star(tmp_path):
    """'.tar' means the extension, not a name suffix; '*n' weighting
    parses from the RIGHT so earlier '*'s in the path survive."""
    from scail_tpu.data.datasets import expand_shard_paths

    d = tmp_path / "A"
    d.mkdir()
    _write_tar(d / "a0.tar")
    (d / "avatar").write_bytes(b"not a tar")   # ends with 'tar', not '.tar'
    got = expand_shard_paths("", include_dirs=f"{d}*2")
    assert got == [str(d / "a0.tar")] * 2


def test_meta_tar_shard_dataset(tmp_path):
    import json

    from scail_tpu.data.datasets import MetaTarShardDataset

    p = tmp_path / "shard-000.tar"
    _write_tar(p, n=3)
    with open(tmp_path / "shard-000.meta.jsonl", "w") as f:
        f.write(json.dumps({"key": "000000", "score": 0.5, "txt2": "x"}) + "\n")
        f.write("NOT JSON {{{\n")  # malformed line: skipped (webds.py:110-117)
        f.write(json.dumps({"key": "000002", "score": 0.9}) + "\n")

    ds = MetaTarShardDataset([str(p)], meta_names=["score"],
                             shuffle_shards=False)
    items = [s for _, s in zip(range(3), iter(ds))]
    assert items[0]["score"] == 0.5
    assert "txt2" not in items[0]  # only requested meta_names injected
    assert "score" not in items[1]  # no meta line for key 000001
    assert items[2]["score"] == 0.9
    # absent sidecar: samples flow through unchanged
    p2 = tmp_path / "shard-001.tar"
    _write_tar(p2, n=1)
    ds2 = MetaTarShardDataset([str(p2)], meta_names=["score"],
                              shuffle_shards=False)
    (one,) = [s for _, s in zip(range(1), iter(ds2))]
    assert one["txt"] == b"caption 0" and "score" not in one


# ---------------------------------------------------------------------------
# HF-datasets wrapper (sat/data_utils/hf_dataset.py:1-40)
# ---------------------------------------------------------------------------
def test_parse_huggingface_path():
    from scail_tpu.data.hf_dataset import parse_huggingface_path

    assert parse_huggingface_path("hf://glue/mrpc/test") == (
        "glue", "mrpc", "test")
    assert parse_huggingface_path("glue/*/validation") == (
        "glue", None, "validation")
    assert parse_huggingface_path("wikitext") == ("wikitext", None, "train")


def test_load_hf_dataset_processed_cache(tmp_path):
    """The processed-cache branch (hf_dataset.py:29-30) works offline:
    a dataset saved at the derived path loads without touching the hub."""
    import datasets as hfd

    from scail_tpu.data.hf_dataset import load_hf_dataset

    cache = tmp_path / "hfcache"
    cache.mkdir()
    ds = hfd.Dataset.from_dict({"ids": [[1, 2], [3, 4]], "y": [0, 1]})
    ds.save_to_disk(str(cache / "fake_sub_train_tok.data"))

    out = load_hf_dataset("hf://fake/sub/train", None, columns=["ids"],
                          cache_dir=str(cache), transformer_name="tok")
    assert len(out) == 2
    row = out[0]
    assert list(row.keys()) == ["ids"]
    assert np.asarray(row["ids"]).tolist() == [1, 2]
