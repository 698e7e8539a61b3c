"""Native tar IO (csrc/tario.cpp via scail_tpu/native/tario.py): index
and payload parity vs Python tarfile, GNU-longname handling, and the
TarShardDataset local fast path."""

import io
import os
import tarfile

import numpy as np
import pytest

from scail_tpu.native import tario


def _make_shard(path, n=4, long_name=False):
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            for ext in ("jpg", "txt"):
                name = f"{i:06d}.{ext}"
                if long_name and i == n - 1:
                    name = ("deep/" * 30) + name  # >100 chars -> GNU longname
                payload = rng.integers(0, 256, rng.integers(1, 2000)).astype(
                    np.uint8).tobytes()
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))


@pytest.mark.parametrize("long_name", [False, True])
def test_index_matches_tarfile(tmp_path, long_name):
    shard = str(tmp_path / "s.tar")
    _make_shard(shard, long_name=long_name)
    want = tario._index_tarfile(shard)
    got = tario.index_tar(shard)
    assert got == want
    if tario.get_lib() is None:
        pytest.skip("native lib unavailable (no toolchain)")


def test_read_member_matches_tarfile(tmp_path):
    shard = str(tmp_path / "s.tar")
    _make_shard(shard)
    with tarfile.open(shard) as tf:
        members = [m for m in tf.getmembers() if m.isfile()]
        payloads = {m.name: tf.extractfile(m).read() for m in members}
    for name, off, size in tario.index_tar(shard):
        assert tario.read_member(shard, off, size) == payloads[name]


def test_tar_shard_index_groups_samples(tmp_path):
    shard = str(tmp_path / "s.tar")
    _make_shard(shard, n=3)
    idx = tario.TarShardIndex(shard)
    assert len(idx) == 3
    s0 = idx.read_sample(0)
    assert s0["__key__"] == "000000" and set(s0) == {"__key__", "jpg", "txt"}


def test_tar_shard_dataset_local_fast_path(tmp_path):
    from scail_tpu.data.datasets import TarShardDataset

    shard = str(tmp_path / "s.tar")
    _make_shard(shard, n=3)
    ds = TarShardDataset([shard], shuffle_shards=False)
    it = iter(ds)
    got = [next(it) for _ in range(6)]  # wraps across the cycle
    keys = [s["__key__"] for s in got]
    assert keys == ["000000", "000001", "000002"] * 2
    # parity with the generic stream path
    stream = list(ds._iter_stream(shard))
    for a, b in zip(got[:3], stream):
        assert a == b


def test_nested_names_group_like_stream_path(tmp_path):
    """Directory-nested member names must produce the same keys and
    grouping on the local fast path as on the tarfile stream path."""
    from scail_tpu.data.datasets import TarShardDataset

    shard = str(tmp_path / "s.tar")
    with tarfile.open(shard, "w") as tf:
        for d in ("a", "b"):
            for ext in ("jpg", "txt"):
                payload = f"{d}-{ext}".encode()
                info = tarfile.TarInfo(f"{d}/000.{ext}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    ds = TarShardDataset([shard], shuffle_shards=False)
    it = iter(ds)
    local = [next(it), next(it)]
    stream = list(ds._iter_stream(shard))
    assert [s["__key__"] for s in local] == ["a/000", "b/000"]
    assert local == stream


def test_local_reader_surfaces_errors(tmp_path):
    """A corrupt shard must raise in the consumer, not hang the loop."""
    from scail_tpu.data.datasets import TarShardDataset
    from scail_tpu.native import tario

    shard = str(tmp_path / "s.tar")
    _make_shard(shard, n=2)
    idx = tario.TarShardIndex(shard)          # index while intact
    with open(shard, "r+b") as f:             # truncate payloads away
        f.truncate(600)
    ds = TarShardDataset([shard], shuffle_shards=False)
    ds._index_cache = {shard: idx}
    with pytest.raises(OSError):
        for _ in ds:
            pass


def test_truncated_tar_raises(tmp_path):
    """A shard cut off mid-member raises (like tarfile's ReadError)
    instead of silently returning a partial index (ADVICE r2)."""
    p = tmp_path / "shard.tar"
    _make_shard(p, n=4)
    data = p.read_bytes()
    # cut inside the last member's payload (tarfile pads archives to a
    # 10KiB record, so cut relative to the member offset, not the end)
    with tarfile.open(p) as tf:
        last = tf.getmembers()[-1]
    cut = last.offset_data + max(1, last.size // 2)
    (tmp_path / "trunc.tar").write_bytes(data[:cut])
    if tario.get_lib() is None:
        pytest.skip("native tario unavailable")
    with pytest.raises(OSError, match="truncated|corrupt"):
        tario.index_tar(str(tmp_path / "trunc.tar"))
    # intact shard still indexes fine
    assert len(tario.index_tar(str(p))) == 8
