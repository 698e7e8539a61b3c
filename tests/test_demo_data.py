"""Demo image datasets (sgm/data/mnist.py, sgm/data/cifar10.py parity).

The reference record contract is {"jpg": CHW float in [-1,1], "cls": int}
via torchvision ToTensor (/255) then x*2-1; these tests pin the native
IDX / pickled-batch parsers and the loader surface against that math.
"""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from scail_tpu.data.demo import (CIFAR10Demo, DemoImageLoader, MNISTDemo,
                                 load_cifar10, load_mnist, read_idx)


def _write_idx(path, arr, compress=False):
    header = struct.pack(">HBB", 0, 0x08, arr.ndim)
    header += struct.pack(">" + "I" * arr.ndim, *arr.shape)
    payload = header + arr.astype(np.uint8).tobytes()
    if compress:
        with gzip.open(path + ".gz", "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def _make_mnist(root, n=12, compress=False):
    rng = np.random.default_rng(0)
    for stem, k in (("train", n), ("t10k", n // 2)):
        imgs = rng.integers(0, 256, (k, 28, 28), np.uint8)
        labels = rng.integers(0, 10, (k,), np.uint8)
        _write_idx(os.path.join(root, f"{stem}-images-idx3-ubyte"), imgs,
                   compress)
        _write_idx(os.path.join(root, f"{stem}-labels-idx1-ubyte"), labels,
                   compress)
    return imgs, labels


def _make_cifar(root, n=10):
    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(1)
    per = {}
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        data = rng.integers(0, 256, (n, 3 * 32 * 32), np.uint8)
        labels = rng.integers(0, 10, (n,)).tolist()
        with open(os.path.join(d, name), "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        per[name] = (data, labels)
    return per


def test_idx_roundtrip_plain_and_gz(tmp_path):
    arr = np.arange(2 * 5 * 3, dtype=np.uint8).reshape(2, 5, 3)
    _write_idx(str(tmp_path / "a-idx3-ubyte"), arr)
    _write_idx(str(tmp_path / "b-idx3-ubyte"), arr, compress=True)
    np.testing.assert_array_equal(read_idx(str(tmp_path / "a-idx3-ubyte")), arr)
    # .gz fallback resolves when the plain path is absent
    np.testing.assert_array_equal(read_idx(str(tmp_path / "b-idx3-ubyte")), arr)


def test_mnist_record_contract(tmp_path):
    _make_mnist(str(tmp_path))
    d = load_mnist(str(tmp_path), train=True)
    assert d["images"].shape == (12, 1, 28, 28) and d["images"].dtype == np.uint8
    ds = MNISTDemo(str(tmp_path), train=True)
    rec = ds[3]
    # ToTensor (/255) then x*2-1 — sgm/data/mnist.py:24-26
    want = d["images"][3].astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(rec["jpg"], want, rtol=0, atol=0)
    assert rec["jpg"].min() >= -1.0 and rec["jpg"].max() <= 1.0
    assert isinstance(rec["cls"], int) and rec["cls"] == int(d["labels"][3])


def test_mnist_raw_subdir_layout(tmp_path):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    _make_mnist(str(raw), compress=True)  # torchvision's download layout
    assert load_mnist(str(tmp_path), train=False)["images"].shape[0] == 6


def test_cifar10_batches(tmp_path):
    per = _make_cifar(str(tmp_path))
    d = load_cifar10(str(tmp_path), train=True)
    assert d["images"].shape == (50, 3, 32, 32)
    # first training image comes from data_batch_1 row 0, CHW-reshaped
    want0 = per["data_batch_1"][0][0].reshape(3, 32, 32)
    np.testing.assert_array_equal(d["images"][0], want0)
    test = CIFAR10Demo(str(tmp_path), train=False)
    assert len(test) == 10


def test_loader_surface_synthetic():
    dm = DemoImageLoader("cifar10", batch_size=8, synthetic=True)
    batch = next(iter(dm.train_dataloader()))
    assert batch["jpg"].shape == (8, 3, 32, 32)
    assert batch["cls"].shape == (8,)
    # the reference serves the test split as val (sgm/data/cifar10.py:62)
    v = next(iter(dm.val_dataloader()))
    t = next(iter(dm.test_dataloader()))
    np.testing.assert_array_equal(v["jpg"], t["jpg"])


def test_missing_files_error(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_mnist(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        load_cifar10(str(tmp_path))
