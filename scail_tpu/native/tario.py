"""Native tar-shard IO (csrc/tario.cpp via ctypes) with a tarfile
fallback.

The reference streams webdataset shards through Python tarfile
(sat/data_utils/webds.py); on a TPU host the input pipeline competes
with JAX dispatch for host cores, so local shards go through a one-pass
native index + pread member reads instead (ctypes releases the GIL
around the foreign call, so prefetch threads genuinely overlap device
steps).  Everything degrades to tarfile when the toolchain or lib is
missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Tuple

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "tario.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "_tario.so")


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _OUT],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        src = os.path.abspath(_SRC)
        stale = (os.path.exists(_OUT) and os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_OUT))
        if (stale or not os.path.exists(_OUT)) and not _build():
            _LIB = False
            return None
        try:
            lib = ctypes.CDLL(_OUT)
            lib.tar_scan.restype = ctypes.c_int64
            lib.tar_scan.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.tar_pread.restype = ctypes.c_int64
            lib.tar_pread.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p,
            ]
            _LIB = lib
            return lib
        except OSError:
            _LIB = False
            return None


def _index_tarfile(path: str) -> List[Tuple[str, int, int]]:
    import tarfile

    out = []
    with tarfile.open(path) as tf:
        for m in tf.getmembers():
            if m.isfile():
                out.append((m.name, m.offset_data, m.size))
    return out


def index_tar(path: str) -> List[Tuple[str, int, int]]:
    """[(member name, payload offset, size)] in archive order."""
    lib = get_lib()
    if lib is None:
        return _index_tarfile(path)
    max_entries = 1 << 16
    names_cap = 1 << 22
    while True:
        offsets = np.empty(max_entries, np.int64)
        sizes = np.empty(max_entries, np.int64)
        names = ctypes.create_string_buffer(names_cap)
        n = lib.tar_scan(path.encode(), offsets.ctypes.data,
                         sizes.ctypes.data, names, names_cap, max_entries)
        if n == -2:  # grow and retry
            max_entries *= 4
            names_cap *= 4
            continue
        if n == -3:
            # same situation where tarfile raises ReadError: a damaged
            # shard must fail loudly, not silently drop samples
            raise OSError(f"truncated or corrupt tar: {path}")
        if n < 0:
            raise OSError(f"tar_scan failed for {path}")
        break
    out, pos = [], 0
    raw = names.raw
    for i in range(n):
        end = raw.index(b"\0", pos)
        # surrogateescape to match Python tarfile's name decoding
        out.append((raw[pos:end].decode("utf-8", "surrogateescape"),
                    int(offsets[i]), int(sizes[i])))
        pos = end + 1
    return out


def read_member(path: str, offset: int, size: int) -> bytes:
    """pread one member payload (GIL released in the native call).

    Returns a bytes-like object (bytearray on the native path: pread
    lands directly in it, avoiding the copy a bytes return would cost)."""
    lib = get_lib()
    if lib is None:
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(size)
    buf = bytearray(size)
    addr = (ctypes.c_char * size).from_buffer(buf) if size else None
    got = lib.tar_pread(path.encode(), offset, size, addr)
    if got != size:
        raise OSError(f"short read from {path} @{offset}: {got}/{size}")
    return buf


class TarShardIndex:
    """Random-access view of one local shard: members grouped into
    webdataset samples by full-name prefix (everything before the first
    dot, matching the stream path), archive order preserved."""

    def __init__(self, path: str):
        self.path = path
        self.members = index_tar(path)
        self.samples: List[Tuple[str, Dict[str, Tuple[int, int]]]] = []
        cur_key, cur = None, {}
        for name, off, size in self.members:
            # group by the FULL name prefix, exactly like the stream
            # path (member.name.partition(".")): nested shards must
            # yield identical keys/grouping on both code paths
            base, _, ext = name.partition(".")
            if cur_key is not None and base != cur_key and cur:
                self.samples.append((cur_key, cur))
                cur = {}
            cur_key = base
            cur[ext] = (off, size)
        if cur:
            self.samples.append((cur_key, cur))

    def __len__(self):
        return len(self.samples)

    def read_sample(self, i: int) -> Dict[str, bytes]:
        key, exts = self.samples[i]
        out: Dict[str, bytes] = {"__key__": key}
        for ext, (off, size) in exts.items():
            out[ext] = read_member(self.path, off, size)
        return out
