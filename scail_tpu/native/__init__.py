"""Native (C++) host runtime pieces, loaded via ctypes.

Build-on-first-use with g++ (the reference uses a DeepSpeed-style JIT
builder, sat/ops/ops_builder/builder.py); everything has a numpy fallback
so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "frameproc.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "_frameproc.so")


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", src, "-o", _OUT],
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
        if not os.path.exists(_OUT) and not _build():
            _LIB = False
            return None
        try:
            lib = ctypes.CDLL(_OUT)
            lib.normalize_frames_u8_to_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.center_crop_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p] + \
                [ctypes.c_int64] * 8
            _LIB = lib
            return lib
        except OSError:
            _LIB = False
            return None


def normalize_frames(frames_u8: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """(T, H, W, C) uint8 -> (T, C, H, W) float32 in [-1, 1]; native when
    possible, numpy otherwise."""
    frames_u8 = np.ascontiguousarray(frames_u8)
    t, h, w, c = frames_u8.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty((t, c, h, w), np.float32)
        lib.normalize_frames_u8_to_f32(
            frames_u8.ctypes.data, out.ctypes.data, t, h, w, c, n_threads)
        return out
    x = frames_u8.astype(np.float32).transpose(0, 3, 1, 2)
    return (x - 127.5) / 127.5


def center_crop(x_f32: np.ndarray, top: int, left: int, oh: int, ow: int) -> np.ndarray:
    """(T, C, H, W) float32 crop; native fast path."""
    x_f32 = np.ascontiguousarray(x_f32, dtype=np.float32)
    t, c, h, w = x_f32.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty((t, c, oh, ow), np.float32)
        lib.center_crop_f32(x_f32.ctypes.data, out.ctypes.data,
                            t, c, h, w, top, left, oh, ow)
        return out
    return x_f32[:, :, top : top + oh, left : left + ow].copy()
