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


def _stale() -> bool:
    try:
        return os.path.getmtime(os.path.abspath(_SRC)) > os.path.getmtime(_OUT)
    except OSError:
        return False


def get_lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        if (not os.path.exists(_OUT) or _stale()) and not _build():
            if not os.path.exists(_OUT):
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
            lib.resize_separable_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int,
            ]
            _LIB = lib
            return lib
        except (OSError, AttributeError):
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


def _resize_host(x: np.ndarray, out_h: int, out_w: int, kind: str,
                 antialias: bool, align_corners: bool = False,
                 n_threads: int = 0) -> np.ndarray:
    """(..., H, W) float -> (..., out_h, out_w) float32 on the HOST, with
    the exact torch-parity numerics of scail_tpu/ops/resize.py (shared
    weight builders, native/resize_kernels.py).  The data loader uses this
    so decode->resize->normalize never touches the accelerator: on a TPU
    host a device-side resize would both ship raw frames over PCIe and
    serialize with the train step (the device is one queue).
    Matches /root/reference/data_video.py:141-170's torchvision resize."""
    from scail_tpu.native import resize_kernels as rk

    x = np.ascontiguousarray(x, dtype=np.float32)
    *lead, in_h, in_w = x.shape
    planes = int(np.prod(lead)) if lead else 1
    lib = get_lib()
    if lib is not None:
        if kind == "bicubic":
            h_band = (rk.banded_bicubic(in_h, out_h, antialias)
                      if in_h != out_h else rk.banded_identity(in_h))
            w_band = (rk.banded_bicubic(in_w, out_w, antialias)
                      if in_w != out_w else rk.banded_identity(in_w))
        else:
            h_band = (rk.banded_bilinear(in_h, out_h, antialias, align_corners)
                      if in_h != out_h else rk.banded_identity(in_h))
            w_band = (rk.banded_bilinear(in_w, out_w, antialias, align_corners)
                      if in_w != out_w else rk.banded_identity(in_w))
        h_lo, h_w = h_band
        w_lo, w_w = w_band
        out = np.empty((planes, out_h, out_w), np.float32)
        lib.resize_separable_f32(
            x.ctypes.data, out.ctypes.data, planes, in_h, in_w, out_h, out_w,
            h_lo.ctypes.data, h_w.ctypes.data, h_w.shape[1],
            w_lo.ctypes.data, w_w.ctypes.data, w_w.shape[1], n_threads)
        return out.reshape(*lead, out_h, out_w)
    # numpy fallback: dense matrices, same numerics
    if kind == "bicubic":
        mh = rk.resize_matrix(in_h, out_h, antialias)
        mw = rk.resize_matrix(in_w, out_w, antialias)
    else:
        mh = rk.lin_matrix(in_h, out_h, antialias, align_corners)
        mw = rk.lin_matrix(in_w, out_w, antialias, align_corners)
    xf = x.reshape(planes, in_h, in_w)
    if in_h != out_h:
        xf = np.einsum("oh,phw->pow", mh, xf, optimize=True)
    if in_w != out_w:
        xf = np.einsum("ow,phw->pho", mw, xf, optimize=True)
    return np.ascontiguousarray(xf, dtype=np.float32).reshape(
        *lead, out_h, out_w)


def resize_bicubic_host(x: np.ndarray, out_h: int, out_w: int, *,
                        antialias: bool = False) -> np.ndarray:
    return _resize_host(x, out_h, out_w, "bicubic", antialias)


def resize_bilinear_host(x: np.ndarray, out_h: int, out_w: int, *,
                         antialias: bool = False,
                         align_corners: bool = False) -> np.ndarray:
    return _resize_host(x, out_h, out_w, "bilinear", antialias, align_corners)


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
