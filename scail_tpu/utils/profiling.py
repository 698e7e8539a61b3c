"""Profiling / tracing (reference: sat/training/utils.py Timers + nvtx
ranges gated by --profiling, deepspeed_training.py:458-470).

TPU-native: `jax.profiler` traces (XPlane/Perfetto-viewable) with named
ranges via TraceAnnotation; `report_memory` reads device memory stats.
"""

from __future__ import annotations

import contextlib
import os

import jax

from scail_tpu.utils.logging import print_rank0


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Capture a device trace to `logdir` (view with xprof/tensorboard)."""
    if not enabled:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print_rank0(f"profiler trace written to {logdir}")


def annotate(name: str):
    """Named range inside a trace (the nvtx.range_push equivalent)."""
    return jax.profiler.TraceAnnotation(name)


def report_memory(name: str = ""):
    """(sat/training/utils.py:135): device memory snapshot."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        stats = None
    if stats:
        gib = 1024 ** 3
        print_rank0(
            f"memory ({name}): in_use {stats.get('bytes_in_use', 0) / gib:.2f} GiB | "
            f"peak {stats.get('peak_bytes_in_use', 0) / gib:.2f} GiB | "
            f"limit {stats.get('bytes_limit', 0) / gib:.2f} GiB"
        )
    return stats
