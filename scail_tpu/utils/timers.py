"""Named device-synchronized timers (reference: sat/training/utils.py:67-133).

The reference's Timers cuda-synchronize around named regions; here we
block on JAX async dispatch via `jax.block_until_ready` on a sentinel or
`jax.effects_barrier` equivalents.
"""

from __future__ import annotations

import time
from typing import Dict


class _Timer:
    def __init__(self, name: str):
        self.name = name
        self.elapsed_ = 0.0
        self.started = False
        self.start_time = 0.0

    def start(self):
        assert not self.started, f"timer {self.name} already started"
        self.start_time = time.perf_counter()
        self.started = True

    def stop(self):
        assert self.started, f"timer {self.name} not started"
        self.elapsed_ += time.perf_counter() - self.start_time
        self.started = False

    def reset(self):
        self.elapsed_ = 0.0
        self.started = False

    def elapsed(self, reset=True):
        was_started = self.started
        if was_started:
            self.stop()
        e = self.elapsed_
        if reset:
            self.reset()
        if was_started:
            self.start()
        return e


class Timers:
    """Group of named timers; `log` prints ms per interval like the
    reference's `Timers.log`."""

    def __init__(self):
        self.timers: Dict[str, _Timer] = {}

    def __call__(self, name: str) -> _Timer:
        if name not in self.timers:
            self.timers[name] = _Timer(name)
        return self.timers[name]

    def log(self, names=None, normalizer=1.0, reset=True) -> str:
        names = names or list(self.timers)
        parts = []
        for n in names:
            if n in self.timers:
                ms = self.timers[n].elapsed(reset=reset) * 1000.0 / normalizer
                parts.append(f"{n}: {ms:.2f}ms")
        line = " | ".join(parts)
        from scail_tpu.utils.logging import print_rank0

        print_rank0("timers: " + line)
        return line


def device_sync(x=None):
    """Block until all prior device work is done (like torch.cuda.synchronize)."""
    import jax

    if x is not None:
        jax.block_until_ready(x)
    else:
        jax.effects_barrier()
