"""Checkpoint save/restore with SAT layout semantics
(reference: sat/training/model_io.py).

Layout: `<save>/<iteration>/` per-iteration Orbax checkpoints plus a text
file `latest` naming the most recent iteration (model_io.py:36-48).  State
includes params, optimizer state (incl. the EMA shadow), the PRNG key, and
the client step -- matching the reference's RNG-state save for bit-exact
resume (model_io.py:203-207, :337-349).  EMA double-save mirrors
model_io.py:166-171.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _tracker_path(save_dir: str) -> str:
    return os.path.join(save_dir, "latest")


def read_latest(save_dir: str) -> Optional[str]:
    p = _tracker_path(save_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read().strip()


def save_checkpoint(save_dir: str, iteration: int, state: Dict[str, Any],
                    model_config: Optional[Dict] = None, ema_params=None):
    """state: pytree dict (params/opt_state/rng/step...)."""
    save_dir = os.path.abspath(save_dir)
    it_dir = os.path.join(save_dir, str(iteration))
    os.makedirs(save_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(it_dir, "state"), state, force=True)
    if ema_params is not None:
        # EMA double-save (model_io.py:166-171): sibling tree of EMA weights
        ckptr.save(os.path.join(it_dir, "ema"), {"params": ema_params}, force=True)
    ckptr.wait_until_finished()
    if model_config is not None:
        # dumped for from_pretrained (model_io.py:186-189)
        with open(os.path.join(save_dir, "model_config.json"), "w") as f:
            json.dump(model_config, f, indent=2, default=str)
    with open(_tracker_path(save_dir), "w") as f:
        f.write(str(iteration))


def load_checkpoint(save_dir: str, template: Dict[str, Any],
                    iteration: Optional[int] = None, ema: bool = False):
    """Restore into the shape/dtype structure of `template`.  Follows the
    `latest` tracker when iteration is None (model_io.py:260-276)."""
    it = str(iteration) if iteration is not None else read_latest(save_dir)
    if it is None:
        raise FileNotFoundError(f"no `latest` tracker in {save_dir}")
    sub = "ema" if ema else "state"
    path = os.path.join(os.path.abspath(save_dir), it, sub)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return ckptr.restore(path, abstract), int(it)


class CheckpointManager:
    """Async checkpointing + retention GC for long runs.

    The reference saves synchronously and keeps every iteration
    (model_io.py:159-230); on TPU the save stalls the step loop for
    multi-GB states, so saves here go through `ocp.AsyncCheckpointer`
    (device->host transfer happens up front, serialization in a
    background thread).  The `latest` tracker is only advanced once the
    async write has committed, so a crash mid-save can never point
    `latest` at a torn checkpoint; the advance happens from a commit
    thread as soon as the write lands (not deferred to the next save,
    which used to lose one save interval if the process died in between
    -- ADVICE r2).  Retention: keep the newest `keep_last` iterations
    plus every multiple of `keep_every` (0 = keep none by period),
    mirroring typical long-run GC policies.
    """

    def __init__(self, save_dir: str, keep_last: int = 3,
                 keep_every: int = 0, async_save: bool = True):
        import threading

        self.save_dir = os.path.abspath(save_dir)
        self.keep_last = keep_last
        self.keep_every = keep_every
        self.async_save = async_save
        self._state_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._ema_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._pending: Optional[tuple] = None  # (iteration, has_ema)
        self._lock = threading.Lock()

    # ------------------------------------------------------------------
    def save(self, iteration: int, state: Dict[str, Any],
             model_config: Optional[Dict] = None, ema_params=None):
        import threading

        self._finalize()  # order saves (no-op if the commit thread ran)
        it_dir = os.path.join(self.save_dir, str(iteration))
        os.makedirs(self.save_dir, exist_ok=True)
        self._state_ckptr.save(os.path.join(it_dir, "state"), args=ocp.args.StandardSave(state), force=True)
        if ema_params is not None:
            self._ema_ckptr.save(os.path.join(it_dir, "ema"),
                                 args=ocp.args.StandardSave({"params": ema_params}),
                                 force=True)
        if model_config is not None:
            with open(os.path.join(self.save_dir, "model_config.json"), "w") as f:
                json.dump(model_config, f, indent=2, default=str)
        self._pending = (iteration, ema_params is not None)
        if self.async_save:
            # advance the tracker the moment the async write commits, so a
            # crash between save intervals still resumes from this save
            threading.Thread(target=self._finalize, daemon=True).start()
        else:
            self._finalize()

    def _finalize(self):
        with self._lock:
            if self._pending is None:
                return
            iteration, _ = self._pending
            self._state_ckptr.wait_until_finished()
            self._ema_ckptr.wait_until_finished()
            with open(_tracker_path(self.save_dir), "w") as f:
                f.write(str(iteration))
            self._pending = None
            self._gc()

    def wait(self):
        """Block until the in-flight save (if any) has committed."""
        self._finalize()

    close = wait

    # ------------------------------------------------------------------
    def _retained(self, iterations):
        keep = set(sorted(iterations)[-self.keep_last:] if self.keep_last else [])
        if self.keep_every:
            keep |= {i for i in iterations if i % self.keep_every == 0}
        return keep

    def _gc(self):
        import shutil

        its = []
        for name in os.listdir(self.save_dir):
            if name.isdigit() and os.path.isdir(os.path.join(self.save_dir, name)):
                its.append(int(name))
        keep = self._retained(its)
        latest = read_latest(self.save_dir)
        if latest is not None:
            keep.add(int(latest))
        for i in its:
            if i not in keep:
                shutil.rmtree(os.path.join(self.save_dir, str(i)),
                              ignore_errors=True)
