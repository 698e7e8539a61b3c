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
