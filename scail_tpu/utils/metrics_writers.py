"""Metric writer adapters (reference: sat/training/utils.py:29-64).

The reference wires TensorBoardX (`get_sample_writer`) and optional wandb
(tensorboard-sync mode) into the training loop.  Here a `MetricsWriter`
multiplexes one record stream to:

  - JSONL (always; dependency-free, the canonical artifact)
  - TensorBoard events via torch.utils.tensorboard when importable
  - wandb when importable AND enable_wandb=True (reference: --wandb)

Missing backends degrade to no-ops, so the Trainer never grows a hard
dependency.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, save_dir: Optional[str], *, enable_tensorboard: bool = True,
                 enable_wandb: bool = False, wandb_project: str = "scail_tpu",
                 run_name: Optional[str] = None):
        self._jsonl = None
        self._tb = None
        self._wandb = None
        if save_dir is None:
            return
        os.makedirs(save_dir, exist_ok=True)
        self._jsonl = os.path.join(save_dir, "metrics.jsonl")

        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                # reference layout: <summary_dir>/runs/<name>
                # (sat/training/utils.py:29-33)
                self._tb = SummaryWriter(
                    log_dir=os.path.join(save_dir, "runs", run_name or "train"))
            except Exception:
                self._tb = None

        if enable_wandb:
            try:
                import wandb

                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(project=wandb_project, name=run_name,
                               dir=save_dir, mode=os.environ.get(
                                   "WANDB_MODE", "offline"))
            except Exception:
                self._wandb = None

    def write(self, record: Dict):
        """record must contain 'step'; scalar values are fanned out."""
        if self._jsonl:
            with open(self._jsonl, "a") as f:
                f.write(json.dumps(record) + "\n")
        step = int(record.get("step", record.get("iter", 0)))
        scalars = {k: float(v) for k, v in record.items()
                   if k not in ("step", "iter") and isinstance(v, (int, float))}
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None and self._wandb.run is not None:
            self._wandb.finish()
