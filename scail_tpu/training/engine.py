"""Training engine (reference: sat/training/deepspeed_training.py).

`training_main` -> Trainer.fit: the grad-accumulation-aware train loop with
NaN-skip (:589-591), metric reduction (:569-588), periodic logging /
checkpointing / evaluation (:431-540), and checkpoint-based resume via the
`latest` tracker (:98-123).  DeepSpeed+ZeRO is replaced by jit-sharded
optimizer state over the mesh (optimizer state sharded like params; data
parallelism via batch sharding -- XLA emits the grad reduce the DeepSpeed
allreduce did).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scail_tpu.training.checkpoint import load_checkpoint, read_latest, save_checkpoint
from scail_tpu.training.ema_adam import fused_ema_adam, swap_in_ema
from scail_tpu.training.lr_schedules import annealing_lr
from scail_tpu.utils.logging import print_rank0
from scail_tpu.utils.timers import Timers


@dataclasses.dataclass
class TrainConfig:
    train_iters: int = 1000
    lr: float = 1e-4
    warmup_iters: int = 100
    lr_decay_style: str = "cosine"
    lr_decay_ratio: float = 0.1
    weight_decay: float = 0.01
    clip_grad: float = 1.0
    grad_accum: int = 1
    ema_decay: float = 0.9999
    log_interval: int = 10
    save_interval: int = 500
    eval_interval: int = 500
    eval_iters: int = 8
    exit_interval: Optional[int] = None     # clean coordinated exit (:529-535)
    save_dir: Optional[str] = None
    tensorboard: bool = True            # sat/training/utils.py:29-33
    wandb: bool = False                 # sat/training/utils.py:35-64
    wandb_project: str = "scail_tpu"
    experiment_name: Optional[str] = None
    seed: int = 1234
    skip_nan: bool = True
    check_param_sync_interval: Optional[int] = None  # (:245-296)
    async_save: bool = True                 # overlap Orbax writes with steps
    keep_last_checkpoints: int = 3          # retention GC (CheckpointManager)
    keep_every_checkpoints: int = 0


def _opt_shardings_like(opt_struct, params, param_shardings):
    """Sharding pytree for an optax state: optax builds its param-shaped
    moments via tree_map over the params, so any subtree that mirrors the
    params' container structure (same dict keys, matching leaf shapes) is
    a param clone and adopts the param shardings.  Clones may be PARTIAL:
    multi_transform/masked replace frozen leaves with MaskedNode, so the
    match recurses per key and only non-matching positions (scalar
    counts, MaskedNode stubs) fall back to replicated."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = jax.tree.leaves(param_shardings)[0].mesh
    replicated = NamedSharding(mesh, PartitionSpec())

    def clone_rec(node, pnode, pshard):
        """Sharding tree if `node` is a (possibly masked) clone of the
        params subtree `pnode`, else None."""
        if isinstance(node, dict) and isinstance(pnode, dict):
            if set(node) != set(pnode):
                return None
            return {k: _or_replicated(clone_rec(node[k], pnode[k], pshard[k]))
                    for k in node}
        if (isinstance(node, (list, tuple)) and isinstance(pnode, (list, tuple))
                and not hasattr(node, "_fields") and len(node) == len(pnode)):
            # param subtrees stored as lists/tuples (e.g. tokenizer
            # enc_layers) mirror the dict branch so their moments keep the
            # ZeRO layout instead of silently replicating
            return type(node)(
                _or_replicated(clone_rec(n, p, s))
                for n, p, s in zip(node, pnode, pshard))
        if (hasattr(node, "shape") and hasattr(pnode, "shape")
                and tuple(node.shape) == tuple(pnode.shape)):
            return pshard
        return None

    def _or_replicated(x):
        return replicated if x is None else x

    def rec(node):
        c = clone_rec(node, params, param_shardings)
        if c is not None:
            return c
        if hasattr(node, "_fields"):            # optax NamedTuple states
            return type(node)(*[rec(getattr(node, f)) for f in node._fields])
        if isinstance(node, (tuple, list)):
            return type(node)(rec(c) for c in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return replicated

    return rec(opt_struct)


class Trainer:
    """Owns optimizer/step state around a loss function
    loss_fn(params, key, batch) -> scalar (mean over batch)."""

    def __init__(self, params, loss_fn: Callable, config: TrainConfig,
                 model_config: Optional[Dict] = None, param_shardings=None,
                 train_mask=None):
        self.config = config
        self.model_config = model_config
        self.schedule = annealing_lr(
            config.lr, config.warmup_iters, config.train_iters,
            config.lr_decay_style, config.lr_decay_ratio,
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.clip_grad),
            fused_ema_adam(self.schedule, weight_decay=config.weight_decay,
                           ema_decay=config.ema_decay),
        )
        if train_mask is not None:
            # selective finetuning (LoRA/prefix/adapters): frozen leaves
            # get zero updates and no optimizer state
            self.tx = optax.multi_transform(
                {"train": self.tx, "freeze": optax.set_to_zero()},
                param_labels=jax.tree.map(
                    lambda m: "train" if m else "freeze", train_mask))
        if param_shardings is not None:
            # apply the mesh layout inside the Trainer (callers pass a
            # NamedSharding pytree, e.g. from parallel/sharding.specs_for_
            # tree).  Optimizer state is laid out ZeRO-style: every
            # param-tree clone inside the optax state (mu/nu/ema shadow)
            # gets the param shardings, scalars replicate -- the role of
            # deepspeed_training.py:326-336.
            from scail_tpu.parallel.sharding import global_put

            params = global_put(params, param_shardings)
            opt_struct = jax.eval_shape(self.tx.init, params)
            opt_shardings = _opt_shardings_like(
                opt_struct, params, param_shardings)
            opt_state = jax.jit(
                self.tx.init, out_shardings=opt_shardings)(params)
        else:
            opt_state = self.tx.init(params)
        self.state = {
            "params": params,
            "opt_state": opt_state,
            "step": jnp.zeros([], jnp.int32),
            "rng": jax.random.PRNGKey(config.seed),
            "skipped": jnp.zeros([], jnp.int32),
        }
        self.loss_fn = loss_fn
        self.timers = Timers()
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0,))
        from scail_tpu.utils.metrics_writers import MetricsWriter

        self.metrics_writer = MetricsWriter(
            config.save_dir, enable_tensorboard=config.tensorboard,
            enable_wandb=config.wandb, wandb_project=config.wandb_project,
            run_name=config.experiment_name)

    def _log_metrics(self, record: Dict):
        """JSONL + tensorboard + optional wandb
        (sat/training/utils.py:29-64)."""
        self.metrics_writer.write(record)

    # ------------------------------------------------------------------
    def _train_step(self, state, batch):
        """One optimizer step over `grad_accum` microbatches, with NaN skip
        (deepspeed_training.py:542-634)."""
        cfg = self.config
        rng, step_key = jax.random.split(state["rng"])

        def micro(i, acc):
            gsum, lsum = acc
            key = jax.random.fold_in(step_key, i)
            mb = jax.tree.map(
                lambda x: x[i] if (hasattr(x, "ndim") and x.ndim > 0 and
                                   x.shape[0] == cfg.grad_accum) else x,
                batch,
            ) if cfg.grad_accum > 1 else batch
            loss, grads = jax.value_and_grad(self.loss_fn)(state["params"], key, mb)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            return gsum, lsum + loss

        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                             state["params"])
        if cfg.grad_accum > 1:
            grads, loss = jax.lax.fori_loop(0, cfg.grad_accum, micro, (zeros, 0.0))
        else:
            grads, loss = micro(0, (zeros, 0.0))
        grads = jax.tree.map(lambda g: g / cfg.grad_accum, grads)
        loss = loss / cfg.grad_accum

        finite = jnp.isfinite(loss)
        gfinite = jax.tree.reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)), grads, finite)
        ok = gfinite if cfg.skip_nan else jnp.asarray(True)

        updates, new_opt = self.tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)

        # skip the whole update on NaN/Inf (:589-591)
        params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_params, state["params"])
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_opt, state["opt_state"])

        return {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "rng": rng,
            "skipped": state["skipped"] + jnp.where(ok, 0, 1),
        }, {"loss": loss, "ok": ok, "grad_norm": optax.global_norm(grads)}

    # ------------------------------------------------------------------
    def fit(self, data_iter: Iterator[Dict[str, Any]],
            eval_data_iter: Optional[Iterator] = None,
            eval_loss_fn: Optional[Callable] = None):
        cfg = self.config
        start = int(self.state["step"])
        losses = []
        t_last = time.perf_counter()
        for it in range(start, cfg.train_iters):
            self.timers("data loader").start()
            batch = next(data_iter)
            self.timers("data loader").stop()
            self.timers("train_step").start()
            self.state, metrics = self._jit_step(self.state, batch)
            self.timers("train_step").stop()
            losses.append(metrics["loss"])

            step = it + 1
            if step % cfg.log_interval == 0:
                lvals = np.asarray(jax.device_get(jnp.stack(losses)))
                elapsed = time.perf_counter() - t_last
                lr = float(self.schedule(step))
                print_rank0(
                    f"iter {step}/{cfg.train_iters} | loss {lvals.mean():.4f} | "
                    f"lr {lr:.3e} | grad_norm {float(metrics['grad_norm']):.3f} | "
                    f"{cfg.log_interval / elapsed:.2f} it/s | "
                    f"skipped {int(self.state['skipped'])}"
                )
                self._log_metrics({
                    "iter": step, "loss": float(lvals.mean()), "lr": lr,
                    "grad_norm": float(metrics["grad_norm"]),
                    "it_per_s": cfg.log_interval / elapsed,
                    "skipped": int(self.state["skipped"]),
                })
                losses, t_last = [], time.perf_counter()
            if cfg.save_dir and step % cfg.save_interval == 0:
                self.save(step)
            if (eval_data_iter is not None and eval_loss_fn is not None
                    and step % cfg.eval_interval == 0):
                self.evaluate(eval_data_iter, eval_loss_fn)
            if (cfg.check_param_sync_interval
                    and step % cfg.check_param_sync_interval == 0):
                from scail_tpu.training.sync import check_param_sync

                drift = check_param_sync(self.state["params"])
                print_rank0(f"param sync check at iter {step}: max drift {drift}")
            if cfg.exit_interval and step % cfg.exit_interval == 0:
                print_rank0(f"exit-interval hit at iter {step}; clean exit")
                break
        if cfg.save_dir:
            self.save(int(self.state["step"]))
        if getattr(self, "_ckpt_mgr", None) is not None:
            self._ckpt_mgr.wait()
        return self.state

    def evaluate(self, data_iter, eval_loss_fn):
        """(deepspeed_training.py:659-744)"""
        vals = []
        for _ in range(self.config.eval_iters):
            batch = next(data_iter)
            key = jax.random.fold_in(self.state["rng"], len(vals) + 977)
            vals.append(float(eval_loss_fn(self.state["params"], key, batch)))
        loss = float(np.mean(vals))
        print_rank0(f"eval loss {loss:.4f}")
        return loss

    # ------------------------------------------------------------------
    def _ema_state(self):
        """Locate the EmaAdamState anywhere in the optimizer-state tree
        (optax.chain nests it in a tuple; multi_transform under
        train_mask wraps it further)."""
        from scail_tpu.training.ema_adam import EmaAdamState

        found = []

        def walk(node):
            if isinstance(node, EmaAdamState):
                found.append(node)
            elif isinstance(node, (tuple, list)):
                for c in node:
                    walk(c)
            elif isinstance(node, dict):
                for c in node.values():
                    walk(c)
            elif hasattr(node, "_fields"):  # other NamedTuple states
                for f in node._fields:
                    walk(getattr(node, f))

        walk(self.state["opt_state"])
        return found[0] if found else None

    def save(self, iteration: int):
        ema = self._ema_state()
        if ema is not None:
            ema_params, _ = swap_in_ema(self.state["params"], ema)
        else:
            # selective finetunes freeze the shadow of frozen leaves out
            # of the state; fall back to the live params
            ema_params = self.state["params"]
        if getattr(self, "_ckpt_mgr", None) is None:
            from scail_tpu.training.checkpoint import CheckpointManager

            self._ckpt_mgr = CheckpointManager(
                self.config.save_dir,
                keep_last=self.config.keep_last_checkpoints,
                keep_every=self.config.keep_every_checkpoints,
                async_save=self.config.async_save)
        self._ckpt_mgr.save(iteration, self.state,
                            model_config=self.model_config,
                            ema_params=ema_params)
        print_rank0(f"saved checkpoint iter {iteration} -> {self.config.save_dir}"
                    + (" (async)" if self.config.async_save else ""))

    def resume(self, save_dir: Optional[str] = None):
        """(deepspeed_training.py:98-123): continue from `latest`."""
        if getattr(self, "_ckpt_mgr", None) is not None:
            self._ckpt_mgr.wait()
        d = save_dir or self.config.save_dir
        if d is None or read_latest(d) is None:
            print_rank0("no checkpoint to resume from; starting fresh")
            return 0
        self.state, it = load_checkpoint(d, self.state)
        print_rank0(f"resumed from iter {it}")
        return it
