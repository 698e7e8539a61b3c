"""Training CLI (reference: sat/training/deepspeed_training.py training_main
as invoked by SAT finetune scripts).

Builds the engine from the same YAML graphs as sampling, a VideoPoseDataset
over a directory of example dirs, and runs the Trainer with the RFLoss
raw-pixel shared_step.

Usage:
  python -m scail_tpu.cli.train \
      --base configs/video_model/scail_1p3b.yaml configs/training/default.yaml \
      --data-root /path/to/examples --save ckpts/run1
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.utils.config import load_configs, split_reference_config
from scail_tpu.utils.logging import print_rank0


def build_argparser():
    p = argparse.ArgumentParser("scail_tpu.train")
    p.add_argument("--base", nargs="*", default=[])
    p.add_argument("--data-root", required=True)
    p.add_argument("--save", default=None)
    p.add_argument("--load", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--train-iters", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-iters", type=int, default=100)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--image-size", type=int, nargs=2, default=[256, 448])
    p.add_argument("--num-frames", type=int, default=9)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--lora-rank", type=int, default=0,
                   help=">0 enables LoRA finetuning of the DiT")
    p.add_argument("--mesh-seq", type=int, default=1)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--shard-activations", action="store_true",
                   help="shard inter-layer hidden states (remat carries) "
                        "over the model axis — required for the 14B "
                        "full-FT pod fit (docs/MULTICHIP.md, "
                        "scripts/aot_14b_train.py)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed init from env "
                        "(COORDINATOR_ADDRESS / WORLD_SIZE / RANK), each "
                        "host loads its own data shard")
    return p


def main(argv=None):
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_argparser().parse_args(argv)
    if args.distributed:
        from scail_tpu.parallel.distributed import initialize_distributed

        initialize_distributed()
    cfg = load_configs(args.base)
    _, model_cfg = split_reference_config(cfg)
    if args.shard_activations:
        model_cfg = dict(model_cfg)
        nc = dict(model_cfg.get("network_config", {}))
        nc["params"] = dict(nc.get("params", {}), shard_activations=True)
        model_cfg["network_config"] = nc

    from scail_tpu.data.datasets import VideoPoseDataset, make_loaders
    from scail_tpu.engine import VideoDiffusionEngine
    from scail_tpu.training.engine import TrainConfig, Trainer

    engine = VideoDiffusionEngine(dict(model_cfg))
    key = jax.random.PRNGKey(args.seed)
    if args.load:
        engine.load_checkpoint(args.load)
        # VAE/encoders come from their own checkpoint paths in the YAML
        engine.init_params(key) if "dit" not in engine.params else None
    else:
        engine.init_params(key)

    mesh = None
    if args.mesh_seq * args.mesh_model > 1 or jax.device_count() > 1:
        from scail_tpu.parallel.mesh import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec.infer(jax.device_count(),
                                        seq=args.mesh_seq, model=args.mesh_model))
        engine.shard_params(mesh)

    params = engine.params["dit"]
    if args.lora_rank > 0:
        from scail_tpu.training.lora import add_lora

        params = add_lora(params, jax.random.PRNGKey(args.seed + 1),
                          rank=args.lora_rank)
        print_rank0(f"LoRA finetuning enabled (rank {args.lora_rank})")

    dcfg = engine.network.config
    if getattr(dcfg, "remat", False) and \
            getattr(dcfg, "remat_policy", "") == "save_attn_frac":
        # pre-split the layer stack outside jit; in-graph slicing would
        # keep head/tail copies live next to the stacked originals
        # (+2x layer params HBM).  Checkpoints store the split layout;
        # unsplit_layer_params restores the stacked one for export.
        from scail_tpu.models.dit import save_attn_head_layers, split_layer_params

        params = split_layer_params(params, dcfg)
        # drop the engine's reference to the stacked stack, or both
        # layouts stay live in HBM through optimizer-state init
        engine.params["dit"] = params
        print_rank0("save_attn_frac remat: layer stack pre-split "
                    f"({save_attn_head_layers(dcfg)} head layers)")

    # the freeze mask must mirror the FINAL param tree (after any
    # save_attn_frac split), or multi_transform's label tree mismatches
    lora_mask_tree = None
    if args.lora_rank > 0:
        from scail_tpu.training.lora import lora_mask

        lora_mask_tree = lora_mask(params)

    def loss_fn(dit_params, key, batch):
        engine.params["dit"] = dit_params
        loss, _ = engine.shared_step(key, batch)
        return loss

    tconf = TrainConfig(
        train_iters=args.train_iters, lr=args.lr, warmup_iters=args.warmup_iters,
        grad_accum=args.grad_accum, save_dir=args.save, seed=args.seed,
    )
    trainer = Trainer(params, loss_fn, tconf, model_config=dict(model_cfg),
                      train_mask=lora_mask_tree)
    if args.resume:
        trainer.resume()

    ds = VideoPoseDataset(args.data_root, image_size=tuple(args.image_size),
                          num_frames=args.num_frames)
    print_rank0(f"dataset: {len(ds)} examples from {args.data_root}")
    # per-host data sharding (configure_data.py:168 dp-sharded loaders):
    # each host feeds its own slice; with identical PRNG keys the global
    # batch assembles across hosts through the mesh's data axis.
    # --batch-size is the PER-MICROBATCH size (deepspeed semantics): one
    # Trainer step consumes grad_accum x batch_size examples, reshaped
    # below to a leading (grad_accum, ...) axis the Trainer slices.
    accum = max(1, args.grad_accum)
    per_host = len(ds) // max(1, jax.process_count())
    if per_host < args.batch_size * accum:
        raise SystemExit(
            f"dataset too small: {per_host} examples/host < batch_size x "
            f"grad_accum = {args.batch_size}x{accum}; the sampler would "
            f"yield zero batches per epoch and training would hang in "
            f"next(data_iter)")
    train_loader, _ = make_loaders(ds, args.batch_size * accum,
                                   seed=args.seed,
                                   rank=jax.process_index(),
                                   world_size=jax.process_count(),
                                   start_iter=int(trainer.state["step"]))

    def to_device(batch):
        # text embeds outside jit (tokenization is host work); strings out
        if engine.conditioner is not None and "txt" in batch:
            cond = engine.conditioner({"txt": batch["txt"]})
            batch = dict(batch)
            batch["crossattn"] = cond["crossattn"]
        arrs = {k: v for k, v in batch.items() if not isinstance(v, list)}

        def add_accum(x):
            x = np.asarray(x)
            if accum > 1:
                # (accum*bs, ...) -> (accum, bs, ...); the Trainer's
                # microbatch loop slices axis 0 (engine.py _train_step)
                x = x.reshape((accum, x.shape[0] // accum) + x.shape[1:])
            return x

        arrs = {k: add_accum(v) for k, v in arrs.items()}
        if mesh is not None and jax.process_count() > 1:
            # multi-host: each host's loader yields its dp slice; assemble
            # GLOBAL arrays over the mesh's data axis (the reference's
            # dp-sharded loaders + data-broadcast group, SURVEY section 2.5)
            from jax.sharding import NamedSharding, PartitionSpec as P

            def glob(x):
                # the dp batch dim is axis 1 when the accum axis leads
                axis = 1 if accum > 1 else 0
                spec = [None] * x.ndim
                spec[axis] = "data"
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P(*spec)), x)

            return {k: glob(v) for k, v in arrs.items()}
        return {k: jnp.asarray(v) for k, v in arrs.items()}

    trainer.fit(map(to_device, iter(train_loader)))


if __name__ == "__main__":
    main(sys.argv[1:])
