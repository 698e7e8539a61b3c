"""AOT compile-check of the 14B TRAINING step on a chipless pod topology.

Companion of scripts/aot_14b_v5e8.py for the training side
(docs/MULTICHIP.md "Training (pods)"): lowers ONE full train step — RF
loss (sigma sampling + denoiser scaling), backward through the remat'd
layer stack, Adafactor update — of the released 14B architecture at the
512p geometry (48,832-token fused sequence) over an explicit TPU
topology, and reports the compiled collective structure and per-chip
memory so the pod-training claim is checked structure, not arithmetic.

No chips are needed (the compiler runs via the local libtpu's AOT path);
the default jax backend is forced to CPU so nothing touches the
exclusive TPU tunnel.

  python scripts/aot_14b_train.py [--topology v5e:4x4] [--mesh 1,4,4] \
      [--remat-policy save_attn_frac] [--save-frac 0.7] [--batch 1]

Prints ONE JSON line: {"ok", "topology", "mesh", "collectives",
"per_device_bytes", "live_bytes", "hbm_budget_bytes", "fits"}.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HBM_V5E = 16 * 1024**3


def main() -> int:
    import argparse

    from scail_tpu.utils.platform import force_platform

    force_platform("cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:4x4")
    ap.add_argument("--mesh", default="1,4,4", metavar="D,S,M")
    ap.add_argument("--remat-policy", default="save_attn_frac")
    ap.add_argument("--save-frac", type=float, default=0.7)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--lora", type=int, default=0, metavar="RANK",
                    help="LoRA finetune step instead of full FT: inject "
                         "rank-R adapters, stop_gradient the base weights "
                         "(their grads become symbolic zeros XLA never "
                         "materializes) — the reference's finetune path "
                         "(sat/model/finetune/lora2.py)")
    ap.add_argument("--shard-activations", action="store_true",
                    help="shard inter-layer hidden states (remat carries) "
                         "over the model axis — required for full-FT pod "
                         "fits (the 40-layer carry stack is 9.3 GB at "
                         "seq=2 otherwise)")
    ap.add_argument("--attn-impl", default="ulysses",
                    help="'ulysses' needs heads %% (seq*model) == 0 (40 "
                         "heads forbid seq=4 x model=4); 'pallas' uses the "
                         "row-wise shard_map path (q rows over seq, heads "
                         "over model, kv gathered) with no head constraint")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import yaml
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from scail_tpu.diffusion.denoiser import Denoiser
    from scail_tpu.diffusion.loss import RFLoss
    from scail_tpu.models.dit import (DiTConfig, dit_forward, dit_param_rules,
                                      init_dit_params, split_layer_params)
    from scail_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS
    from scail_tpu.parallel.sharding import specs_for_tree

    md, ms, mm = (int(x) for x in args.mesh.split(","))
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=args.topology)
    assert len(topo.devices) == md * ms * mm, (
        f"mesh {args.mesh} != {len(topo.devices)} devices of {args.topology}")
    mesh = Mesh(np.array(topo.devices).reshape(md, ms, mm),
                (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))

    with open("configs/video_model/scail_14b.yaml") as f:
        mc = yaml.safe_load(f)["model"]
    cfg = DiTConfig.from_network_config(
        mc["network_config"]["params"], attn_impl=args.attn_impl,
        dtype="bfloat16", remat=True, remat_policy=args.remat_policy,
        remat_save_frac=args.save_frac,
        shard_activations=args.shard_activations)

    b, T, H, W = args.batch * md, (args.frames - 1) // 4 + 1, 64, 112
    s_txt, s_clip = 512, 257

    def init_all(key):
        params = init_dit_params(key, cfg)
        params = jax.tree.map(lambda p: p.astype(cfg.compute_dtype), params)
        if cfg.remat_policy == "save_attn_frac":
            params = split_layer_params(params, cfg)
        if args.lora:
            from scail_tpu.training.lora import add_lora

            params = add_lora(params, key, rank=args.lora)
        return params

    params_struct = jax.eval_shape(init_all, jax.random.PRNGKey(0))
    freeze_mask = None
    if args.lora:
        from scail_tpu.training.lora import lora_mask

        freeze_mask = lora_mask(params_struct)  # True on trainable leaves
    rules = dit_param_rules()
    param_shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs_for_tree(params_struct, rules))

    tx = optax.adafactor(1e-4)
    opt_struct = jax.eval_shape(tx.init, params_struct)

    def opt_spec_of(leaf):
        # Adafactor state is REPLICATED here: its factored row/col sums
        # are ~(a+b)/(a*b) of the param sizes (tens of MB total at 14B),
        # so sharding them buys nothing; the memory fits reported below
        # include this replication.  (A ZeRO layout would spec each leaf
        # like its param — worthwhile only for unfactored optimizers.)
        return NamedSharding(mesh, P())

    opt_shardings = jax.tree.map(opt_spec_of, opt_struct)

    loss_obj = RFLoss(
        schedule_shift=True,
        sigma_sampler_config={
            "target": "sgm.modules.diffusionmodules.sigma_sampling.RFSampling",
            "params": {"p_mean": 0.0, "p_std": 1.0}})
    denoiser = Denoiser(
        weighting_config={
            "target": "sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting"},
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.RFScaling"})

    def train_step(params, opt_state, key, latents, cond):
        def loss_of(p):
            if freeze_mask is not None:
                # frozen-base grads become symbolic zeros; XLA DCEs their
                # backward compute and never materializes 7 GB of zeros
                p = jax.tree.map(
                    lambda x, m: x if m else jax.lax.stop_gradient(x),
                    p, freeze_mask)

            def net(x, c_noise, c, **kw):
                return dit_forward(
                    p, cfg, x, c_noise, c["crossattn"],
                    ref_concat=c["ref_concat"],
                    concat_smpl_render=c["concat_smpl_render"],
                    image_clip_features=c["image_clip_features"], mesh=mesh)

            return jnp.mean(loss_obj(key, net, denoiser, cond, latents))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    f32, bf16 = jnp.float32, jnp.bfloat16
    lat_struct = jax.ShapeDtypeStruct((b, T, 16, H, W), f32)
    cond_struct = dict(
        crossattn=jax.ShapeDtypeStruct((b, s_txt, cfg.text_dim), bf16),
        ref_concat=jax.ShapeDtypeStruct((b, 1, 16, H, W), bf16),
        concat_smpl_render=jax.ShapeDtypeStruct(
            (b, T, 16, H // 2, W // 2), bf16),
        image_clip_features=jax.ShapeDtypeStruct((b, s_clip, cfg.clip_dim),
                                                 bf16),
    )
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    in_shardings = (
        param_shardings, opt_shardings, NamedSharding(mesh, P()),
        batch_sh, jax.tree.map(lambda _: batch_sh, cond_struct),
    )
    lowered = jax.jit(
        train_step, in_shardings=in_shardings, donate_argnums=(0, 1),
    ).lower(params_struct, opt_struct, jax.ShapeDtypeStruct((2,), jnp.uint32),
            lat_struct, cond_struct)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    counts = {op: hlo.count(f" {op}") for op in
              ("all-to-all", "all-reduce", "all-gather", "reduce-scatter",
               "collective-permute")}
    ma = compiled.memory_analysis()
    per_dev = dict(
        argument=int(ma.argument_size_in_bytes),
        output=int(ma.output_size_in_bytes),
        temp=int(ma.temp_size_in_bytes),
        alias=int(getattr(ma, "alias_size_in_bytes", 0)),
    )
    live = (per_dev["argument"] + per_dev["output"] + per_dev["temp"]
            - per_dev["alias"])
    print(json.dumps({
        "ok": True,
        "topology": args.topology,
        "mesh": {"data": md, "seq": ms, "model": mm},
        "remat_policy": args.remat_policy,
        "attn_impl": args.attn_impl,
        "shard_activations": args.shard_activations,
        "collectives": counts,
        "per_device_bytes": per_dev,
        "live_bytes": int(live),
        "hbm_budget_bytes": HBM_V5E,
        "fits": bool(live < HBM_V5E),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
