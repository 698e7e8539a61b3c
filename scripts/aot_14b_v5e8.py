"""AOT compile-check of the REAL 14B geometry on a v5e-8 TPU topology.

Lowers one denoiser forward of the full 14B DiT (configs/video_model/
scail_14b.yaml; 48,832-token fused sequence = 37,632 video + 1,792 ref +
9,408 pose at latent 21x64x112, CFG batch 2, bf16) over the production
inference mesh (data=1, seq=2, model=4) with attn_impl='ulysses', against
a REAL v5e:2x4 PJRT topology description — no chips needed, the compiler
alone validates the layout (VERDICT r2 weak #4: turn docs/MULTICHIP.md
from projection into checked structure).

Prints ONE JSON line:
  {"ok": true, "collectives": {...}, "per_device_bytes": {...},
   "hbm_budget_bytes": ..., "fits": true}

Run directly (needs the TPU plugin importable, not the chips):
  python scripts/aot_14b_v5e8.py
Consumed by tests/test_aot_14b.py via subprocess.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


HBM_V5E = 16 * 1024**3  # bytes per v5e chip


def main() -> int:
    # the DEFAULT backend must stay off the (exclusive, sometimes down)
    # TPU tunnel: eval_shape/PRNG touch it, while the 14B compile itself
    # goes through the explicit chipless v5e topology description below
    import argparse

    from scail_tpu.utils.platform import force_platform

    force_platform("cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4",
                    help="PJRT topology name (v5e:2x4 = the 8-chip "
                         "serving pod; v5e:4x4 = the 16-chip long-video "
                         "config, BASELINE #5)")
    ap.add_argument("--mesh", default="1,2,4", metavar="D,S,M",
                    help="data,seq,model mesh over the topology devices")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import yaml
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from scail_tpu.models.dit import DiTConfig, dit_forward, init_dit_params
    from scail_tpu.models.dit import dit_param_rules
    from scail_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS
    from scail_tpu.parallel.sharding import specs_for_tree

    md, ms, mm = (int(x) for x in args.mesh.split(","))
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=args.topology)
    assert len(topo.devices) == md * ms * mm, (
        f"mesh {args.mesh} != {len(topo.devices)} devices of {args.topology}")
    devs = np.array(topo.devices).reshape(md, ms, mm)
    mesh = Mesh(devs, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))

    with open("configs/video_model/scail_14b.yaml") as f:
        mc = yaml.safe_load(f)["model"]
    cfg = DiTConfig.from_network_config(
        mc["network_config"]["params"], attn_impl="ulysses", dtype="bfloat16")

    # the BASELINE workload geometry (SURVEY.md:267): latent 21x64x112,
    # pose stream at half spatial resolution, CFG batch 2
    b, T, H, W = 2, 21, 64, 112
    f32 = jnp.float32
    arg_structs = dict(
        x=jax.ShapeDtypeStruct((b, T, 16, H, W), jnp.bfloat16),
        timesteps=jax.ShapeDtypeStruct((b,), f32),
        context=jax.ShapeDtypeStruct((b, 512, cfg.text_dim), jnp.bfloat16),
        ref_concat=jax.ShapeDtypeStruct((b, 1, 16, H, W), jnp.bfloat16),
        concat_smpl_render=jax.ShapeDtypeStruct(
            (b, T, 16, H // 2, W // 2), jnp.bfloat16),
        image_clip_features=jax.ShapeDtypeStruct(
            (b, 257, cfg.clip_dim), jnp.bfloat16),
    )

    params_struct = jax.eval_shape(
        lambda k: init_dit_params(k, cfg), jax.random.PRNGKey(0))
    # params persist in bf16 on-device for serving (the converter's output
    # dtype); eval_shape of the f32 initializer is re-cast here
    params_struct = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), params_struct)
    rules = dit_param_rules()
    param_shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs_for_tree(params_struct, rules))

    lat_sh = NamedSharding(mesh, P(DATA_AXIS, None, None, None, SEQ_AXIS))
    rep_sh = NamedSharding(mesh, P(DATA_AXIS))
    in_shardings = (
        param_shardings,
        dict(x=lat_sh, timesteps=NamedSharding(mesh, P()), context=rep_sh,
             ref_concat=lat_sh, concat_smpl_render=rep_sh,
             image_clip_features=rep_sh),
    )

    def fwd(params, inp):
        return dit_forward(
            params, cfg, inp["x"], inp["timesteps"], inp["context"],
            ref_concat=inp["ref_concat"],
            concat_smpl_render=inp["concat_smpl_render"],
            image_clip_features=inp["image_clip_features"], mesh=mesh)

    lowered = jax.jit(fwd, in_shardings=in_shardings).lower(
        params_struct, arg_structs)
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
    live = per_dev["argument"] + per_dev["output"] + per_dev["temp"] \
        - per_dev["alias"]
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(params_struct))
    report = {
        "ok": True,
        "topology": args.topology,
        "mesh": {"data": md, "seq": ms, "model": mm},
        "n_params": n_params,
        "collectives": counts,
        "per_device_bytes": per_dev,
        "live_bytes": int(live),
        "hbm_budget_bytes": HBM_V5E,
        "fits": bool(live < HBM_V5E),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
