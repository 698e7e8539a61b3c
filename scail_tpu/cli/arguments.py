"""CLI argument handling (reference: arguments.py:24-368).

`--base a.yaml b.yaml` YAMLs are merged; their `args:` block populates the
runtime namespace and `model:` becomes the model graph.  The reference's
torch.distributed/mpu bring-up (arguments.py:241-339) is replaced by mesh
construction from `--mesh-seq/--mesh-model`.
"""

from __future__ import annotations

import argparse
import os
from types import SimpleNamespace

from scail_tpu.utils.config import load_configs, split_reference_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("scail_tpu", add_help=True)
    p.add_argument("--base", nargs="*", default=[],
                   help="YAML config paths, merged left-to-right")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--input-type", dest="input_type", default=None,
                   choices=[None, "cli", "txt"])
    p.add_argument("--input-file", dest="input_file", default=None)
    p.add_argument("--output-dir", dest="output_dir", default=None)
    p.add_argument("--load", default=None, help="checkpoint dir (SAT layout)")
    p.add_argument("--mesh-seq", type=int, default=1)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--sampling-num-frames", type=int, default=None,
                   help="cap the number of pose/video frames used")
    p.add_argument("--sampling-steps", type=int, default=None,
                   help="override the sampler's num_steps (smoke runs)")
    p.add_argument("--image-size", type=int, nargs=2, default=None,
                   metavar=("H", "W"), help="override sampling_image_size")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                   help="force a jax platform (cpu = smoke runs on boxes "
                        "whose accelerator cannot fit the model)")
    p.add_argument("--attn-impl", dest="attn_impl", default=None,
                   choices=[None, "auto", "xla", "chunked", "pallas",
                            "pallas_int8", "ulysses", "sta"],
                   help="override the DiT self-attention impl from the "
                        "YAML ('sta' = sliding-tile turbo sampling)")
    return p


def get_args(argv=None):
    """Returns (runtime_args: SimpleNamespace, model_config: dict)."""
    cli = build_parser().parse_args(argv)
    if cli.platform:
        # must land before the first backend touch; the image's
        # sitecustomize pins JAX_PLATFORMS, so set the config too
        import jax

        os.environ["JAX_PLATFORMS"] = cli.platform
        jax.config.update("jax_platforms", cli.platform)
    cfg = load_configs(cli.base)
    run_cfg, model_cfg = split_reference_config(cfg)

    args = SimpleNamespace(**{
        "mode": "inference",
        "batch_size": 1,
        "input_type": "cli",
        "input_file": None,
        "sampling_image_size": [512, 896],
        "vae_compress_size": [4, 8, 8],
        "bf16": True,
        "fp16": False,
        "sampling_fps": 16,
        "sequence_parallel_size": 1,
        "image2video": True,
        "use_i2v_clip": True,
        "use_pose": True,
        "representation": "smpl_downsample",
        "output_dir": "samples",
        "load": None,
        "only_save_latents": False,
        "multi_cond_cfg": False,
        "seed": cli.seed,
    })
    for k, v in dict(run_cfg).items():
        setattr(args, k, v)
    # explicit CLI flags override YAML
    for k in ("input_type", "input_file", "output_dir", "load"):
        v = getattr(cli, k)
        if v is not None:
            setattr(args, k, v)
    args.mesh_seq = cli.mesh_seq
    args.mesh_model = cli.mesh_model
    args.seed = cli.seed
    args.sampling_num_frames = cli.sampling_num_frames
    if cli.image_size is not None:
        args.sampling_image_size = list(cli.image_size)
    model_cfg = dict(model_cfg)
    if cli.sampling_steps is not None:
        sc = dict(model_cfg.get("sampler_config", {}))
        sc["params"] = dict(sc.get("params", {}), num_steps=cli.sampling_steps)
        model_cfg["sampler_config"] = sc
    attn_impl = cli.attn_impl
    if attn_impl is None and getattr(args, "load", None):
        # weights-day gate (scripts/validate_weights.py): once the STA
        # quality check passed for THIS checkpoint, turbo sampling
        # becomes the default; --attn-impl always overrides
        marker = os.path.join(str(args.load), "sta_validated.json")
        try:
            if os.path.isfile(marker):
                import json

                if json.load(open(marker)).get("validated"):
                    attn_impl = "sta"
                    print("[scail] sta_validated.json found: defaulting "
                          "to attn_impl='sta' (override with --attn-impl)")
        except (OSError, ValueError):
            pass
    if attn_impl is not None:
        nc = dict(model_cfg.get("network_config", {}))
        nc["params"] = dict(nc.get("params", {}), attn_impl=attn_impl)
        model_cfg["network_config"] = nc
    return args, model_cfg
