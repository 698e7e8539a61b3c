"""CLI argument handling (reference: arguments.py:24-368).

`--base a.yaml b.yaml` YAMLs are merged; their `args:` block populates the
runtime namespace and `model:` becomes the model graph.  The reference's
torch.distributed/mpu bring-up (arguments.py:241-339) is replaced by mesh
construction from `--mesh-seq/--mesh-model`.
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--sampling-num-frames", type=int, default=None)
    return p


def get_args(argv=None):
    """Returns (runtime_args: SimpleNamespace, model_config: dict)."""
    cli = build_parser().parse_args(argv)
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
    return args, dict(model_cfg)
