"""Convert the released SCAIL torch artifacts into a single Orbax bundle.

Reads (any subset that exists):
  <src>/model/<latest>/mp_rank_00_model_states.pt   (DiT, SAT layout)
  <src>/Wan2.1_VAE.pth
  <src>/umt5-xxl/models_t5_umt5-xxl-enc-bf16.pth
  <src>/models_clip_open-clip-xlm-roberta-large-vit-huge-14-onlyvisual.pth

Writes <dst>/{dit,vae,umt5,clip}/ Orbax checkpoints + manifest.json.

Usage: python scripts/convert_checkpoint.py SCAIL-Preview converted/ \
           [--model-yaml configs/video_model/scail_14b.yaml]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--model-yaml", default="configs/video_model/scail_14b.yaml")
    args = ap.parse_args()

    # conversion is pure host work; don't touch (or block on) the
    # exclusive TPU tunnel for it
    from scail_tpu.utils.platform import force_platform

    force_platform("cpu")

    import orbax.checkpoint as ocp

    from scail_tpu.convert.torch_ckpt import (
        dit_params_from_state_dict, load_torch_state_dict, resolve_latest_checkpoint,
    )
    from scail_tpu.models.dit import DiTConfig
    from scail_tpu.utils.config import load_configs

    os.makedirs(args.dst, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    manifest = {}

    dit_dir = os.path.join(args.src, "model")
    if os.path.isdir(dit_dir):
        cfg_yaml = load_configs([args.model_yaml])
        net_params = dict(cfg_yaml["model"]["network_config"]["params"])
        cfg = DiTConfig.from_network_config(net_params, use_i2v_clip=True)
        path = resolve_latest_checkpoint(dit_dir)
        print(f"converting DiT from {path} ...")
        sd = load_torch_state_dict(path)
        params = dit_params_from_state_dict(sd, cfg)
        ckptr.save(os.path.abspath(os.path.join(args.dst, "dit")), params, force=True)
        manifest["dit"] = {"source": path, "config": args.model_yaml}

    vae_path = os.path.join(args.src, "Wan2.1_VAE.pth")
    if os.path.exists(vae_path):
        from scail_tpu.convert.wan_vae_ckpt import load_wan_vae_params

        print(f"converting VAE from {vae_path} ...")
        ckptr.save(os.path.abspath(os.path.join(args.dst, "vae")),
                   load_wan_vae_params(vae_path), force=True)
        manifest["vae"] = {"source": vae_path}

    t5_path = os.path.join(args.src, "umt5-xxl", "models_t5_umt5-xxl-enc-bf16.pth")
    if os.path.exists(t5_path):
        from scail_tpu.models.umt5 import UMT5Config, umt5_params_from_state_dict

        print(f"converting umt5 from {t5_path} ...")
        sd = load_torch_state_dict(t5_path)
        ckptr.save(os.path.abspath(os.path.join(args.dst, "umt5")),
                   umt5_params_from_state_dict(sd, UMT5Config()), force=True)
        manifest["umt5"] = {"source": t5_path}

    clip_path = os.path.join(
        args.src, "models_clip_open-clip-xlm-roberta-large-vit-huge-14-onlyvisual.pth")
    if os.path.exists(clip_path):
        from scail_tpu.models.clip_vit import (ClipVisionConfig,
                                               clip_vision_params_from_state_dict)

        print(f"converting CLIP from {clip_path} ...")
        sd = load_torch_state_dict(clip_path)
        ckptr.save(os.path.abspath(os.path.join(args.dst, "clip")),
                   clip_vision_params_from_state_dict(sd, ClipVisionConfig()),
                   force=True)
        manifest["clip"] = {"source": clip_path}

    ckptr.wait_until_finished()
    with open(os.path.join(args.dst, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"done: {sorted(manifest)} -> {args.dst}")
    if not manifest:
        print("WARNING: no artifacts found under", args.src)


if __name__ == "__main__":
    main()
