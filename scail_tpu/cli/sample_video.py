"""Pose-conditioned sampling CLI (reference: sample_video.py:219-529).

Contract preserved:
  input lines "<prompt>@@<example_dir>" where the dir holds a reference
  image (ref.jpg/ref.png/...) and a rendered pose video
  (rendered_aligned.mp4/rendered.mp4); outputs land in
  <output_dir>/<case>/<case>_output_000000.mp4.

Usage:
  python -m scail_tpu.cli.sample_video \
      --base configs/video_model/scail_14b.yaml configs/sampling/pose_cli.yaml \
      --input-type txt --input-file prompts.txt
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.cli.arguments import get_args
from scail_tpu.data.video import (
    find_file_with_patterns,
    frames_to_tchw_normalized,
    load_image_chw_normalized,
    load_video_frames,
    resize_for_rectangle_crop,
    save_multi_video_grid_and_mp4,
    smpl_downsample,
)
from scail_tpu.engine import VideoDiffusionEngine
from scail_tpu.utils.logging import print_rank0

REF_IMAGE_PATTERNS = ["ref.jpg", "ref.png", "ref_image.jpg", "ref_image.png"]
# mp4 first (reference contract, sample_video.py:296); codec-less fallbacks after
POSE_PATTERNS = ["rendered_aligned.mp4", "rendered.mp4", "rendered_aligned.gif",
                 "rendered.gif", "rendered.npz", "rendered.npy", "rendered"]


def read_from_cli():
    """(sample_video.py:72-80)"""
    cnt = 0
    try:
        while True:
            x = input(
                "Please input in format like <prompt>@@<example_dir> (Ctrl-D quit): "
            )
            yield x.strip(), cnt
            cnt += 1
    except EOFError:
        pass


def read_from_file(path, rank=0, world_size=1):
    """(sample_video.py:82-89)"""
    with open(path) as fin:
        for cnt, line in enumerate(fin):
            if cnt % world_size != rank:
                continue
            yield line.strip(), cnt


def prepare_case(engine, args, text: str):
    """Conditioning prep for one request (sample_video.py:283-467)."""
    assert args.use_pose, "this CLI is the pose-conditioned path"
    prompt, input_dir = text.split("@@")
    if prompt == "None":
        prompt = ""

    image_path = find_file_with_patterns(input_dir, REF_IMAGE_PATTERNS)
    pose_path = find_file_with_patterns(input_dir, POSE_PATTERNS)
    if image_path is None:
        raise FileNotFoundError(f"reference image not found in {input_dir}")
    if pose_path is None:
        raise FileNotFoundError(
            f"pose video not found in {input_dir} (run SCAIL-Pose first)")

    gt_path = find_file_with_patterns(input_dir, ["GT.mp4", "GT.gif", "GT.npz"])
    gt = None
    if gt_path:
        frames, _ = load_video_frames(gt_path)
        gt = frames_to_tchw_normalized(frames)

    image = load_image_chw_normalized(image_path)  # (1, 3, H, W)
    if image.shape[2] < image.shape[3]:
        target_h, target_w = args.sampling_image_size
    else:
        target_w, target_h = args.sampling_image_size

    pose_frames, driving_fps = load_video_frames(pose_path)
    pose_video = frames_to_tchw_normalized(pose_frames)
    cap = getattr(args, "sampling_num_frames", None)
    if cap:
        pose_video = pose_video[:cap]
    pose_video = np.asarray(
        resize_for_rectangle_crop(pose_video, [target_h, target_w], "center"))
    image = np.asarray(
        resize_for_rectangle_crop(image, [target_h, target_w], "center"))
    if gt is not None:
        gt = np.asarray(resize_for_rectangle_crop(gt, [target_h, target_w], "center"))

    smpl_render = pose_video
    if "smpl_downsample" in args.representation:
        smpl_render = np.asarray(smpl_downsample(pose_video))

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    T_in = pose_video.shape[0]
    ori_image = jnp.asarray(image, dtype)[None]          # (1, 1, 3, H, W)

    # VAE conditioning encodes (sample_video.py:355-391)
    img_seq = jnp.concatenate(
        [ori_image, jnp.zeros((1, T_in - 1, 3, target_h, target_w), dtype)], axis=1)
    concat_images = engine.encode_first_stage(img_seq, force_encode=True)
    ref_concat = engine.encode_first_stage(ori_image, force_encode=True, streamed=False)
    smpl_latent = engine.encode_first_stage(
        jnp.asarray(smpl_render, dtype)[None], force_encode=True)

    clip_features = None
    if engine.use_i2v_clip:
        clip_features = engine.i2v_clip.visual(
            jnp.transpose(ori_image, (0, 2, 1, 3, 4)))

    # text conditioning (sample_video.py:418-438)
    c, uc = engine.conditioner.get_unconditional_conditioning(
        {"txt": [prompt]}, batch_uc={"txt": [""]})

    for d in (c, uc):
        d["concat_images"] = concat_images
        d["ref_concat"] = ref_concat
        d["concat_pose"] = smpl_latent
        d["concat_smpl_render"] = smpl_latent
        if clip_features is not None:
            d["image_clip_features"] = clip_features

    shape = (smpl_latent.shape[1], 16, target_h // 8, target_w // 8)
    meta = dict(prompt=prompt, input_dir=input_dir, driving_fps=driving_fps,
                gt=gt, smpl_render=smpl_render,
                image_to_save=np.repeat(image[None], T_in, axis=1))
    return c, uc, shape, meta


def sampling_main(args, model_config):
    engine = VideoDiffusionEngine(model_config, args)
    if getattr(args, "load", None) and os.path.isdir(str(args.load)):
        engine.load_checkpoint(str(args.load))
    else:
        print_rank0(
            f"checkpoint dir {getattr(args, 'load', None)} not found -- "
            "using random init (smoke mode)", "warning")
        engine.init_params(jax.random.PRNGKey(args.seed))

    if args.input_type == "cli":
        # reference asserts dp==1 in cli mode (sample_video.py:229)
        data_iter = read_from_cli()
    elif args.input_type == "txt":
        # batch mode shards prompt lines over data-parallel processes
        # (sample_video.py:231-233)
        data_iter = read_from_file(args.input_file,
                                   rank=jax.process_index(),
                                   world_size=jax.process_count())
    else:
        raise NotImplementedError(args.input_type)

    # Jitted sampling with params as jit ARGUMENTS (engine.py:215-217): the
    # weights stay device-resident jit inputs instead of multi-GB captured
    # constants; per-(shape, tiling) compilations are cached across cases
    # and across runs via the persistent compilation cache.
    import functools

    @functools.partial(jax.jit, static_argnames=("shape", "tile_indices"))
    def jit_sample(params, key, c, uc, *, shape, tile_indices=None):
        kw = {}
        if tile_indices is not None:
            kw["tile_indices"] = [list(t) for t in tile_indices]
        return engine.sample(key, c, uc=uc, batch_size=1, shape=shape,
                             params=params, **kw)

    for text, cnt in data_iter:
        print_rank0(f"{cnt}: {text}")
        c, uc, shape, meta = prepare_case(engine, args, text)

        case = os.path.basename(meta["input_dir"].rstrip("/"))
        save_dir = os.path.join(args.output_dir, case)
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "text.txt"), "w") as f:
            f.write(meta["prompt"])

        key = jax.random.PRNGKey(args.seed + cnt)
        tile_indices = None
        from scail_tpu.diffusion.samplers import RFSamplerLong, make_tile_indices

        if isinstance(engine.sampler, RFSamplerLong):
            # temporal tiling for long clips (sampling.py:986-1084): tiles of
            # `long_tile` latent frames, per-tile pose conditioning
            tile = int(getattr(args, "long_tile", 21))
            overlap = int(getattr(args, "long_overlap", 8))
            tiles = make_tile_indices(shape[0], tile, overlap)
            smpl = c["concat_smpl_render"]
            smpl_tiled = jnp.stack([smpl[:, jnp.asarray(t)] for t in tiles], axis=1)
            c["smpl_tiled"] = smpl_tiled
            uc["smpl_tiled"] = smpl_tiled
            tile_indices = tuple(tuple(t) for t in tiles)
        samples_z = jit_sample(engine.params["dit"], key, c, uc,
                               shape=tuple(shape), tile_indices=tile_indices)
        samples_x = engine.decode_first_stage(samples_z)
        samples = np.clip((np.asarray(samples_x) + 1.0) / 2.0, 0.0, 1.0)

        save_multi_video_grid_and_mp4(
            [samples], save_dir, fps=meta["driving_fps"], key=f"{case}_output")
        if meta["gt"] is not None:
            from scail_tpu.ops.resize import resize_bilinear

            gt_h, gt_w = meta["gt"].shape[-2:]
            up = np.asarray(resize_bilinear(
                jnp.asarray(meta["smpl_render"]), gt_h, gt_w))
            save_list = [
                np.clip((up[None] + 1) / 2, 0, 1),
                np.clip((np.asarray(meta["image_to_save"]) + 1) / 2, 0, 1),
                np.clip((meta["gt"][None] + 1) / 2, 0, 1),
                samples,
            ]
            # smoke overrides (--image-size / --sampling-num-frames) can
            # shrink the sampled clip below the GT geometry; align every
            # panel to the samples' (t, h, w) so the grid still stacks
            t_min = min(e.shape[1] for e in save_list)
            h_s, w_s = samples.shape[-2:]
            save_list = [
                e[:, :t_min] if e.shape[-2:] == (h_s, w_s)
                else np.asarray(resize_bilinear(
                    jnp.asarray(e[:, :t_min].reshape(-1, *e.shape[2:])),
                    h_s, w_s)).reshape(e.shape[0], t_min, e.shape[2], h_s, w_s)
                for e in save_list
            ]
            save_multi_video_grid_and_mp4(
                save_list, save_dir, fps=meta["driving_fps"], key=f"{case}_concat")
        print_rank0(f"saved {save_dir}")


def main(argv=None):
    from scail_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args, model_config = get_args(argv)
    sampling_main(args, model_config)


if __name__ == "__main__":
    main(sys.argv[1:])
