"""Inference helpers (reference: sgm/inference/helpers.py).

`do_sample`/`do_img2img` drive an ImageDiffusionEngine through its
conditioner, sampler and first stage.  Differences from the reference
are layout and RNG only: images are channels-last (b, h, w, 3) — the
TPU-native layout this framework uses everywhere — and stochastic steps
take an explicit seed instead of torch's global RNG.  The reference's
invisible-watermark filter needs the `imwatermark` package (absent in
this zero-egress environment); `filter` stays a caller-supplied hook.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.utils.misc import append_dims


def get_unique_embedder_keys_from_conditioner(conditioner) -> List[str]:
    """(helpers.py:61-63)."""
    return list({e.input_key for e in conditioner.embedders})


class Img2ImgDiscretizationWrapper:
    """Strips the sigma ladder to its lowest `strength` fraction
    (helpers.py:77-99): sigmas are flipped to ascending, truncated to
    max(int(strength * len), 1) entries, flipped back."""

    def __init__(self, discretization, strength: float = 1.0):
        self.discretization = discretization
        self.strength = strength
        assert 0.0 <= strength <= 1.0

    def __call__(self, *args, **kwargs):
        sigmas = jnp.asarray(self.discretization(*args, **kwargs))
        sigmas = jnp.flip(sigmas, 0)
        sigmas = sigmas[: max(int(self.strength * len(sigmas)), 1)]
        return jnp.flip(sigmas, 0)


def get_batch(keys, value_dict: Dict, N: Union[List, tuple]):
    """Build the conditioner batch from the demo value dict
    (helpers.py:173-227).  Tensor-valued keys are jnp arrays so the
    ConcatTimestepEmbedderND consumers jit cleanly."""
    n = math.prod(N)
    batch: Dict = {}
    batch_uc: Dict = {}
    for key in keys:
        if key == "txt":
            batch["txt"] = [value_dict["prompt"] or ""] * n
            batch_uc["txt"] = [value_dict["negative_prompt"] or ""] * n
        elif key == "original_size_as_tuple":
            batch[key] = jnp.tile(jnp.asarray(
                [value_dict["orig_height"], value_dict["orig_width"]],
                jnp.float32), (n, 1))
        elif key == "crop_coords_top_left":
            batch[key] = jnp.tile(jnp.asarray(
                [value_dict["crop_coords_top"], value_dict["crop_coords_left"]],
                jnp.float32), (n, 1))
        elif key == "aesthetic_score":
            batch[key] = jnp.tile(jnp.asarray(
                [value_dict["aesthetic_score"]], jnp.float32), (n, 1))
            batch_uc[key] = jnp.tile(jnp.asarray(
                [value_dict["negative_aesthetic_score"]], jnp.float32), (n, 1))
        elif key == "target_size_as_tuple":
            batch[key] = jnp.tile(jnp.asarray(
                [value_dict["target_height"], value_dict["target_width"]],
                jnp.float32), (n, 1))
        else:
            batch[key] = value_dict[key]
    for key in batch:
        if key not in batch_uc and isinstance(batch[key], jnp.ndarray):
            batch_uc[key] = batch[key]
    return batch, batch_uc


def do_sample(model, sampler, value_dict: Dict, num_samples: int,
              H: int, W: int, C: int, F: int,
              force_uc_zero_embeddings: Optional[List] = None,
              batch2model_input: Optional[List] = None,
              return_latents: bool = False, filter=None, seed: int = 42):
    """Text-to-image (helpers.py:101-172).  Returns (b, H, W, 3) floats in
    [0, 1] (channels-last; the reference returns NCHW)."""
    force_uc_zero_embeddings = force_uc_zero_embeddings or []
    batch2model_input = batch2model_input or []

    batch, batch_uc = get_batch(
        get_unique_embedder_keys_from_conditioner(model.conditioner),
        value_dict, [num_samples])
    c, uc = model.conditioner.get_unconditional_conditioning(
        batch, batch_uc=batch_uc,
        force_uc_zero_embeddings=force_uc_zero_embeddings)
    for k in c:
        if k != "crossattn":
            c[k] = c[k][:num_samples]
            uc[k] = uc[k][:num_samples]
    additional_model_inputs = {k: batch[k] for k in batch2model_input}

    key = jax.random.PRNGKey(seed)
    randn = jax.random.normal(key, (num_samples, H // F, W // F, C),
                              jnp.float32)

    net = model.network_fn(model.params["unet"])

    def denoiser(x, sigma, cond, cfg_scale=None, **kw):
        return model.denoiser(net, x, sigma, cond,
                              **additional_model_inputs)

    samples_z = sampler(denoiser, randn, cond=c, uc=uc)
    samples_x = model.decode_first_stage(samples_z)
    samples = jnp.clip((samples_x + 1.0) / 2.0, 0.0, 1.0)
    if filter is not None:
        samples = filter(samples)
    if return_latents:
        return samples, samples_z
    return samples


def do_img2img(img, model, sampler, value_dict: Dict, num_samples: int,
               force_uc_zero_embeddings: Optional[List] = None,
               additional_kwargs: Optional[Dict] = None,
               offset_noise_level: float = 0.0,
               return_latents: bool = False, skip_encode: bool = False,
               filter=None, seed: int = 42):
    """Image-to-image / refiner (helpers.py:243-305).  `img` is
    (b, h, w, 3) in [-1, 1] (or a latent when skip_encode)."""
    force_uc_zero_embeddings = force_uc_zero_embeddings or []

    batch, batch_uc = get_batch(
        get_unique_embedder_keys_from_conditioner(model.conditioner),
        value_dict, [num_samples])
    c, uc = model.conditioner.get_unconditional_conditioning(
        batch, batch_uc=batch_uc,
        force_uc_zero_embeddings=force_uc_zero_embeddings)
    for k in c:
        c[k] = c[k][:num_samples]
        uc[k] = uc[k][:num_samples]
    for k in (additional_kwargs or {}):
        c[k] = uc[k] = additional_kwargs[k]

    key = jax.random.PRNGKey(seed)
    k_enc, k_noise, k_off = jax.random.split(key, 3)
    z = img if skip_encode else model.encode_first_stage(img, key=k_enc)
    noise = jax.random.normal(k_noise, z.shape, z.dtype)
    sigmas = np.asarray(sampler.discretization(sampler.num_steps))
    sigma = float(sigmas[0])
    if offset_noise_level > 0.0:
        noise = noise + offset_noise_level * append_dims(
            jax.random.normal(k_off, (z.shape[0],)), z.ndim)
    noised_z = z + noise * sigma
    # DDPM-style rescale (helpers.py:290-292); the sampler's own
    # sqrt(1+sigma0^2) prologue restores it
    noised_z = noised_z / float(np.sqrt(1.0 + sigma ** 2))

    net = model.network_fn(model.params["unet"])

    def denoiser(x, s, cond, cfg_scale=None, **kw):
        return model.denoiser(net, x, s, cond)

    samples_z = sampler(denoiser, noised_z, cond=c, uc=uc)
    samples_x = model.decode_first_stage(samples_z)
    samples = jnp.clip((samples_x + 1.0) / 2.0, 0.0, 1.0)
    if filter is not None:
        samples = filter(samples)
    if return_latents:
        return samples, samples_z
    return samples


def get_input_image_array(image) -> jnp.ndarray:
    """PIL image -> (1, h, w, 3) float in [-1, 1], snapped to /64
    (helpers.py:230-240)."""
    w, h = image.size
    width, height = (x - x % 64 for x in (w, h))
    image = image.resize((width, height))
    arr = np.asarray(image.convert("RGB"), np.float32)[None]
    return jnp.asarray(arr / 127.5 - 1.0)


def perform_save_locally(save_path, samples) -> None:
    """PNG dump with a running counter (helpers.py:65-75); samples are
    (b, h, w, 3) floats in [0, 1]."""
    from PIL import Image

    os.makedirs(save_path, exist_ok=True)
    base_count = len(os.listdir(save_path))
    for s in np.asarray(samples):
        img = Image.fromarray((255.0 * s).round().astype(np.uint8))
        img.save(os.path.join(save_path, f"{base_count:09}.png"))
        base_count += 1
