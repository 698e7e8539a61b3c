"""SD/SDXL sampling API (reference: sgm/inference/api.py — all 388 lines).

Same public surface: the ModelArchitecture/Sampler/Discretization/Guider
enums, SamplingParams/SamplingSpec, model_specs, the
get_{guider,discretization,sampler}_config builders and SamplingPipeline
with text_to_image / image_to_image / refiner.

A note on fidelity: the reference ships this module with NO
configs/inference YAMLs and crashes on every EDM-ladder sampler it
builds (discretizer.py:18-22 forwards return_idx into get_sigmas
signatures that lack it; api.py's SamplingPipeline would die at
OmegaConf.load).  This port ships working configs
(configs/inference/*.yaml, written for the same registry target names)
and a sampler zoo whose EDM ladder actually runs, so the API is live
rather than aspirational.  Weights remain weight-gated: pass
`model_path` at a directory holding the released safetensors/pt
checkpoints to sample for real; without one the pipeline runs in
random-init smoke mode.
"""

from __future__ import annotations

import pathlib
from dataclasses import asdict, dataclass
from enum import Enum
from typing import Optional

from scail_tpu.inference.helpers import (Img2ImgDiscretizationWrapper,
                                         do_img2img, do_sample)
from scail_tpu.utils.registry import instantiate_from_config


class ModelArchitecture(str, Enum):
    SD_2_1 = "stable-diffusion-v2-1"
    SD_2_1_768 = "stable-diffusion-v2-1-768"
    SDXL_V0_9_BASE = "stable-diffusion-xl-v0-9-base"
    SDXL_V0_9_REFINER = "stable-diffusion-xl-v0-9-refiner"
    SDXL_V1_BASE = "stable-diffusion-xl-v1-base"
    SDXL_V1_REFINER = "stable-diffusion-xl-v1-refiner"


class Sampler(str, Enum):
    EULER_EDM = "EulerEDMSampler"
    HEUN_EDM = "HeunEDMSampler"
    EULER_ANCESTRAL = "EulerAncestralSampler"
    DPMPP2S_ANCESTRAL = "DPMPP2SAncestralSampler"
    DPMPP2M = "DPMPP2MSampler"
    LINEAR_MULTISTEP = "LinearMultistepSampler"


class Discretization(str, Enum):
    LEGACY_DDPM = "LegacyDDPMDiscretization"
    EDM = "EDMDiscretization"


class Guider(str, Enum):
    VANILLA = "VanillaCFG"
    IDENTITY = "IdentityGuider"


class Thresholder(str, Enum):
    NONE = "None"


@dataclass
class SamplingParams:
    width: int = 1024
    height: int = 1024
    steps: int = 50
    sampler: Sampler = Sampler.DPMPP2M
    discretization: Discretization = Discretization.LEGACY_DDPM
    guider: Guider = Guider.VANILLA
    thresholder: Thresholder = Thresholder.NONE
    scale: float = 6.0
    aesthetic_score: float = 5.0
    negative_aesthetic_score: float = 5.0
    img2img_strength: float = 1.0
    orig_width: int = 1024
    orig_height: int = 1024
    crop_coords_top: int = 0
    crop_coords_left: int = 0
    sigma_min: float = 0.0292
    sigma_max: float = 14.6146
    rho: float = 3.0
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = 999.0
    s_noise: float = 1.0
    eta: float = 1.0
    order: int = 4


@dataclass
class SamplingSpec:
    width: int
    height: int
    channels: int
    factor: int
    is_legacy: bool
    config: str
    ckpt: str
    is_guided: bool


model_specs = {
    ModelArchitecture.SD_2_1: SamplingSpec(
        height=512, width=512, channels=4, factor=8, is_legacy=True,
        config="sd_2_1.yaml", ckpt="v2-1_512-ema-pruned.safetensors",
        is_guided=True),
    ModelArchitecture.SD_2_1_768: SamplingSpec(
        height=768, width=768, channels=4, factor=8, is_legacy=True,
        config="sd_2_1_768.yaml", ckpt="v2-1_768-ema-pruned.safetensors",
        is_guided=True),
    ModelArchitecture.SDXL_V0_9_BASE: SamplingSpec(
        height=1024, width=1024, channels=4, factor=8, is_legacy=False,
        config="sd_xl_base.yaml", ckpt="sd_xl_base_0.9.safetensors",
        is_guided=True),
    ModelArchitecture.SDXL_V0_9_REFINER: SamplingSpec(
        height=1024, width=1024, channels=4, factor=8, is_legacy=True,
        config="sd_xl_refiner.yaml", ckpt="sd_xl_refiner_0.9.safetensors",
        is_guided=True),
    ModelArchitecture.SDXL_V1_BASE: SamplingSpec(
        height=1024, width=1024, channels=4, factor=8, is_legacy=False,
        config="sd_xl_base.yaml", ckpt="sd_xl_base_1.0.safetensors",
        is_guided=True),
    ModelArchitecture.SDXL_V1_REFINER: SamplingSpec(
        height=1024, width=1024, channels=4, factor=8, is_legacy=True,
        config="sd_xl_refiner.yaml", ckpt="sd_xl_refiner_1.0.safetensors",
        is_guided=True),
}

_DEFAULT_CONFIG_DIR = str(
    pathlib.Path(__file__).resolve().parents[2] / "configs" / "inference")


class SamplingPipeline:
    def __init__(self, model_id: ModelArchitecture,
                 model_path: str = "checkpoints",
                 config_path: Optional[str] = None,
                 smoke: Optional[bool] = None, seed: int = 0):
        """smoke=None auto-detects: random-init when the spec's checkpoint
        file is absent (api.py:158-186 hard-requires the file)."""
        if model_id not in model_specs:
            raise ValueError(f"Model {model_id} not supported")
        self.model_id = model_id
        self.specs = model_specs[self.model_id]
        config_path = config_path or _DEFAULT_CONFIG_DIR
        self.config = str(pathlib.Path(config_path, self.specs.config))
        self.ckpt = str(pathlib.Path(model_path, self.specs.ckpt))
        self.model = self._load_model(smoke=smoke, seed=seed)

    def _load_model(self, smoke, seed):
        import jax

        from scail_tpu.utils.config import load_configs

        cfg = load_configs([self.config])["model"]
        model = instantiate_from_config(cfg)
        have_ckpt = pathlib.Path(self.ckpt).exists()
        if smoke is None:
            smoke = not have_ckpt
        if smoke:
            model.init_params(jax.random.PRNGKey(seed))
        else:
            model.load_checkpoint(self.ckpt)
        return model

    def text_to_image(self, params: SamplingParams, prompt: str,
                      negative_prompt: str = "", samples: int = 1,
                      return_latents: bool = False, seed: int = 42):
        sampler = get_sampler_config(params)
        value_dict = asdict(params)
        value_dict["prompt"] = prompt
        value_dict["negative_prompt"] = negative_prompt
        value_dict["target_width"] = params.width
        value_dict["target_height"] = params.height
        return do_sample(
            self.model, sampler, value_dict, samples,
            params.height, params.width, self.specs.channels,
            self.specs.factor,
            force_uc_zero_embeddings=(
                ["txt"] if not self.specs.is_legacy else []),
            return_latents=return_latents, filter=None, seed=seed)

    def image_to_image(self, params: SamplingParams, image, prompt: str,
                       negative_prompt: str = "", samples: int = 1,
                       return_latents: bool = False, seed: int = 42):
        sampler = get_sampler_config(params)
        if params.img2img_strength < 1.0:
            sampler.discretization = Img2ImgDiscretizationWrapper(
                sampler.discretization, strength=params.img2img_strength)
        height, width = image.shape[1], image.shape[2]  # (b, h, w, 3)
        value_dict = asdict(params)
        value_dict["prompt"] = prompt
        value_dict["negative_prompt"] = negative_prompt
        value_dict["target_width"] = width
        value_dict["target_height"] = height
        return do_img2img(
            image, self.model, sampler, value_dict, samples,
            force_uc_zero_embeddings=(
                ["txt"] if not self.specs.is_legacy else []),
            return_latents=return_latents, filter=None, seed=seed)

    def refiner(self, params: SamplingParams, image, prompt: str,
                negative_prompt: Optional[str] = None, samples: int = 1,
                return_latents: bool = False, seed: int = 42):
        """image is a base-model latent (b, h/8, w/8, 4) — skip_encode."""
        sampler = get_sampler_config(params)
        value_dict = {
            "orig_width": image.shape[2] * 8,
            "orig_height": image.shape[1] * 8,
            "target_width": image.shape[2] * 8,
            "target_height": image.shape[1] * 8,
            "prompt": prompt,
            "negative_prompt": negative_prompt,
            "crop_coords_top": 0,
            "crop_coords_left": 0,
            "aesthetic_score": 6.0,
            "negative_aesthetic_score": 2.5,
        }
        return do_img2img(
            image, self.model, sampler, value_dict, samples,
            skip_encode=True, return_latents=return_latents, filter=None,
            seed=seed)


def get_guider_config(params: SamplingParams):
    """(api.py:283-308)."""
    if params.guider == Guider.IDENTITY:
        return {"target":
                "sgm.modules.diffusionmodules.guiders.IdentityGuider"}
    if params.guider == Guider.VANILLA:
        if params.thresholder != Thresholder.NONE:
            raise NotImplementedError(params.thresholder)
        dyn_thresh_config = {
            "target": ("sgm.modules.diffusionmodules.sampling_utils."
                       "NoDynamicThresholding")}
        return {"target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
                "params": {"scale": params.scale,
                           "dyn_thresh_config": dyn_thresh_config}}
    raise NotImplementedError(params.guider)


def get_discretization_config(params: SamplingParams):
    """(api.py:311-326)."""
    if params.discretization == Discretization.LEGACY_DDPM:
        return {"target": ("sgm.modules.diffusionmodules.discretizer."
                           "LegacyDDPMDiscretization")}
    if params.discretization == Discretization.EDM:
        return {"target": ("sgm.modules.diffusionmodules.discretizer."
                           "EDMDiscretization"),
                "params": {"sigma_min": params.sigma_min,
                           "sigma_max": params.sigma_max,
                           "rho": params.rho}}
    raise ValueError(f"unknown discretization {params.discretization}")


def get_sampler_config(params: SamplingParams):
    """(api.py:328-388): instantiate the chosen sampler over the chosen
    ladder/guider."""
    discretization_config = get_discretization_config(params)
    guider_config = get_guider_config(params)
    common = dict(num_steps=params.steps,
                  discretization_config=discretization_config,
                  guider_config=guider_config)
    extra = {
        Sampler.EULER_EDM: dict(s_churn=params.s_churn, s_tmin=params.s_tmin,
                                s_tmax=params.s_tmax, s_noise=params.s_noise),
        Sampler.HEUN_EDM: dict(s_churn=params.s_churn, s_tmin=params.s_tmin,
                               s_tmax=params.s_tmax, s_noise=params.s_noise),
        Sampler.EULER_ANCESTRAL: dict(eta=params.eta, s_noise=params.s_noise),
        Sampler.DPMPP2S_ANCESTRAL: dict(eta=params.eta,
                                        s_noise=params.s_noise),
        Sampler.DPMPP2M: {},
        Sampler.LINEAR_MULTISTEP: dict(order=params.order),
    }.get(params.sampler)
    if extra is None:
        raise ValueError(f"unknown sampler {params.sampler}!")
    return instantiate_from_config({
        "target": ("sgm.modules.diffusionmodules.sampling."
                   f"{params.sampler.value}"),
        "params": {**common, **extra}})
