"""Target-string object factory, config-compatible with the reference.

The reference builds its whole model graph data-driven from YAML via
``instantiate_from_config({'target': 'pkg.mod.Cls', 'params': {...}})``
(reference: sgm/util.py:277-295).  We keep the exact contract so the
reference's ``configs/video_model/*.yaml`` files load unchanged, but remap
reference target paths (torch classes) onto their TPU-native equivalents
through an alias registry.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

# Maps reference target strings -> scail_tpu target strings.  Extended by
# @register(alias=...) decorations across the package.
_ALIASES: Dict[str, str] = {}

# Direct name -> object registrations (avoids import-path round trips).
_REGISTRY: Dict[str, Any] = {}


def register(name: str = None, alias=()):
    """Register a class/function under its scail_tpu path and optional
    reference-path aliases so YAML configs written for the reference resolve
    to TPU-native implementations."""

    def deco(obj):
        key = name or f"{obj.__module__}.{obj.__qualname__}"
        _REGISTRY[key] = obj
        aliases = (alias,) if isinstance(alias, str) else tuple(alias)
        for a in aliases:
            _ALIASES[a] = key
        return obj

    return deco


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    key = _ALIASES.get(string, string)
    if key in _REGISTRY:
        return _REGISTRY[key]
    if string not in _ALIASES:
        # Reference-path aliases register lazily when their scail_tpu module
        # imports; load them ALL before any importlib fallback.  The actual
        # reference packages (sgm/sat) can be importable in test
        # environments and must never shadow an alias.
        ensure_imports()
        key = _ALIASES.get(string, string)
        if key in _REGISTRY:
            return _REGISTRY[key]
    module, cls = key.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config, **extra_kwargs):
    """Build ``target(**params, **extra_kwargs)``; mirrors sgm/util.py:277."""
    if not isinstance(config, dict):
        # OmegaConf-style access objects also expose __getitem__/get
        config = dict(config)
    if "target" not in config:
        if config.get("__is_first_stage__", False):
            return None
        if config.get("__is_unconditional__", False):
            return None
        raise KeyError("Expected key `target` to instantiate.")
    params = dict(config.get("params", {}) or {})
    params.update(extra_kwargs)
    return get_obj_from_str(config["target"])(**params)


def ensure_imports():
    """Import every module that registers aliases, so YAML configs written
    against reference target paths resolve without callers knowing our
    module layout."""
    for m in (
        "scail_tpu.models.dit",
        "scail_tpu.models.wan_vae",
        "scail_tpu.models.umt5",
        "scail_tpu.models.clip_vit",
        "scail_tpu.diffusion.denoiser",
        "scail_tpu.diffusion.scaling",
        "scail_tpu.diffusion.discretization",
        "scail_tpu.diffusion.sigma_sampling",
        "scail_tpu.diffusion.guiders",
        "scail_tpu.diffusion.samplers",
        "scail_tpu.diffusion.loss",
        "scail_tpu.diffusion.conditioner",
        "scail_tpu.models.unet",
        "scail_tpu.models.video_unet",
        "scail_tpu.diffusion.embedders",
        "scail_tpu.autoencoding.autoencoder_kl",
        "scail_tpu.inference.engine",
    ):
        importlib.import_module(m)
