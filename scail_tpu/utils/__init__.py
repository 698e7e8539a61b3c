from scail_tpu.utils.registry import instantiate_from_config, get_obj_from_str, register
from scail_tpu.utils.misc import append_dims, default

__all__ = [
    "instantiate_from_config",
    "get_obj_from_str",
    "register",
    "append_dims",
    "default",
]
