from scail_tpu.ops.norms import rms_norm, layer_norm, modulate
from scail_tpu.ops.rotary import apply_rotary, build_scail_rope, rotate_half
from scail_tpu.ops.attention import attention

__all__ = [
    "rms_norm",
    "layer_norm",
    "modulate",
    "apply_rotary",
    "build_scail_rope",
    "rotate_half",
    "attention",
]
