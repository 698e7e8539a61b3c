"""GLM-4V multimodal composition (reference: sat/model/official/
glm4v_model.py — an EVA2-CLIP vision tower whose patch grid is 2x2
conv-downsampled, projected through a SwiGLU "GLU" adapter (:28-46),
wrapped in learned boi/eoi tokens, and spliced into the ChatGLM4 token
embedding at image_embed_mask positions (ImageMixin :83-135)).

Built by composing the zoo substrates: zoo/evaclip.py (vision) +
zoo/glm.py (ChatGLM4-semantics decoder, HF-golden).  The adapter math is
golden-tested against the reference's own GLU module
(tests/test_zoo_models_ref.py); the full splice is covered by a
construction test (the reference's ChatGLM4 decoder is triton-gated
upstream, so no end-to-end torch golden is runnable here).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact
from scail_tpu.models.zoo.evaclip import EVACLIPConfig, evaclip_forward
from scail_tpu.models.zoo.glm import GlmConfig, glm_forward
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class GLM4VConfig:
    glm: GlmConfig = GlmConfig()
    vit: EVACLIPConfig = EVACLIPConfig()
    proj_hidden_size: int = 4096   # conv output channels
    adapter_inner: int = 13696     # GLU inner width

    @property
    def image_length(self):
        # vit grid conv-downsampled 2x2, +boi/eoi
        g = self.vit.image_size // self.vit.patch_size
        return (g // 2) * (g // 2) + 2


def glm4v_vision_tokens(params, cfg: GLM4VConfig, images):
    """images: (b, C, H, W) -> (b, image_length, glm.dim) embeddings
    [boi | projected patches | eoi] (ImageMixin.word_embedding_forward)."""
    ap = params["adapter"]
    x = evaclip_forward(params["vit"], cfg.vit, images)   # (b, g*g, e)
    b, s, e = x.shape
    g = int(s ** 0.5)
    x = x.reshape(b, g, g, e)
    x = jax.lax.conv_general_dilated(
        x, jnp.transpose(ap["conv"]["kernel"], (2, 3, 1, 0)).astype(x.dtype),
        window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + ap["conv"]["bias"]
    x = x.reshape(b, -1, x.shape[-1])
    # GLU adapter (glm4v_model.py:40-46)
    x = x @ ap["linear_proj"]["kernel"]
    x = gelu_exact(layer_norm(x, ap["norm1"]["scale"], ap["norm1"]["bias"],
                              eps=1e-5))
    x = jax.nn.silu(x @ ap["gate"]["kernel"]) * (x @ ap["up"]["kernel"])
    x = x @ ap["down"]["kernel"]
    boi = jnp.broadcast_to(ap["boi"][None], (b, 1, x.shape[-1]))
    eoi = jnp.broadcast_to(ap["eoi"][None], (b, 1, x.shape[-1]))
    return jnp.concatenate([boi, x, eoi], axis=1)


def glm4v_forward(params, cfg: GLM4VConfig, tokens, images=None,
                  image_embed_mask=None, cache=None):
    """tokens: (b, s); image_embed_mask: (b, s) bool marking the
    image_length slots to overwrite with vision embeddings."""
    embeds = params["glm"]["embed"][tokens]
    if images is not None:
        vis = glm4v_vision_tokens(params, cfg, images)
        b, s, d = embeds.shape
        # scatter [boi|img|eoi] rows into the masked positions, in order
        idx = jnp.cumsum(image_embed_mask.astype(jnp.int32), axis=1) - 1
        idx = jnp.clip(idx, 0, vis.shape[1] - 1)
        spliced = jnp.take_along_axis(vis, idx[..., None], axis=1)
        embeds = jnp.where(image_embed_mask[..., None], spliced, embeds)
    return glm_forward(params["glm"], cfg.glm, tokens, cache=cache,
                       inputs_embeds=embeds)


def glm4v_adapter_params_from_sat(sd, prefix="mixins.eva."):
    """Reference ImageMixin conv + GLU state dict -> adapter pytree."""
    g = lambda k: np.asarray(sd[prefix + k])
    return {
        "conv": {"kernel": g("conv.weight"), "bias": g("conv.bias")},
        "linear_proj": {"kernel": g("linear_proj.linear_proj.weight").T},
        "norm1": {"scale": g("linear_proj.norm1.weight"),
                  "bias": g("linear_proj.norm1.bias")},
        "gate": {"kernel": g("linear_proj.gate_proj.weight").T},
        "up": {"kernel": g("linear_proj.dense_h_to_4h.weight").T},
        "down": {"kernel": g("linear_proj.dense_4h_to_h.weight").T},
        "boi": g("boi")[0],
        "eoi": g("eoi")[0],
    }
