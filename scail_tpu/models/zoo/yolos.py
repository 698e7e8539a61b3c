"""YOLOS object detector (reference: sat/model/official/yolos_model.py —
ViT encoder with [CLS | patches | detection tokens], per-layer "mid"
position embeddings, and DETR-style class/box MLP heads).

Weight ingestion uses the HF `YolosForObjectDetection` naming
(`yolos_params_from_hf`); golden-tested against transformers' YOLOS
(tests/test_zoo_models.py).  Position embeddings interpolate bicubically
(torch-exact via ops/resize.py) when the input size differs from the
trained grid, matching InterpolateInitialPositionEmbeddings /
InterpolateMidPositionEmbeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact
from scail_tpu.ops.norms import layer_norm
from scail_tpu.ops.resize import resize_bicubic


@dataclasses.dataclass(frozen=True)
class YolosConfig:
    image_size: Tuple[int, int] = (512, 864)
    patch_size: int = 16
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    inner_hidden_size: int = 3072
    num_detection_tokens: int = 100
    num_labels: int = 91
    use_mid_position_embeddings: bool = True
    eps: float = 1e-12

    @property
    def grid(self):
        return (self.image_size[0] // self.patch_size,
                self.image_size[1] // self.patch_size)


def _interp_pos(pos, cfg: YolosConfig, img_hw):
    """pos: (..., 1+N+det, d) -> interpolated to img_hw's patch grid."""
    gh, gw = cfg.grid
    nh, nw = img_hw[0] // cfg.patch_size, img_hw[1] // cfg.patch_size
    if (nh, nw) == (gh, gw):
        return pos
    det = cfg.num_detection_tokens
    lead = pos[..., :1, :]
    patch = pos[..., 1:-det, :]
    tail = pos[..., -det:, :]
    shp = patch.shape[:-2]
    grid = patch.reshape(shp + (gh, gw, pos.shape[-1]))
    grid = jnp.moveaxis(grid, -1, -3)  # (..., d, gh, gw)
    grid = resize_bicubic(grid.reshape((-1, pos.shape[-1], gh, gw)), nh, nw)
    grid = grid.reshape(shp + (pos.shape[-1], nh, nw))
    patch = jnp.moveaxis(grid, -3, -1).reshape(shp + (nh * nw, pos.shape[-1]))
    return jnp.concatenate([lead, patch, tail], axis=-2)


def _vit_block(x, p, num_heads, eps):
    b, s, d = x.shape
    hd = d // num_heads
    y = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps=eps)
    q = (y @ p["q"]["kernel"] + p["q"]["bias"]).reshape(b, s, num_heads, hd)
    k = (y @ p["k"]["kernel"] + p["k"]["bias"]).reshape(b, s, num_heads, hd)
    v = (y @ p["v"]["kernel"] + p["v"]["bias"]).reshape(b, s, num_heads, hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, d)
    x = x + (o @ p["proj"]["kernel"] + p["proj"]["bias"])
    y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps=eps)
    h = gelu_exact(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    return x + (h @ p["fc2"]["kernel"] + p["fc2"]["bias"])


def _mlp_head(x, p):
    """3-layer DETR prediction head: relu on all but the last layer."""
    n = len(p)
    for i in range(n):
        x = x @ p[f"l{i}"]["kernel"] + p[f"l{i}"]["bias"]
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def yolos_forward(params, cfg: YolosConfig, images):
    """images: (b, 3, H, W) -> (class logits (b, det, labels+1),
    pred boxes (b, det, 4) in [0,1] cxcywh)."""
    b, _, H, W = images.shape
    x = jnp.transpose(images, (0, 2, 3, 1))
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"].astype(x.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(b, -1, cfg.dim) + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"][None], (b, 1, cfg.dim))
    det = jnp.broadcast_to(params["det_tokens"][None],
                           (b, cfg.num_detection_tokens, cfg.dim))
    x = jnp.concatenate([cls, x, det], axis=1)
    x = x + _interp_pos(params["pos_embed"], cfg, (H, W))[None]

    mid = None
    if cfg.use_mid_position_embeddings:
        mid = _interp_pos(params["mid_pos_embed"], cfg, (H, W))
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda p: p[li], params["layers"])
        x = _vit_block(x, lp, cfg.num_heads, cfg.eps)
        if mid is not None and li < cfg.num_layers - 1:
            x = x + mid[li][None]
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"],
                   eps=cfg.eps)

    dets = x[:, -cfg.num_detection_tokens:]
    logits = _mlp_head(dets, params["class_head"])
    boxes = jax.nn.sigmoid(_mlp_head(dets, params["bbox_head"]))
    return logits, boxes


def yolos_params_from_hf(sd, cfg: YolosConfig):
    """HF YolosForObjectDetection state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers
    pre = "vit.encoder.layer"

    def lyr(fmt):
        return {"kernel": np.stack(
                    [g(f"{pre}.{i}.{fmt}.weight").T for i in range(L)]),
                "bias": np.stack(
                    [g(f"{pre}.{i}.{fmt}.bias") for i in range(L)])}

    def ln(fmt):
        return {"scale": np.stack([g(f"{pre}.{i}.{fmt}.weight") for i in range(L)]),
                "bias": np.stack([g(f"{pre}.{i}.{fmt}.bias") for i in range(L)])}

    def head(name):
        n = 0
        while f"{name}.layers.{n}.weight" in sd:
            n += 1
        return {f"l{i}": {"kernel": g(f"{name}.layers.{i}.weight").T,
                          "bias": g(f"{name}.layers.{i}.bias")}
                for i in range(n)}

    conv_w = g("vit.embeddings.patch_embeddings.projection.weight")
    p = {
        "patch_embed": {
            "kernel": conv_w.transpose(2, 3, 1, 0),
            "bias": g("vit.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": g("vit.embeddings.cls_token")[0, 0],
        "det_tokens": g("vit.embeddings.detection_tokens")[0],
        "pos_embed": g("vit.embeddings.position_embeddings")[0],
        "layers": {
            "ln1": ln("layernorm_before"),
            "q": lyr("attention.attention.query"),
            "k": lyr("attention.attention.key"),
            "v": lyr("attention.attention.value"),
            "proj": lyr("attention.output.dense"),
            "ln2": ln("layernorm_after"),
            "fc1": lyr("intermediate.dense"),
            "fc2": lyr("output.dense"),
        },
        "norm": {"scale": g("vit.layernorm.weight"),
                 "bias": g("vit.layernorm.bias")},
        "class_head": head("class_labels_classifier"),
        "bbox_head": head("bbox_predictor"),
    }
    if cfg.use_mid_position_embeddings:
        p["mid_pos_embed"] = g("vit.encoder.mid_position_embeddings")[:, 0]
    return p
