"""CLIP score (reference: eval/eval_clip_score.py).

score = 100 * cos(image_emb, text_emb) averaged over pairs, open_clip
ViT-g-14 in the reference.  Weights are external; the scorer takes any
(image_embed_fn, text_embed_fn) pair so it can run on our CLIP tower when
its checkpoint (+ a text tower) is available, or on torch open_clip if
installed.  The aggregation math is weight-free and tested.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def clip_score_from_embeddings(img_emb: np.ndarray, txt_emb: np.ndarray) -> float:
    """img_emb/txt_emb: (N, D) unnormalized.  Mean 100*cosine over pairs."""
    a = img_emb / np.linalg.norm(img_emb, axis=-1, keepdims=True)
    b = txt_emb / np.linalg.norm(txt_emb, axis=-1, keepdims=True)
    return float(100.0 * np.mean(np.sum(a * b, axis=-1)))


_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class JaxClipScorer:
    """Dual-tower CLIP scorer on the JAX towers (models/clip_score.py).

    weights_path: HF-format CLIPModel state dict (.bin/.safetensors) of the
    scoring model (the reference's open_clip ViT-g-14 exists in HF format
    as laion/CLIP-ViT-g-14-laion2B-s12B-b42K).  Without weights, a small
    random-init config runs the full pipeline in smoke mode.
    tokenizer_path: a HF tokenizer dir/name; without it a deterministic
    hash tokenizer keeps smoke mode self-contained.
    """

    def __init__(self, weights_path: str = None, tokenizer_path: str = None,
                 cfg=None):
        import jax

        from scail_tpu.models.clip_score import (ClipScoreConfig,
                                                 clip_image_embed,
                                                 clip_params_from_hf_state_dict,
                                                 clip_text_embed,
                                                 init_clip_params)

        if weights_path is not None:
            if weights_path.endswith(".safetensors"):
                from safetensors.numpy import load_file

                sd = load_file(weights_path)
            else:
                from scail_tpu.convert.torch_ckpt import load_torch_state_dict

                sd = load_torch_state_dict(weights_path)
            if "visual.conv1.weight" in sd:  # open_clip layout (HPS_v2.pt etc.)
                from scail_tpu.models.clip_score import clip_params_from_open_clip

                if cfg is None:
                    width = sd["visual.conv1.weight"].shape[0]
                    cfg = (ClipScoreConfig.vit_h14() if width == 1280
                           else ClipScoreConfig.vit_g14())
                self.cfg = cfg
                self.params = clip_params_from_open_clip(sd, self.cfg)
            else:
                self.cfg = cfg or ClipScoreConfig()
                self.params = clip_params_from_hf_state_dict(sd, self.cfg)
        else:
            self.cfg = cfg or ClipScoreConfig(
                vision_width=64, vision_layers=2, vision_heads=4,
                vision_mlp=96, text_width=64, text_layers=2, text_heads=4,
                text_mlp=96, embed_dim=32)
            self.params = init_clip_params(jax.random.PRNGKey(0), self.cfg)

        self._img_fn = jax.jit(lambda p, x: clip_image_embed(p, self.cfg, x))
        self._txt_fn = jax.jit(lambda p, i: clip_text_embed(p, self.cfg, i))
        self._tok = None
        if tokenizer_path:
            from transformers import AutoTokenizer

            self._tok = AutoTokenizer.from_pretrained(tokenizer_path)

    def preprocess(self, pil_images) -> np.ndarray:
        """open_clip-style eval transform: bicubic resize (short side),
        center crop, CLIP mean/std normalize -> (b, 3, S, S)."""
        import jax.numpy as jnp

        from scail_tpu.ops.resize import resize_bicubic

        size = self.cfg.image_size
        out = []
        for im in pil_images:
            a = np.asarray(im, np.float32) / 255.0          # (H, W, 3)
            x = jnp.asarray(a.transpose(2, 0, 1))[None]     # (1, 3, H, W)
            h, w = x.shape[2], x.shape[3]
            s = size / min(h, w)
            nh, nw = max(size, round(h * s)), max(size, round(w * s))
            x = resize_bicubic(x, nh, nw, antialias=True)
            t, l = (nh - size) // 2, (nw - size) // 2
            x = x[:, :, t : t + size, l : l + size]
            out.append(np.asarray(x)[0])
        x = np.stack(out)
        return (x - _CLIP_MEAN[:, None, None]) / _CLIP_STD[:, None, None]

    def tokenize(self, texts: Sequence[str]) -> np.ndarray:
        L = self.cfg.context_length
        if self._tok is not None:
            enc = self._tok(list(texts), padding="max_length", truncation=True,
                            max_length=L, return_tensors="np")
            return enc["input_ids"].astype(np.int32)
        # deterministic fallback: BOS + hashed words + EOS, zero pad
        bos, eos = self.cfg.eos_token_id - 1, self.cfg.eos_token_id
        ids = np.zeros((len(texts), L), np.int32)
        for r, t in enumerate(texts):
            toks = [bos] + [hash(wd) % (bos - 1) + 1
                            for wd in t.lower().split()][: L - 2] + [eos]
            ids[r, : len(toks)] = toks
        return ids

    def image_embed(self, pil_images) -> np.ndarray:
        return np.asarray(self._img_fn(self.params, self.preprocess(pil_images)))

    def text_embed(self, texts: Sequence[str]) -> np.ndarray:
        return np.asarray(self._txt_fn(self.params, self.tokenize(texts)))


def compute_clip_score(images, prompts: Sequence[str],
                       image_embed_fn: Callable, text_embed_fn: Callable,
                       batch: int = 32) -> float:
    img_embs, txt_embs = [], []
    for i in range(0, len(prompts), batch):
        img_embs.append(np.asarray(image_embed_fn(images[i : i + batch])))
        txt_embs.append(np.asarray(text_embed_fn(list(prompts[i : i + batch]))))
    return clip_score_from_embeddings(np.concatenate(img_embs),
                                      np.concatenate(txt_embs))
