"""SD-era conditioning embedders (reference: sgm/modules/encoders/modules.py).

The SCAIL video path conditions through umt5/clip (models/umt5.py,
models/clip_vit.py); these are the *image*-pipeline embedders the
sgm/inference API needs: the HF-CLIP text encoder (modules.py:577-640),
the open_clip text encoders v1/v2 (modules.py:642-812) and the
ConcatTimestepEmbedderND size/score conditioner (modules.py:1158-1175).

TPU-first design: one functional text tower (reusing the golden-tested
HF-CLIP block from models/clip_score.py) shared by all three text
embedders; the layer-select variants ("hidden"/"penultimate"/"last")
are a static prefix-length of the `lax.scan` over stacked layer params,
so every variant jits to a single fused program.  Weights are
weight-gated: HF / open_clip state dicts convert through the
models/clip_score.py converters; without checkpoints the embedders run
in random-init smoke mode with a hash tokenizer (the repo-wide
convention, models/umt5.py).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.clip_score import ClipScoreConfig, _encoder_block
from scail_tpu.models.common import timestep_embedding
from scail_tpu.ops.norms import layer_norm
from scail_tpu.utils.registry import register


# ---------------------------------------------------------------------------
# Timestep + ConcatTimestepEmbedderND (modules.py:1158-1175; openaimodel
# Timestep = util.timestep_embedding)
# ---------------------------------------------------------------------------
@register(alias="sgm.modules.diffusionmodules.openaimodel.Timestep")
class Timestep:
    def __init__(self, dim: int):
        self.dim = dim

    def __call__(self, t):
        return timestep_embedding(jnp.asarray(t), self.dim)


@register(alias="sgm.modules.encoders.modules.ConcatTimestepEmbedderND")
class ConcatTimestepEmbedderND:
    """Embeds each scalar of a (b, d) value independently with the
    sinusoidal table and concatenates: (b, d) -> (b, d*outdim).  SDXL uses
    it for original_size / crop_coords / target_size / aesthetic_score."""

    is_trainable = False
    ucg_rate = 0.0
    input_key = None
    legacy_ucg_val = None

    def __init__(self, outdim: int):
        self.outdim = outdim
        self.timestep = Timestep(outdim)

    def __call__(self, x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        assert x.ndim == 2, f"ConcatTimestepEmbedderND wants (b, d), got {x.shape}"
        b, dims = x.shape
        emb = self.timestep(x.reshape(-1))
        return emb.reshape(b, dims * self.outdim)


# ---------------------------------------------------------------------------
# shared functional text tower
# ---------------------------------------------------------------------------
def _text_cfg(width: int, layers: int, heads: int, mlp: int, act: str,
              vocab_size: int = 49408, context_length: int = 77,
              embed_dim: Optional[int] = None) -> ClipScoreConfig:
    # CLIP's EOT token is the last vocab id (49407 at the standard 49408)
    return ClipScoreConfig(
        text_width=width, text_layers=layers, text_heads=heads, text_mlp=mlp,
        hidden_act=act, vocab_size=vocab_size, context_length=context_length,
        embed_dim=embed_dim or width, eos_token_id=vocab_size - 1)


def init_text_tower(key, cfg: ClipScoreConfig, with_projection: bool):
    """Text-only param tree in the models/clip_score.py layout."""
    ks = iter(jax.random.split(key, 8))

    def lin(k, L, din, dout):
        return {"kernel": 0.02 * jax.random.normal(k, (L, din, dout), jnp.float32),
                "bias": jnp.zeros((L, dout), jnp.float32)}

    def ln(L, d):
        shape = (L, d) if L else (d,)
        return {"scale": jnp.ones(shape, jnp.float32),
                "bias": jnp.zeros(shape, jnp.float32)}

    d, L = cfg.text_width, cfg.text_layers
    k1, k2, k3, k4, k5, k6 = jax.random.split(next(ks), 6)
    p = {
        "text": {
            "token_embedding": 0.02 * jax.random.normal(
                next(ks), (cfg.vocab_size, d)),
            "position_embedding": 0.01 * jax.random.normal(
                next(ks), (cfg.context_length, d)),
            "final_ln": ln(0, d),
            "layers": {
                "ln1": ln(L, d), "ln2": ln(L, d),
                "q": lin(k1, L, d, d), "k": lin(k2, L, d, d),
                "v": lin(k3, L, d, d), "out": lin(k4, L, d, d),
                "fc1": lin(k5, L, d, cfg.text_mlp),
                "fc2": lin(k6, L, cfg.text_mlp, d),
            },
        },
    }
    if with_projection:
        p["text_projection"] = {"kernel": 0.02 * jax.random.normal(
            next(ks), (d, cfg.embed_dim))}
    return p


def text_tower_hidden(params, cfg: ClipScoreConfig, ids, num_blocks: int):
    """Hidden states after the first `num_blocks` encoder layers (static),
    BEFORE the final layer norm — HF hidden_states[num_blocks] semantics."""
    tp = params["text"]
    cdtype = cfg.compute_dtype
    b, S = ids.shape
    x = tp["token_embedding"][ids].astype(cdtype)
    x = x + tp["position_embedding"].astype(cdtype)[None, :S]
    causal = jnp.triu(jnp.full((S, S), -jnp.inf, jnp.float32), k=1)[None, None]
    if num_blocks == 0:
        return x

    def block(x, p):
        return _encoder_block(cfg, x, p, cfg.text_heads, mask_bias=causal), None

    lp = jax.tree.map(lambda t: t[:num_blocks].astype(cdtype),
                      tp["layers"])
    x, _ = jax.lax.scan(block, x, lp)
    return x


def _final_ln(params, cfg: ClipScoreConfig, x):
    tp = params["text"]
    return layer_norm(x, tp["final_ln"]["scale"], tp["final_ln"]["bias"],
                      eps=cfg.eps)


class _HashTokenizer:
    """Smoke-mode tokenizer: BOS + hashed words + EOS, padded with pad_id
    (matches the umt5 _FallbackTokenizer convention)."""

    def __init__(self, max_length: int, vocab_size: int,
                 bos: int = 49406, eos: int = 49407, pad: Optional[int] = None):
        self.max_length, self.vocab = max_length, vocab_size
        self.bos, self.eos = bos, eos
        self.pad = eos if pad is None else pad

    def __call__(self, texts):
        ids = np.full((len(texts), self.max_length), self.pad, np.int32)
        for r, t in enumerate(texts):
            toks = [self.bos] + [hash(w) % (self.vocab - 3)
                                 for w in t.split()][: self.max_length - 2]
            toks.append(self.eos)
            ids[r, : len(toks)] = toks
        return ids


def _load_tokenizer(tokenizer_path, max_length, vocab_size, pad=None):
    if tokenizer_path and os.path.exists(str(tokenizer_path)):
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(tokenizer_path)

            def call(texts):
                return np.asarray(tok(
                    list(texts), truncation=True, max_length=max_length,
                    padding="max_length", return_tensors="np").input_ids,
                    np.int32)

            return call
        except Exception:
            pass
    return _HashTokenizer(max_length, vocab_size, pad=pad)


# ---------------------------------------------------------------------------
# FrozenCLIPEmbedder (modules.py:577-640): HF CLIPTextModel semantics
# ---------------------------------------------------------------------------
@register(alias="sgm.modules.encoders.modules.FrozenCLIPEmbedder")
class FrozenCLIPEmbedder:
    """layer='last': post-final-LN hidden states; 'pooled': final-LN state at
    the first EOS token, (b, 1, d); 'hidden': pre-final-LN hidden_states[idx]
    (idx 0 = embeddings).  always_return_pooled appends HF pooler_output."""

    LAYERS = ("last", "pooled", "hidden")
    is_trainable = False
    ucg_rate = 0.0
    input_key = "txt"
    legacy_ucg_val = None

    def __init__(self, version: Optional[str] = None, max_length: int = 77,
                 freeze: bool = True, layer: str = "last",
                 layer_idx: Optional[int] = None,
                 always_return_pooled: bool = False,
                 width: int = 768, layers: int = 12, heads: int = 12,
                 mlp: int = 3072, vocab_size: int = 49408,
                 checkpoint_path: Optional[str] = None,
                 tokenizer_path: Optional[str] = None, **_):
        assert layer in self.LAYERS
        self.cfg = _text_cfg(width, layers, heads, mlp, act="quick_gelu",
                             vocab_size=vocab_size, context_length=max_length)
        self.layer, self.return_pooled = layer, always_return_pooled
        if layer == "hidden":
            assert layer_idx is not None and abs(layer_idx) <= layers
        self.layer_idx = layer_idx
        self.max_length = max_length
        self.params = None
        self._fwd = None
        if checkpoint_path and os.path.exists(str(checkpoint_path)):
            from scail_tpu.convert.torch_ckpt import load_torch_state_dict

            self.load_state_dict(load_torch_state_dict(checkpoint_path))
        self.tokenizer = _load_tokenizer(
            tokenizer_path or version, max_length, vocab_size)

    # -- params -----------------------------------------------------------
    def init(self, key):
        self.params = init_text_tower(key, self.cfg, with_projection=False)
        return self.params

    def load_state_dict(self, sd):
        """HF CLIPTextModel state dict (keys under text_model.*)."""
        self.params = text_params_from_hf(sd, self.cfg)
        return self.params

    # -- forward ----------------------------------------------------------
    def _n_blocks(self) -> int:
        if self.layer != "hidden":
            return self.cfg.text_layers
        return self.layer_idx % (self.cfg.text_layers + 1)

    def _build(self):
        cfg = self.cfg
        n_hidden = self._n_blocks()
        need_full = self.layer != "hidden" or self.return_pooled

        def fwd(params, ids):
            out = {}
            if self.layer == "hidden":
                out["z"] = text_tower_hidden(params, cfg, ids, n_hidden)
            if need_full:
                h = _final_ln(params, cfg,
                              text_tower_hidden(params, cfg, ids,
                                                cfg.text_layers))
                eos = jnp.argmax(
                    (ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
                pooled = h[jnp.arange(ids.shape[0]), eos]
                if self.layer == "last":
                    out["z"] = h
                elif self.layer == "pooled":
                    out["z"] = pooled[:, None, :]
                out["pooled"] = pooled
            return out

        return jax.jit(fwd)

    def __call__(self, texts):
        if self.params is None:
            self.init(jax.random.PRNGKey(0))
        if self._fwd is None:
            self._fwd = self._build()
        ids = jnp.asarray(self.tokenizer(list(texts)))
        out = self._fwd(self.params, ids)
        if self.return_pooled:
            return out["z"], out["pooled"]
        return out["z"]


# ---------------------------------------------------------------------------
# FrozenOpenCLIPEmbedder / FrozenOpenCLIPEmbedder2 (modules.py:642-812)
# ---------------------------------------------------------------------------
_OPEN_CLIP_ARCHS = {
    # width, layers, heads, mlp, embed_dim  (text towers)
    "ViT-H-14": (1024, 24, 16, 4096, 1024),
    "ViT-bigG-14": (1280, 32, 20, 5120, 1280),
    "ViT-g-14": (1024, 24, 16, 4096, 1024),
    "ViT-L-14": (768, 12, 12, 3072, 768),
}


@register(alias="sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder2")
class FrozenOpenCLIPEmbedder2:
    """open_clip text tower.  legacy=True: ln_final(hidden at the selected
    depth).  legacy=False (the SDXL mode): z = the selected hidden WITHOUT
    ln_final (the reference returns outputs['penultimate'] raw,
    modules.py:712-757); pooled = ln_final(last)[argmax(ids)] @ proj."""

    LAYERS = ("pooled", "last", "penultimate")
    is_trainable = False
    ucg_rate = 0.0
    input_key = "txt"
    legacy_ucg_val = None

    def __init__(self, arch: str = "ViT-H-14", version: Optional[str] = None,
                 max_length: int = 77, freeze: bool = True,
                 layer: str = "last", always_return_pooled: bool = False,
                 legacy: bool = True, checkpoint_path: Optional[str] = None,
                 tokenizer_path: Optional[str] = None, **_):
        assert layer in self.LAYERS
        w, L, h, m, e = _OPEN_CLIP_ARCHS[arch]
        self.cfg = _text_cfg(w, L, h, m, act="gelu", embed_dim=e)
        self.layer = layer
        self.layer_idx = {"last": 0, "penultimate": 1}.get(layer)
        if self.layer_idx is None:
            raise NotImplementedError(layer)
        self.legacy = legacy
        self.return_pooled = always_return_pooled
        if always_return_pooled:
            assert not legacy
        self.max_length = max_length
        self.params = None
        self._fwd = None
        if checkpoint_path and os.path.exists(str(checkpoint_path)):
            from scail_tpu.convert.torch_ckpt import load_torch_state_dict

            self.load_state_dict(load_torch_state_dict(checkpoint_path))
        # open_clip pads with 0 and pools at argmax (the EOT id is the
        # largest in any sequence)
        self.tokenizer = _load_tokenizer(tokenizer_path or version,
                                         max_length, self.cfg.vocab_size,
                                         pad=0)

    def init(self, key):
        self.params = init_text_tower(key, self.cfg, with_projection=True)
        return self.params

    def load_state_dict(self, sd):
        """open_clip CLIP state dict (token_embedding / transformer.resblocks
        / ln_final / text_projection at the top level)."""
        self.params = text_params_from_open_clip(sd, self.cfg)
        return self.params

    def _build(self):
        cfg, L = self.cfg, self.cfg.text_layers
        n_sel = L - self.layer_idx

        def fwd(params, ids):
            out = {}
            hid_last = text_tower_hidden(params, cfg, ids, L)
            hid_sel = (hid_last if n_sel == L else
                       text_tower_hidden(params, cfg, ids, n_sel))
            if self.legacy:
                out["z"] = _final_ln(params, cfg, hid_sel)
            else:
                out["z"] = hid_sel  # raw, no ln_final (reference parity)
                o = _final_ln(params, cfg, hid_last)
                pooled = o[jnp.arange(ids.shape[0]), jnp.argmax(ids, axis=-1)]
                out["pooled"] = (
                    pooled @ params["text_projection"]["kernel"].astype(
                        pooled.dtype))
            return out

        return jax.jit(fwd)

    def __call__(self, texts):
        if self.params is None:
            self.init(jax.random.PRNGKey(0))
        if self._fwd is None:
            self._fwd = self._build()
        ids = jnp.asarray(self.tokenizer(list(texts)))
        out = self._fwd(self.params, ids)
        if self.return_pooled:
            return out["z"], out["pooled"]
        return out["z"]


@register(alias="sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder")
class FrozenOpenCLIPEmbedder(FrozenOpenCLIPEmbedder2):
    """v1 (modules.py:743-812): always ln_final(hidden at depth L-idx) —
    exactly the legacy path of v2."""

    LAYERS = ("last", "penultimate")

    def __init__(self, arch: str = "ViT-H-14", version: Optional[str] = None,
                 max_length: int = 77, freeze: bool = True,
                 layer: str = "last", **kw):
        super().__init__(arch=arch, version=version, max_length=max_length,
                         freeze=freeze, layer=layer, legacy=True, **kw)


# ---------------------------------------------------------------------------
# converters (text-only variants of the models/clip_score.py maps)
# ---------------------------------------------------------------------------
def text_params_from_hf(sd, cfg: ClipScoreConfig):
    """HF CLIPTextModel state dict → text tower tree (no projection)."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.text_layers
    e = "text_model.encoder.layers.{}"

    def stack_lin(fmt):
        return {"kernel": np.stack([g(fmt.format(i) + ".weight").T
                                    for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias")
                                  for i in range(L)])}

    def stack_ln(fmt):
        return {"scale": np.stack([g(fmt.format(i) + ".weight")
                                   for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias")
                                  for i in range(L)])}

    return {"text": {
        "token_embedding": g("text_model.embeddings.token_embedding.weight"),
        "position_embedding": g(
            "text_model.embeddings.position_embedding.weight"),
        "final_ln": {"scale": g("text_model.final_layer_norm.weight"),
                     "bias": g("text_model.final_layer_norm.bias")},
        "layers": {
            "ln1": stack_ln(e + ".layer_norm1"),
            "ln2": stack_ln(e + ".layer_norm2"),
            "q": stack_lin(e + ".self_attn.q_proj"),
            "k": stack_lin(e + ".self_attn.k_proj"),
            "v": stack_lin(e + ".self_attn.v_proj"),
            "out": stack_lin(e + ".self_attn.out_proj"),
            "fc1": stack_lin(e + ".mlp.fc1"),
            "fc2": stack_lin(e + ".mlp.fc2"),
        },
    }}


def text_params_from_open_clip(sd, cfg: ClipScoreConfig):
    """open_clip text-tower state dict (fused in_proj qkv) → tree + proj."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.text_layers
    base = "transformer.resblocks.{}"

    def stack(fmt, transpose=False):
        mats = [g(fmt.format(i)) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    in_w = stack(base + ".attn.in_proj_weight")
    in_b = stack(base + ".attn.in_proj_bias")
    qw, kw, vw = np.split(in_w, 3, axis=1)
    qb, kb, vb = np.split(in_b, 3, axis=1)

    def lin(kernel, bias):
        return {"kernel": np.ascontiguousarray(kernel.transpose(0, 2, 1)),
                "bias": bias}

    def ln(fmt):
        return {"scale": stack(fmt + ".weight"), "bias": stack(fmt + ".bias")}

    return {
        "text": {
            "token_embedding": g("token_embedding.weight"),
            "position_embedding": g("positional_embedding"),
            "final_ln": {"scale": g("ln_final.weight"),
                         "bias": g("ln_final.bias")},
            "layers": {
                "ln1": ln(base + ".ln_1"), "ln2": ln(base + ".ln_2"),
                "q": lin(qw, qb), "k": lin(kw, kb), "v": lin(vw, vb),
                "out": {"kernel": stack(base + ".attn.out_proj.weight", True),
                        "bias": stack(base + ".attn.out_proj.bias")},
                "fc1": {"kernel": stack(base + ".mlp.c_fc.weight", True),
                        "bias": stack(base + ".mlp.c_fc.bias")},
                "fc2": {"kernel": stack(base + ".mlp.c_proj.weight", True),
                        "bias": stack(base + ".mlp.c_proj.bias")},
            },
        },
        "text_projection": {"kernel": g("text_projection")},
    }
