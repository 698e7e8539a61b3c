"""umt5-xxl text encoder, TPU-native
(reference: sgm/modules/encoders/umt5.py).

umt5-xxl config (umt5.py:459-472): vocab 256384, d=4096, d_attn=4096,
ffn 10240, 64 heads, 24 layers, 32 relative-position buckets,
shared_pos=False => per-layer bidirectional relative embeddings.

T5 specifics preserved exactly:
  * no attention scaling (umt5.py:114-117), softmax in fp32;
  * T5LayerNorm = RMS without mean subtraction (umt5.py:56-69);
  * gated FFN: fc1(x) * GELU_tanh(gate(x)) (umt5.py:126-144);
  * relative position buckets (umt5.py:248-267) computed host-side (static
    for a fixed max_length) and gathered per layer inside a `lax.scan`.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_tanh
from scail_tpu.ops.norms import rms_norm
from scail_tpu.utils.registry import register


@dataclasses.dataclass(frozen=True)
class UMT5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    eps: float = 1e-6
    dtype: str = "bfloat16"

    @property
    def head_dim(self):
        return self.dim_attn // self.num_heads

    @property
    def compute_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.dtype]


@lru_cache(maxsize=16)
def relative_position_buckets(lq: int, lk: int, num_buckets: int = 32,
                              max_dist: int = 128) -> np.ndarray:
    """Bidirectional T5 buckets (umt5.py:248-267)."""
    rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * nb
    rel_pos = np.abs(rel_pos)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(rel_pos, 1) / max_exact)
            / math.log(max_dist / max_exact)
            * (nb - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, large)
    return rel_buckets.astype(np.int32)


def init_umt5_params(key, cfg: UMT5Config):
    L, d, da, df, nh = (cfg.num_layers, cfg.dim, cfg.dim_attn, cfg.dim_ffn,
                        cfg.num_heads)
    ks = iter(jax.random.split(key, 16))

    def lin(k, din, dout, std):
        return {"kernel": std * jax.random.normal(k, (L, din, dout), jnp.float32)}

    return {
        "token_embedding": jax.random.normal(next(ks), (cfg.vocab_size, d)) * 1.0,
        "layers": {
            "norm1": {"scale": jnp.ones((L, d))},
            "q": lin(next(ks), d, da, (d * da) ** -0.5),
            "k": lin(next(ks), d, da, d ** -0.5),
            "v": lin(next(ks), d, da, d ** -0.5),
            "o": lin(next(ks), da, d, (nh * cfg.head_dim) ** -0.5),
            "pos_emb": jax.random.normal(next(ks), (L, cfg.num_buckets, nh))
            * (2 * cfg.num_buckets * nh) ** -0.5,
            "norm2": {"scale": jnp.ones((L, d))},
            "gate": lin(next(ks), d, df, d ** -0.5),
            "fc1": lin(next(ks), d, df, d ** -0.5),
            "fc2": lin(next(ks), df, d, df ** -0.5),
        },
        "norm": {"scale": jnp.ones((d,))},
    }


def umt5_encode(params, cfg: UMT5Config, ids, mask):
    """ids/mask: (b, S) int32.  Returns mask-zeroed (b, S, dim) states
    (T5EncoderModel.__call__, umt5.py:516-535)."""
    cdtype = cfg.compute_dtype
    b, S = ids.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    x = params["token_embedding"][ids].astype(cdtype)
    buckets = jnp.asarray(
        relative_position_buckets(S, S, cfg.num_buckets, cfg.max_dist)
    )
    # additive mask bias (umt5.py:105-112): min of dtype where masked
    neg = jnp.asarray(-1e9 if cdtype == jnp.float32 else -3.38e38, jnp.float32)
    mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)  # (b,1,1,S)

    lp = jax.tree.map(lambda p: p.astype(cdtype), params["layers"])
    lp["pos_emb"] = params["layers"]["pos_emb"].astype(jnp.float32)

    def layer(x, p):
        pos_bias = p["pos_emb"][buckets]            # (S, S, nh)
        pos_bias = pos_bias.transpose(2, 0, 1)[None]  # (1, nh, S, S)

        y = rms_norm(x, p["norm1"]["scale"], eps=cfg.eps)
        q = (y @ p["q"]["kernel"]).reshape(b, S, nh, hd)
        k = (y @ p["k"]["kernel"]).reshape(b, S, nh, hd)
        v = (y @ p["v"]["kernel"]).reshape(b, S, nh, hd)
        # NO scaling (T5); fp32 softmax
        logits = jnp.einsum("binc,bjnc->bnij", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + pos_bias + mask_bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bnij,bjnc->binc", probs, v).reshape(b, S, -1)
        x = x + o @ p["o"]["kernel"]

        y = rms_norm(x, p["norm2"]["scale"], eps=cfg.eps)
        ff = (y @ p["fc1"]["kernel"]) * gelu_tanh(y @ p["gate"]["kernel"])
        x = x + ff @ p["fc2"]["kernel"]
        return x, None

    x, _ = jax.lax.scan(layer, x, lp)
    x = rms_norm(x, params["norm"]["scale"], eps=cfg.eps)
    return x * mask[:, :, None].astype(x.dtype)


def umt5_params_from_state_dict(sd, cfg: UMT5Config):
    """Map the torch encoder state dict (models_t5_umt5-xxl-enc-bf16.pth,
    names per umt5.py T5Encoder) onto the stacked pytree."""
    L = cfg.num_layers
    g = lambda k: np.asarray(sd[k])

    def stack_lin(fmt):
        return {"kernel": np.stack([g(fmt.format(i)).T for i in range(L)])}

    return {
        "token_embedding": g("token_embedding.weight"),
        "layers": {
            "norm1": {"scale": np.stack([g(f"blocks.{i}.norm1.weight") for i in range(L)])},
            "q": stack_lin("blocks.{}.attn.q.weight"),
            "k": stack_lin("blocks.{}.attn.k.weight"),
            "v": stack_lin("blocks.{}.attn.v.weight"),
            "o": stack_lin("blocks.{}.attn.o.weight"),
            "pos_emb": np.stack(
                [g(f"blocks.{i}.pos_embedding.embedding.weight") for i in range(L)]
            ),
            "norm2": {"scale": np.stack([g(f"blocks.{i}.norm2.weight") for i in range(L)])},
            "gate": stack_lin("blocks.{}.ffn.gate.0.weight"),
            "fc1": stack_lin("blocks.{}.ffn.fc1.weight"),
            "fc2": stack_lin("blocks.{}.ffn.fc2.weight"),
        },
        "norm": {"scale": g("norm.weight")},
    }


class _FallbackTokenizer:
    """Deterministic hash tokenizer used when the HF tokenizer files are not
    on disk (tests / weightless environments)."""

    def __init__(self, seq_len: int, vocab_size: int = 256384):
        self.seq_len = seq_len
        self.vocab_size = vocab_size

    def __call__(self, texts, return_mask=True):
        ids = np.zeros((len(texts), self.seq_len), np.int32)
        mask = np.zeros((len(texts), self.seq_len), np.int32)
        for r, t in enumerate(texts):
            toks = [hash(w) % (self.vocab_size - 2) + 2 for w in t.split()][: self.seq_len - 1]
            toks = toks + [1]  # eos
            ids[r, : len(toks)] = toks
            mask[r, : len(toks)] = 1
        return ids, mask


@register(alias="sgm.modules.encoders.umt5.T5EncoderModel")
class T5EncoderModel:
    """Conditioner embedder wrapper (umt5.py:475-535): tokenize -> encode ->
    mask-zero.  Registered under the reference target so YAML configs work."""

    is_trainable = False
    ucg_rate = 0.0
    input_key = "txt"
    legacy_ucg_val = None

    def __init__(self, max_length: int = 512, checkpoint_path=None,
                 tokenizer_path=None, dtype="bfloat16", varlen_text=False,
                 uncond_text_length=1, **kw):
        self.config = UMT5Config(dtype="bfloat16" if "bf" in str(dtype) else "float32")
        self.max_length = max_length
        self.varlen_text = varlen_text
        self.cond_length_multiple = 1  # set by the engine for mp*sp shards
        self.uncond_text_length = uncond_text_length
        self.params = None
        self._encode = None
        import os

        if checkpoint_path and os.path.exists(str(checkpoint_path)):
            from scail_tpu.convert.torch_ckpt import load_torch_state_dict

            self.params = umt5_params_from_state_dict(
                load_torch_state_dict(checkpoint_path), self.config
            )
        self.tokenizer = None
        if tokenizer_path and os.path.exists(str(tokenizer_path)):
            try:
                from transformers import AutoTokenizer

                self.tokenizer = _HFTok(AutoTokenizer.from_pretrained(tokenizer_path),
                                        max_length)
            except Exception:
                self.tokenizer = None
        if self.tokenizer is None:
            self.tokenizer = _FallbackTokenizer(max_length)

    def init(self, key, cfg: UMT5Config = None):
        self.config = cfg or self.config
        self.params = init_umt5_params(key, self.config)
        return self.params

    def __call__(self, texts):
        ids, mask = self.tokenizer(texts, return_mask=True)
        if self._encode is None:
            self._encode = jax.jit(
                lambda p, i, m: umt5_encode(p, self.config, i, m)
            )
        z = self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask))
        if self.varlen_text:
            # trim to valid tokens padded to a multiple of the shard count
            # (umt5.py:524-535)
            assert z.shape[0] == 1
            num = int(np.asarray(mask)[0].sum())
            if num > 1:
                pad = (-num) % self.cond_length_multiple
            else:
                pad = self.uncond_text_length - num
            z = z[:, : num + pad]
        return z


class _HFTok:
    """HuggingfaceTokenizer equivalent with whitespace cleaning
    (sgm/modules/encoders/tokenizers.py)."""

    def __init__(self, tok, seq_len):
        self.tok = tok
        self.seq_len = seq_len

    @staticmethod
    def _clean(text: str) -> str:
        import html
        import re

        text = html.unescape(html.unescape(text))
        return re.sub(r"\s+", " ", text).strip()

    def __call__(self, texts, return_mask=True):
        texts = [self._clean(t) for t in texts]
        enc = self.tok(texts, padding="max_length", truncation=True,
                       max_length=self.seq_len, return_tensors="np")
        if return_mask:
            return enc["input_ids"], enc["attention_mask"]
        return enc["input_ids"]
