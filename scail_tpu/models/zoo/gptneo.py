"""GPT-Neo decoder LM (reference: sat/model/official/gptneo_model.py —
pre-LN GPT with learned positions, alternating global/local (sliding
window) causal attention, UNSCALED fp32 qk logits, gelu-tanh MLP, tied
LM head).

Weight ingestion uses the HF `GPTNeoForCausalLM` naming
(`gptneo_params_from_hf`); golden-tested against transformers' GPT-Neo
in tests/test_zoo_models.py.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_tanh, normal_init
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class GPTNeoConfig:
    vocab_size: int = 50257
    dim: int = 2048
    num_layers: int = 24
    num_heads: int = 16
    inner_hidden_size: int = 8192
    max_len: int = 2048
    window_size: int = 256
    attention_pattern: Tuple[str, ...] = ("global", "local")
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    def layer_type(self, li: int) -> str:
        return self.attention_pattern[li % len(self.attention_pattern)]


def init_gptneo_params(key, cfg: GPTNeoConfig):
    L, d, f = cfg.num_layers, cfg.dim, cfg.inner_hidden_size
    ks = iter(jax.random.split(key, 16))

    def lin(k, din, dout, bias=True):
        p = {"kernel": 0.02 * jax.random.normal(k, (L, din, dout))}
        if bias:
            p["bias"] = jnp.zeros((L, dout))
        return p

    def ln():
        return {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))}

    return {
        "wte": normal_init(next(ks), (cfg.vocab_size, d)),
        "wpe": normal_init(next(ks), (cfg.max_len, d)),
        "layers": {
            "ln1": ln(),
            "q": lin(next(ks), d, d, bias=False),
            "k": lin(next(ks), d, d, bias=False),
            "v": lin(next(ks), d, d, bias=False),
            "o": lin(next(ks), d, d),
            "ln2": ln(),
            "fc1": lin(next(ks), d, f),
            "fc2": lin(next(ks), f, d),
        },
        "ln_f": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }


def gptneo_forward(params, cfg: GPTNeoConfig, tokens):
    """tokens: (b, s) -> logits (b, s, vocab); LM head tied to wte."""
    b, s = tokens.shape
    n, hd = cfg.num_heads, cfg.head_dim
    pos = jnp.arange(s)
    x = params["wte"][tokens] + params["wpe"][pos][None]

    q_idx = pos[:, None]
    k_idx = pos[None, :]
    causal = k_idx <= q_idx
    local = causal & (k_idx > q_idx - cfg.window_size)
    masks = {
        "global": jnp.where(causal, 0.0, -1e9)[None, None],
        "local": jnp.where(local, 0.0, -1e9)[None, None],
    }

    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda p: p[li], params["layers"])
        y = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps=cfg.eps)
        q = (y @ lp["q"]["kernel"]).reshape(b, s, n, hd)
        k = (y @ lp["k"]["kernel"]).reshape(b, s, n, hd)
        v = (y @ lp["v"]["kernel"]).reshape(b, s, n, hd)
        # GPT-Neo: fp32 logits, NO 1/sqrt(d) scaling
        logits = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
        logits = logits + masks[cfg.layer_type(li)]
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, -1)
        x = x + (o @ lp["o"]["kernel"] + lp["o"]["bias"])
        y = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps=cfg.eps)
        h = gelu_tanh(y @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
        x = x + (h @ lp["fc2"]["kernel"] + lp["fc2"]["bias"])

    x = layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"],
                   eps=cfg.eps)
    return x @ params["wte"].T


def gptneo_params_from_hf(sd, cfg: GPTNeoConfig):
    """HF GPTNeoForCausalLM state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers
    h = "transformer.h.{}"

    def stack(fmt, bias=True):
        p = {"kernel": np.stack(
            [g(fmt.format(i) + ".weight").T for i in range(L)])}
        if bias:
            p["bias"] = np.stack([g(fmt.format(i) + ".bias") for i in range(L)])
        return p

    def ln(fmt):
        return {"scale": np.stack([g(fmt.format(i) + ".weight") for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)])}

    return {
        "wte": g("transformer.wte.weight"),
        "wpe": g("transformer.wpe.weight"),
        "layers": {
            "ln1": ln(h + ".ln_1"),
            "q": stack(h + ".attn.attention.q_proj", bias=False),
            "k": stack(h + ".attn.attention.k_proj", bias=False),
            "v": stack(h + ".attn.attention.v_proj", bias=False),
            "o": stack(h + ".attn.attention.out_proj"),
            "ln2": ln(h + ".ln_2"),
            "fc1": stack(h + ".mlp.c_fc"),
            "fc2": stack(h + ".mlp.c_proj"),
        },
        "ln_f": {"scale": g("transformer.ln_f.weight"),
                 "bias": g("transformer.ln_f.bias")},
    }
