"""Original GLM with 2D block position encoding (reference:
sat/model/official/glm_model.py — a standard pre-LN SAT transformer plus
BlockPositionEmbeddingMixin: position_ids carry [positions; block
positions] and two learned tables are summed (:6-18)).  Output logits
are tied to the word embedding (SAT final_forward default).

Golden-tested against the reference's own torch module via
tests/refmods.py (tests/test_zoo_models_ref.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class GLMBlockConfig:
    vocab_size: int = 30592
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    inner_hidden_size: int = 4096
    max_len: int = 1025
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads


def glmblock_forward(params, cfg: GLMBlockConfig, tokens, position_ids,
                     mask=None):
    """tokens: (b, s); position_ids: (b, 2, s) = [positions; block
    positions] (glm_model.py:14-18).  mask: optional (b, s, s) additive
    0/1 attention mask (GLM blank-infilling); None = full attention.
    Returns logits (b, s, vocab) tied to the word embedding."""
    b, s = tokens.shape
    n, hd = cfg.num_heads, cfg.head_dim
    x = (params["tok"][tokens]
         + params["pos"][position_ids[:, 0]]
         + params["block_pos"][position_ids[:, 1]])

    bias = None
    if mask is not None:
        bias = jnp.where(mask[:, None] > 0, 0.0, -10000.0)

    for li in range(cfg.num_layers):
        p = jax.tree.map(lambda t: t[li], params["layers"])
        y = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps=cfg.eps)
        qkv = y @ p["qkv"]["kernel"] + p["qkv"]["bias"]
        q, k, v = [t.reshape(b, s, n, hd) for t in jnp.split(qkv, 3, -1)]
        logits = jnp.einsum("bqnd,bknd->bnqk", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, -1)
        x = x + (o @ p["dense"]["kernel"] + p["dense"]["bias"])
        y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps=cfg.eps)
        h = gelu_exact(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        x = x + (h @ p["fc2"]["kernel"] + p["fc2"]["bias"])

    x = layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"],
                   eps=cfg.eps)
    return x @ params["tok"].T


def glmblock_params_from_sat(sd, cfg: GLMBlockConfig):
    """Reference GLMModel (SAT) state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers
    t = "transformer.layers.{}"

    def stack_lin(fmt):
        return {"kernel": np.stack([g(fmt.format(i) + ".weight").T for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)])}

    def stack_ln(fmt):
        return {"scale": np.stack([g(fmt.format(i) + ".weight") for i in range(L)]),
                "bias": np.stack([g(fmt.format(i) + ".bias") for i in range(L)])}

    return {
        "tok": g("transformer.word_embeddings.weight"),
        "pos": g("transformer.position_embeddings.weight"),
        "block_pos": g("mixins.block_position_embedding.block_position_embeddings.weight"),
        "layers": {
            "ln1": stack_ln(t + ".input_layernorm"),
            "qkv": stack_lin(t + ".attention.query_key_value"),
            "dense": stack_lin(t + ".attention.dense"),
            "ln2": stack_ln(t + ".post_attention_layernorm"),
            "fc1": stack_lin(t + ".mlp.dense_h_to_4h"),
            "fc2": stack_lin(t + ".mlp.dense_4h_to_h"),
        },
        "final_ln": {"scale": g("transformer.final_layernorm.weight"),
                     "bias": g("transformer.final_layernorm.bias")},
    }
