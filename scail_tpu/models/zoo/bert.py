"""BERT / RoBERTa encoders (reference: sat/model/official/bert_model.py
and roberta_model.py — post-LN transformer encoder with token-type
embeddings, gelu MLPs, and a tanh pooler).  HF `BertModel`/`RobertaModel`
weight naming; golden-tested against transformers in
tests/test_zoo_models.py.

RoBERTa differs from BERT only in its position-id scheme
(mask-derived, offset past padding_idx) and checkpoint prefix; it is a
config flag over the same forward (roberta_model.py subclasses
bert_model.py the same way).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.models.common import gelu_exact
from scail_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    inner_hidden_size: int = 3072
    max_len: int = 512
    type_vocab_size: int = 2
    eps: float = 1e-12
    position_style: str = "bert"   # "roberta": mask-derived, pad-offset
    pad_token_id: int = 1          # roberta padding_idx


def bert_trunk(params, cfg: BertConfig, ids, mask=None, token_type_ids=None):
    """Encoder trunk only: ids/mask (b, s) -> sequence output (b, s, d).
    Shared by BERT/RoBERTa (with pooler) and DPR (cls embedding)."""
    b, s = ids.shape
    n, hd = cfg.num_heads, cfg.dim // cfg.num_heads
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(ids)
    if cfg.position_style == "roberta":
        # create_position_ids_from_input_ids: consecutive ids for non-pad
        # tokens, starting at padding_idx+1; pads get padding_idx
        nonpad = (ids != cfg.pad_token_id).astype(jnp.int32)
        pos_ids = jnp.cumsum(nonpad, axis=1) * nonpad + cfg.pad_token_id
        pos = params["pos"][pos_ids]
    else:
        pos = params["pos"][jnp.arange(s)][None]
    x = params["tok"][ids] + pos + params["type"][token_type_ids]
    x = layer_norm(x, params["emb_ln"]["scale"], params["emb_ln"]["bias"],
                   eps=cfg.eps)
    if mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)

    def block(x, p):
        q = (x @ p["q"]["kernel"] + p["q"]["bias"]).reshape(b, s, n, hd)
        k = (x @ p["k"]["kernel"] + p["k"]["bias"]).reshape(b, s, n, hd)
        v = (x @ p["v"]["kernel"] + p["v"]["bias"]).reshape(b, s, n, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, -1)
        # post-LN (bert): LN(x + sublayer(x))
        x = layer_norm(x + (o @ p["ao"]["kernel"] + p["ao"]["bias"]),
                       p["ln1"]["scale"], p["ln1"]["bias"], eps=cfg.eps)
        h = gelu_exact(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        x = layer_norm(x + (h @ p["fc2"]["kernel"] + p["fc2"]["bias"]),
                       p["ln2"]["scale"], p["ln2"]["bias"], eps=cfg.eps)
        return x, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    return x


def bert_forward(params, cfg: BertConfig, ids, mask=None, token_type_ids=None):
    """ids/mask: (b, s).  Returns (sequence_output (b, s, d),
    pooled_output (b, d))."""
    x = bert_trunk(params, cfg, ids, mask, token_type_ids)
    pooled = jnp.tanh(x[:, 0] @ params["pooler"]["kernel"]
                      + params["pooler"]["bias"])
    return x, pooled


def init_bert_params(key, cfg: BertConfig):
    ks = iter(jax.random.split(key, 24))
    L, d, f = cfg.num_layers, cfg.dim, cfg.inner_hidden_size

    def lin(L_, din, dout):
        return {"kernel": 0.02 * jax.random.normal(next(ks), (L_, din, dout)
                                                   if L_ else (din, dout)),
                "bias": jnp.zeros((L_, dout) if L_ else (dout,))}

    def ln(L_, d_):
        shape = (L_, d_) if L_ else (d_,)
        return {"scale": jnp.ones(shape), "bias": jnp.zeros(shape)}

    return {
        "tok": 0.02 * jax.random.normal(next(ks), (cfg.vocab_size, d)),
        "pos": 0.02 * jax.random.normal(next(ks), (cfg.max_len, d)),
        "type": 0.02 * jax.random.normal(next(ks), (cfg.type_vocab_size, d)),
        "emb_ln": ln(0, d),
        "layers": {
            "q": lin(L, d, d), "k": lin(L, d, d), "v": lin(L, d, d),
            "ao": lin(L, d, d), "ln1": ln(L, d),
            "fc1": lin(L, d, f), "fc2": lin(L, f, d), "ln2": ln(L, d),
        },
        "pooler": lin(0, d, d),
    }


def bert_params_from_hf(sd, cfg: BertConfig):
    """HF BertModel state dict -> pytree."""
    g = lambda k: np.asarray(sd[k])
    L = cfg.num_layers
    e = "encoder.layer.{}"

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

    return {
        "tok": g("embeddings.word_embeddings.weight"),
        "pos": g("embeddings.position_embeddings.weight"),
        "type": g("embeddings.token_type_embeddings.weight"),
        "emb_ln": {"scale": g("embeddings.LayerNorm.weight"),
                   "bias": g("embeddings.LayerNorm.bias")},
        "layers": {
            "q": stack_lin(e + ".attention.self.query"),
            "k": stack_lin(e + ".attention.self.key"),
            "v": stack_lin(e + ".attention.self.value"),
            "ao": stack_lin(e + ".attention.output.dense"),
            "ln1": stack_ln(e + ".attention.output.LayerNorm"),
            "fc1": stack_lin(e + ".intermediate.dense"),
            "fc2": stack_lin(e + ".output.dense"),
            "ln2": stack_ln(e + ".output.LayerNorm"),
        },
        "pooler": {"kernel": g("pooler.dense.weight").T,
                   "bias": g("pooler.dense.bias")},
    }


def roberta_params_from_hf(sd, cfg: BertConfig):
    """HF RobertaModel state dict -> pytree (same layout as BERT with the
    'roberta.'-less module names; HF drops the prefix in RobertaModel's
    own state dict, so this is a thin alias kept for symmetry and for
    state dicts saved from RobertaForSequenceClassification etc.)."""
    stripped = {}
    for k, v in sd.items():
        stripped[k[len("roberta."):] if k.startswith("roberta.") else k] = v
    return bert_params_from_hf(stripped, cfg)
