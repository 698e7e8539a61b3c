"""DPR dense-passage-retrieval encoders and reader (reference:
sat/model/official/dpr_model.py — BERT trunks with a cls-embedding final
(DPREncoderFinalMixin :5-11), optional projection, and a reader with
start/end/relevance heads (DPRReaderFinalMixin :13-42)).

Weight ingestion uses the HF `DPRQuestionEncoder` / `DPRContextEncoder` /
`DPRReader` naming; golden-tested against transformers in
tests/test_zoo_models.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from scail_tpu.models.zoo.bert import (BertConfig, bert_params_from_hf,
                                       bert_trunk)


@dataclasses.dataclass(frozen=True)
class DPRConfig:
    bert: BertConfig = BertConfig()
    projection_dim: int = 0


def dpr_encode(params, cfg: DPRConfig, ids, mask=None, token_type_ids=None):
    """Question/context encoder: -> (b, d) cls embedding (+ optional
    projection), DPREncoderFinalMixin semantics."""
    x = bert_trunk(params["bert"], cfg.bert, ids, mask, token_type_ids)
    out = x[:, 0]
    if cfg.projection_dim:
        out = out @ params["proj"]["kernel"] + params["proj"]["bias"]
    return out


def dpr_read(params, cfg: DPRConfig, ids, mask=None):
    """Reader: -> (start_logits (b, s), end_logits (b, s),
    relevance_logits (b,)), DPRReaderFinalMixin semantics."""
    x = bert_trunk(params["bert"], cfg.bert, ids, mask)
    qa = x @ params["qa_outputs"]["kernel"] + params["qa_outputs"]["bias"]
    start, end = qa[..., 0], qa[..., 1]
    rel = (x[:, 0] @ params["qa_classifier"]["kernel"]
           + params["qa_classifier"]["bias"])[..., 0]
    return start, end, rel


def _strip(sd, prefix):
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def dpr_encoder_params_from_hf(sd, cfg: DPRConfig, tower="question_encoder"):
    """HF DPRQuestionEncoder/DPRContextEncoder state dict -> pytree.
    The HF trunk is a BertModel without pooler under
    `<tower>.bert_model.`."""
    trunk_sd = _strip(sd, f"{tower}.bert_model.")
    # bert_params_from_hf expects a pooler; DPR has none -> synthesize
    d = cfg.bert.dim
    trunk_sd.setdefault("pooler.dense.weight", np.zeros((d, d), np.float32))
    trunk_sd.setdefault("pooler.dense.bias", np.zeros((d,), np.float32))
    p = {"bert": bert_params_from_hf(trunk_sd, cfg.bert)}
    if cfg.projection_dim:
        p["proj"] = {"kernel": np.asarray(sd[f"{tower}.encode_proj.weight"]).T,
                     "bias": np.asarray(sd[f"{tower}.encode_proj.bias"])}
    return p


def dpr_reader_params_from_hf(sd, cfg: DPRConfig):
    """HF DPRReader state dict -> pytree."""
    trunk_sd = _strip(sd, "span_predictor.encoder.bert_model.")
    d = cfg.bert.dim
    trunk_sd.setdefault("pooler.dense.weight", np.zeros((d, d), np.float32))
    trunk_sd.setdefault("pooler.dense.bias", np.zeros((d,), np.float32))
    return {
        "bert": bert_params_from_hf(trunk_sd, cfg.bert),
        "qa_outputs": {"kernel": np.asarray(sd["span_predictor.qa_outputs.weight"]).T,
                       "bias": np.asarray(sd["span_predictor.qa_outputs.bias"])},
        "qa_classifier": {"kernel": np.asarray(sd["span_predictor.qa_classifier.weight"]).T,
                          "bias": np.asarray(sd["span_predictor.qa_classifier.bias"])},
    }
