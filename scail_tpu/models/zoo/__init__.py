"""Model-zoo substrate (reference: sat/model/official/*).

The reference bundles a large pretrained-model zoo as SAT library surface
(GLM, LLaMA, GPT2, T5, ViT variants, ...).  None of it sits on the SCAIL
product path; this package provides the TPU-native substrate equivalents:

  * decoder-only LM with KV-cached generation (`zoo.gpt`) -- the
    CachedAutoregressiveMixin pattern (sat/model/cached_autoregressive_model.py)
  * encoder towers already live in scail_tpu.models (umt5 == T5 encoder
    family, clip_vit == ViT family)

Additional named architectures can be added as thin configs over these
blocks.
"""
