"""Model zoo (reference: sat/model/official/*, all 24 families).

The reference bundles a large pretrained-model zoo as SAT library
surface.  None of it sits on the SCAIL product path; this package
provides TPU-native functional equivalents for every family, each with
a from-reference/HF weight map and golden parity tests
(tests/test_zoo_models*.py): gpt, llama, t5 (full encoder-decoder),
vit, mixtral (sparse MoE + EP), bert/roberta, glm (ChatGLM4),
chatglm (v1), chatglm23 (v2/v3 MQA), glmblock (2D-position GLM),
glm130b, mae, yolos, gptneo, dpr, cait, eva2, evaclip, glm4v
(multimodal), cuda2d (CogView 2D local attention); CLIP lives in
models/clip_vit + models/clip_score, and distillation in
training/distill.py.
"""
