"""Model-zoo breadth (VERDICT r1 item 8): LLaMA / T5 / ViT golden parity
vs HF transformers (tiny random configs through the HF-name converters),
plus prefix-tuning semantics on the GPT/LLaMA substrates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _sd(m):
    return {k: v.detach().float().numpy() for k, v in m.state_dict().items()}


# ---------------------------------------------------------------------------
# LLaMA
# ---------------------------------------------------------------------------
def test_llama_golden_vs_hf():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    from scail_tpu.models.zoo.llama import (LlamaConfig, llama_forward,
                                            llama_params_from_hf)

    hf_cfg = HFLlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(vocab_size=96, dim=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, inner_hidden_size=48, max_len=32)
    params = llama_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, (2, 9)).astype(np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_llama_cached_decode_matches_full(rng):
    from scail_tpu.models.zoo.llama import (LlamaConfig, init_llama_cache,
                                            init_llama_params, llama_forward)

    cfg = LlamaConfig(vocab_size=64, dim=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, inner_hidden_size=48, max_len=16)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)

    full, _ = llama_forward(params, cfg, toks)
    cache = init_llama_cache(cfg, 2)
    out, cache = llama_forward(params, cfg, toks[:, :5], cache)
    chunks = [out]
    for i in range(5, 8):
        out, cache = llama_forward(params, cfg, toks[:, i : i + 1], cache)
        chunks.append(out)
    inc = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# T5
# ---------------------------------------------------------------------------
def test_t5_golden_vs_hf():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from scail_tpu.models.zoo.t5 import T5Config, t5_forward, t5_params_from_hf

    hf_cfg = HFT5Config(
        vocab_size=80, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0)
    torch.manual_seed(1)
    hf = T5ForConditionalGeneration(hf_cfg).eval()

    cfg = T5Config(vocab_size=80, dim=32, dim_kv=8, num_heads=4,
                   inner_hidden_size=48, num_layers=2, num_decoder_layers=2,
                   num_buckets=8, max_distance=32, gated_mlp=True,
                   tie_word_embeddings=False)
    params = t5_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 80, (2, 11)).astype(np.int64)
    mask = np.ones((2, 11), np.int64)
    mask[1, 7:] = 0
    dec = rng.integers(0, 80, (2, 5)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask),
                  decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    got = t5_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                     jnp.asarray(mask, jnp.int32), jnp.asarray(dec, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------
def test_vit_golden_vs_hf():
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTForImageClassification

    from scail_tpu.models.zoo.vit import ViTConfig, vit_forward, vit_params_from_hf

    hf_cfg = HFViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, image_size=32, patch_size=16,
        num_labels=7, hidden_act="gelu", layer_norm_eps=1e-12,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(2)
    hf = ViTForImageClassification(hf_cfg).eval()

    cfg = ViTConfig(image_size=32, patch_size=16, dim=32, num_heads=4,
                    num_layers=2, inner_hidden_size=48, num_classes=7)
    params = vit_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(imgs)).logits.numpy()
    got = vit_forward(params, cfg, imgs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# prefix tuning
# ---------------------------------------------------------------------------
def test_prefix_tuning_semantics(rng):
    """Prefix KV concat == manual attention over extended KV; prefix-only
    optimizer freezes the base."""
    import optax

    from scail_tpu.models.zoo.gpt import GPTConfig, gpt_forward, init_gpt_params
    from scail_tpu.training.prefix_tuning import (init_prefix_params,
                                                  prefix_only_optimizer)

    cfg = GPTConfig(vocab_size=50, dim=16, num_heads=2, num_layers=2, max_len=12)
    base = init_gpt_params(jax.random.PRNGKey(0), cfg)
    prefix = init_prefix_params(jax.random.PRNGKey(1), cfg.num_layers,
                                cfg.num_heads, 3, cfg.head_dim)
    toks = jnp.asarray(rng.integers(0, 50, (2, 6)), jnp.int32)

    out_base, _ = gpt_forward(base, cfg, toks)
    out_pref, _ = gpt_forward(base, cfg, toks, prefix=prefix)
    assert out_pref.shape == out_base.shape
    assert float(jnp.max(jnp.abs(out_pref - out_base))) > 1e-6

    # gradient routing: only the prefix trains (requires_grad surgery
    # equivalent of the reference finetune flow)
    tree = {"base": base, "prefix": prefix}
    tx = prefix_only_optimizer(optax.sgd(0.1))
    opt_state = tx.init(tree)

    def loss(t):
        out, _ = gpt_forward(t["base"], cfg, toks, prefix=t["prefix"])
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(tree)
    updates, _ = tx.update(grads, opt_state, tree)
    new = optax.apply_updates(tree, updates)
    # base frozen, prefix updated
    db = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
        lambda x, y: float(jnp.sum(jnp.abs(x - y))), new["base"], base))
    assert db == 0.0
    assert float(jnp.sum(jnp.abs(new["prefix"] - prefix))) > 0.0


def test_prefix_tuning_cached_decode_matches_full(rng):
    from scail_tpu.models.zoo.llama import (LlamaConfig, init_llama_cache,
                                            init_llama_params, llama_forward)
    from scail_tpu.training.prefix_tuning import init_prefix_params

    cfg = LlamaConfig(vocab_size=40, dim=16, num_layers=2, num_heads=4,
                      num_kv_heads=2, inner_hidden_size=24, max_len=10)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    prefix = init_prefix_params(jax.random.PRNGKey(1), cfg.num_layers,
                                cfg.num_kv_heads, 2, cfg.head_dim)
    toks = jnp.asarray(rng.integers(0, 40, (1, 6)), jnp.int32)

    full, _ = llama_forward(params, cfg, toks, prefix=prefix)
    cache = init_llama_cache(cfg, 1)
    out, cache = llama_forward(params, cfg, toks[:, :4], cache, prefix=prefix)
    chunks = [out]
    for i in range(4, 6):
        out, cache = llama_forward(params, cfg, toks[:, i : i + 1], cache,
                                   prefix=prefix)
        chunks.append(out)
    inc = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Mixtral (sparse MoE over the llama substrate)
# ---------------------------------------------------------------------------
def test_mixtral_golden_vs_hf():
    from transformers import MixtralConfig as HFMixtralConfig
    from transformers import MixtralForCausalLM

    from scail_tpu.models.zoo.mixtral import (MixtralConfig, mixtral_forward,
                                              mixtral_params_from_hf)

    hf_cfg = HFMixtralConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=32, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_dropout=0.0, output_router_logits=False)
    torch.manual_seed(3)
    hf = MixtralForCausalLM(hf_cfg).eval()

    cfg = MixtralConfig(vocab_size=96, dim=32, num_layers=2, num_heads=4,
                        num_kv_heads=2, inner_hidden_size=48, num_experts=4,
                        top_k=2, max_len=32, rope_theta=10000.0)
    params = mixtral_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 96, (2, 9)).astype(np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got = mixtral_forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_mixtral_ep_sharded_matches(rng):
    """Expert-parallel sharding over 'model' == replicated forward."""
    from scail_tpu.models.zoo.mixtral import (MixtralConfig, init_mixtral_params,
                                              mixtral_forward,
                                              mixtral_param_rules)
    from scail_tpu.parallel.mesh import MeshSpec, make_mesh
    from scail_tpu.parallel.sharding import shard_tree

    cfg = MixtralConfig(vocab_size=64, dim=32, num_layers=2, num_heads=4,
                        num_kv_heads=2, inner_hidden_size=48, num_experts=4,
                        top_k=2, max_len=16)
    params = init_mixtral_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)
    want = np.asarray(mixtral_forward(params, cfg, ids))

    mesh = make_mesh(MeshSpec(data=1, seq=1, model=4),
                     devices=jax.devices()[:4])
    sp = shard_tree(params, mixtral_param_rules(), mesh)
    assert sp["layers"]["moe_w1"]["kernel"].sharding.spec[1] == "model"
    got = np.asarray(jax.jit(lambda p, i: mixtral_forward(p, cfg, i))(sp, ids))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# adapters + mlp head
# ---------------------------------------------------------------------------
def test_adapters_near_identity_and_gradient_routing(rng):
    import optax

    from scail_tpu.models.zoo.gpt import GPTConfig, gpt_forward, init_gpt_params
    from scail_tpu.training.adapters import (adapters_only_optimizer,
                                             init_adapter_params)

    cfg = GPTConfig(vocab_size=50, dim=16, num_heads=2, num_layers=2, max_len=12)
    base = init_gpt_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray(rng.integers(0, 50, (2, 6)), jnp.int32)

    # tiny-init adapters barely perturb the base function (adapter.py reinit)
    ad = init_adapter_params(jax.random.PRNGKey(1), cfg.num_layers, cfg.dim, 8)
    out_base, _ = gpt_forward(base, cfg, toks)
    out_ad, _ = gpt_forward(base, cfg, toks, adapters=ad)
    assert float(jnp.max(jnp.abs(out_ad - out_base))) < 1e-2

    tree = {"base": base, "adapters": ad}
    tx = adapters_only_optimizer(optax.sgd(0.1))
    st = tx.init(tree)

    def loss(t):
        out, _ = gpt_forward(t["base"], cfg, toks, adapters=t["adapters"])
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(tree)
    new = optax.apply_updates(tree, tx.update(grads, st, tree)[0])
    db = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
        lambda x, y: float(jnp.sum(jnp.abs(x - y))), new["base"], base))
    da = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
        lambda x, y: float(jnp.sum(jnp.abs(x - y))), new["adapters"], ad))
    assert db == 0.0 and da > 0.0


def test_mlp_head(rng):
    from scail_tpu.training.adapters import init_mlp_head_params, mlp_head

    head = init_mlp_head_params(jax.random.PRNGKey(0), 16, 8, 3)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    out = mlp_head(head, x)
    assert out.shape == (4, 3)
    want = np.maximum(np.asarray(x) @ np.asarray(head[0]["kernel"]), 0.0)
    want = want @ np.asarray(head[1]["kernel"])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------
def test_bert_golden_vs_hf():
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    from scail_tpu.models.zoo.bert import (BertConfig, bert_forward,
                                           bert_params_from_hf)

    hf_cfg = HFBertConfig(
        vocab_size=90, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=24, type_vocab_size=2, hidden_act="gelu",
        layer_norm_eps=1e-12, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(4)
    hf = BertModel(hf_cfg).eval()

    cfg = BertConfig(vocab_size=90, dim=32, num_heads=4, num_layers=2,
                     inner_hidden_size=48, max_len=24, type_vocab_size=2)
    params = bert_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(4)
    ids = rng.integers(0, 90, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0
    tt = rng.integers(0, 2, (2, 10)).astype(np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask),
                 token_type_ids=torch.from_numpy(tt))
        want_seq = out.last_hidden_state.numpy()
        want_pool = out.pooler_output.numpy()
    got_seq, got_pool = bert_forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(tt, jnp.int32))
    # masked positions may differ (HF still computes them); compare valid
    m = mask[:, :, None]
    np.testing.assert_allclose(np.asarray(got_seq) * m, want_seq * m,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_pool), want_pool,
                               rtol=2e-4, atol=2e-4)


def test_t5_greedy_decode_matches_hf_generate():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from scail_tpu.models.zoo.t5 import (T5Config, t5_greedy_decode,
                                         t5_params_from_hf)

    hf_cfg = HFT5Config(
        vocab_size=80, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=0)
    torch.manual_seed(5)
    hf = T5ForConditionalGeneration(hf_cfg).eval()

    cfg = T5Config(vocab_size=80, dim=32, dim_kv=8, num_heads=4,
                   inner_hidden_size=48, num_layers=2, num_decoder_layers=2,
                   num_buckets=8, max_distance=32, gated_mlp=True,
                   tie_word_embeddings=False)
    params = t5_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(5)
    ids = rng.integers(2, 80, (2, 7)).astype(np.int64)
    mask = np.ones((2, 7), np.int64)
    with torch.no_grad():
        want = hf.generate(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            max_new_tokens=6, do_sample=False, num_beams=1).numpy()
    got = t5_greedy_decode(params, cfg, jnp.asarray(ids, jnp.int32),
                           jnp.asarray(mask, jnp.int32), 6, start_token_id=0,
                           eos_token_id=1)
    # HF prepends the decoder start token; compare generated portions up to
    # the shared length
    n = min(got.shape[1], want.shape[1] - 1)
    np.testing.assert_array_equal(np.asarray(got)[:, :n], want[:, 1 : 1 + n])


# ---------------------------------------------------------------------------
# GLM (ChatGLM4-style: partial interleaved rotary, fused gate_up, GQA)
# ---------------------------------------------------------------------------
def test_glm_golden_vs_hf():
    from transformers import GlmConfig as HFGlmConfig
    from transformers import GlmForCausalLM

    from scail_tpu.models.zoo.glm import (GlmConfig, glm_forward,
                                          glm_params_from_hf)

    hf_cfg = HFGlmConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, partial_rotary_factor=0.5, max_position_embeddings=32,
        rms_norm_eps=1.5625e-07, rope_theta=10000.0, attention_bias=True,
        attention_dropout=0.0, tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(4)
    hf = GlmForCausalLM(hf_cfg).eval()

    cfg = GlmConfig(vocab_size=96, dim=32, num_layers=2, num_heads=4,
                    num_kv_heads=2, head_dim=8, inner_hidden_size=48,
                    max_len=32)
    params = glm_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(4)
    ids = rng.integers(0, 96, (2, 9)).astype(np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = glm_forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_glm_cached_decode_matches_full(rng):
    from scail_tpu.models.zoo.glm import (GlmConfig, glm_forward,
                                          init_glm_cache, init_glm_params)

    cfg = GlmConfig(vocab_size=64, dim=32, num_layers=2, num_heads=4,
                    num_kv_heads=2, head_dim=8, inner_hidden_size=48,
                    max_len=16)
    params = init_glm_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)

    full, _ = glm_forward(params, cfg, toks)
    cache = init_glm_cache(cfg, 2)
    out, cache = glm_forward(params, cfg, toks[:, :5], cache)
    chunks = [out]
    for i in range(5, 8):
        out, cache = glm_forward(params, cfg, toks[:, i : i + 1], cache)
        chunks.append(out)
    inc = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# MAE (masked autoencoder over the ViT substrate)
# ---------------------------------------------------------------------------
def test_mae_golden_vs_hf():
    from transformers import ViTMAEConfig, ViTMAEForPreTraining

    from scail_tpu.models.zoo.mae import (MAEConfig, mae_forward, mae_loss,
                                          mae_params_from_hf)

    hf_cfg = ViTMAEConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, image_size=32, patch_size=8, num_channels=3,
        decoder_hidden_size=24, decoder_num_hidden_layers=2,
        decoder_num_attention_heads=4, decoder_intermediate_size=40,
        mask_ratio=0.75, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, norm_pix_loss=False)
    torch.manual_seed(5)
    hf = ViTMAEForPreTraining(hf_cfg).eval()

    cfg = MAEConfig(image_size=32, patch_size=8, dim=32, num_heads=4,
                    num_layers=2, inner_hidden_size=48, decoder_dim=24,
                    decoder_num_heads=4, decoder_num_layers=2,
                    decoder_inner_hidden_size=40, mask_ratio=0.75)
    params = mae_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(5)
    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    noise = rng.random((2, cfg.num_patches)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(imgs), noise=torch.from_numpy(noise))
    logits, mask, _ = mae_forward(params, cfg, jnp.asarray(imgs),
                                  jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mask), out.mask.numpy())
    loss = mae_loss(params, cfg, jnp.asarray(imgs), jnp.asarray(noise))
    np.testing.assert_allclose(float(loss), float(out.loss), rtol=1e-4)


# ---------------------------------------------------------------------------
# YOLOS (detection tokens + mid position embeddings + DETR heads)
# ---------------------------------------------------------------------------
def test_yolos_golden_vs_hf():
    from transformers import YolosConfig as HFYolosConfig
    from transformers import YolosForObjectDetection

    from scail_tpu.models.zoo.yolos import (YolosConfig, yolos_forward,
                                            yolos_params_from_hf)

    hf_cfg = HFYolosConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, image_size=[32, 48], patch_size=16,
        num_detection_tokens=5, use_mid_position_embeddings=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(6)
    hf = YolosForObjectDetection(hf_cfg).eval()

    cfg = YolosConfig(image_size=(32, 48), patch_size=16, dim=32,
                      num_heads=4, num_layers=2, inner_hidden_size=48,
                      num_detection_tokens=5)
    params = yolos_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(6)
    # native size (no pos-embed interpolation)
    imgs = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(imgs))
    logits, boxes = yolos_forward(params, cfg, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(boxes), out.pred_boxes.numpy(),
                               rtol=2e-4, atol=2e-4)

    # larger input exercises the bicubic pos-embed interpolation path
    imgs2 = rng.standard_normal((1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        out2 = hf(torch.from_numpy(imgs2))
    logits2, boxes2 = yolos_forward(params, cfg, jnp.asarray(imgs2))
    np.testing.assert_allclose(np.asarray(logits2), out2.logits.numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(boxes2), out2.pred_boxes.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_t5_cached_decode_matches_full(rng):
    from scail_tpu.models.zoo.t5 import (T5Config, init_t5_cache,
                                         init_t5_params, t5_decode,
                                         t5_decode_cached, t5_encode)

    cfg = T5Config(vocab_size=80, dim=32, dim_kv=8, num_heads=4,
                   inner_hidden_size=48, num_layers=2, num_decoder_layers=2,
                   num_buckets=8, max_distance=16)
    params = init_t5_params(jax.random.PRNGKey(1), cfg)
    ids = jnp.asarray(rng.integers(0, 80, (2, 7)), jnp.int32)
    mask = jnp.ones_like(ids)
    dec_ids = jnp.asarray(rng.integers(0, 80, (2, 6)), jnp.int32)

    enc = t5_encode(params, cfg, ids, mask)
    full = t5_decode(params, cfg, dec_ids, enc, mask)

    cache = init_t5_cache(params, cfg, enc, max_len=8)
    out, cache = t5_decode_cached(params, cfg, dec_ids[:, :3], cache, mask)
    chunks = [out]
    for i in range(3, 6):
        out, cache = t5_decode_cached(params, cfg, dec_ids[:, i : i + 1],
                                      cache, mask)
        chunks.append(out)
    inc = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# RoBERTa (position-id scheme over the BERT substrate)
# ---------------------------------------------------------------------------
def test_roberta_golden_vs_hf():
    from transformers import RobertaConfig as HFRobertaConfig
    from transformers import RobertaModel

    from scail_tpu.models.zoo.bert import (BertConfig, bert_forward,
                                           roberta_params_from_hf)

    hf_cfg = HFRobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=34, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu", layer_norm_eps=1e-12,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(7)
    hf = RobertaModel(hf_cfg).eval()

    cfg = BertConfig(vocab_size=100, dim=32, num_heads=4, num_layers=2,
                     inner_hidden_size=48, max_len=34, type_vocab_size=1,
                     position_style="roberta", pad_token_id=1)
    params = roberta_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(7)
    ids = rng.integers(2, 100, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    ids[1, 6:] = 1   # padding
    mask[1, 6:] = 0
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    seq, pooled = bert_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(seq)[0], out.last_hidden_state.numpy()[0],
                               rtol=2e-4, atol=2e-4)
    # padded positions differ only where masked-out; compare valid region
    np.testing.assert_allclose(np.asarray(seq)[1, :6],
                               out.last_hidden_state.numpy()[1, :6],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# GPT-Neo (alternating global/local causal attention, unscaled qk)
# ---------------------------------------------------------------------------
def test_gptneo_golden_vs_hf():
    from transformers import GPTNeoConfig as HFGPTNeoConfig
    from transformers import GPTNeoForCausalLM

    from scail_tpu.models.zoo.gptneo import (GPTNeoConfig, gptneo_forward,
                                             gptneo_params_from_hf)

    hf_cfg = HFGPTNeoConfig(
        vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=48, max_position_embeddings=32,
        attention_types=[[["global", "local"], 1]], window_size=4,
        activation_function="gelu_new", attention_dropout=0.0,
        resid_dropout=0.0, embed_dropout=0.0)
    torch.manual_seed(8)
    hf = GPTNeoForCausalLM(hf_cfg).eval()

    cfg = GPTNeoConfig(vocab_size=96, dim=32, num_layers=2, num_heads=4,
                       inner_hidden_size=48, max_len=32, window_size=4)
    params = gptneo_params_from_hf(_sd(hf), cfg)

    rng = np.random.default_rng(8)
    # seq > window_size so the local mask actually bites
    ids = rng.integers(0, 96, (2, 12)).astype(np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got = gptneo_forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# DPR (question/context encoders + reader over the BERT substrate)
# ---------------------------------------------------------------------------
def test_dpr_golden_vs_hf():
    from transformers import DPRConfig as HFDPRConfig
    from transformers import DPRQuestionEncoder, DPRReader

    from scail_tpu.models.zoo.bert import BertConfig
    from scail_tpu.models.zoo.dpr import (DPRConfig, dpr_encode,
                                          dpr_encoder_params_from_hf,
                                          dpr_read, dpr_reader_params_from_hf)

    hf_cfg = HFDPRConfig(
        vocab_size=90, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=32, type_vocab_size=2, projection_dim=12,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(9)
    q_enc = DPRQuestionEncoder(hf_cfg).eval()

    cfg = DPRConfig(bert=BertConfig(vocab_size=90, dim=32, num_heads=4,
                                    num_layers=2, inner_hidden_size=48,
                                    max_len=32, type_vocab_size=2),
                    projection_dim=12)
    params = dpr_encoder_params_from_hf(_sd(q_enc), cfg)

    rng = np.random.default_rng(9)
    ids = rng.integers(0, 90, (2, 8)).astype(np.int64)
    mask = np.ones((2, 8), np.int64)
    mask[1, 5:] = 0
    with torch.no_grad():
        want = q_enc(torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask)).pooler_output.numpy()
    got = dpr_encode(params, cfg, jnp.asarray(ids, jnp.int32),
                     jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    # reader heads
    torch.manual_seed(10)
    hf_cfg0 = HFDPRConfig(
        vocab_size=90, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=32, type_vocab_size=2, projection_dim=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    reader = DPRReader(hf_cfg0).eval()
    cfg0 = DPRConfig(bert=cfg.bert, projection_dim=0)
    rparams = dpr_reader_params_from_hf(_sd(reader), cfg0)
    with torch.no_grad():
        out = reader(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    start, end, rel = dpr_read(rparams, cfg0, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(start), out.start_logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(end), out.end_logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rel), out.relevance_logits.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# distillation wrapper
# ---------------------------------------------------------------------------
def test_distill_pair_freezes_teacher(rng):
    import optax

    from scail_tpu.models.zoo.gpt import GPTConfig, gpt_forward, init_gpt_params
    from scail_tpu.training.distill import (distill_forward, kd_loss,
                                            student_only_optimizer)

    cfg = GPTConfig(vocab_size=40, dim=16, num_heads=2, num_layers=2, max_len=12)
    tree = {"teacher": init_gpt_params(jax.random.PRNGKey(0), cfg),
            "student": init_gpt_params(jax.random.PRNGKey(1), cfg)}
    toks = jnp.asarray(rng.integers(0, 40, (2, 6)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 40, (2, 6)), jnp.int32)

    def fwd(params, t):
        out, _ = gpt_forward(params, cfg, t)
        return out

    def loss(tree):
        t, s = distill_forward(tree, fwd, fwd, toks)
        return kd_loss(s, t, labels, temperature=2.0, alpha=0.7)

    val = float(loss(tree))
    assert np.isfinite(val) and val > 0

    tx = student_only_optimizer(optax.sgd(0.1))
    opt_state = tx.init(tree)
    grads = jax.grad(loss)(tree)
    updates, _ = tx.update(grads, opt_state, tree)
    new = optax.apply_updates(tree, updates)
    dt = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
        lambda x, y: float(jnp.sum(jnp.abs(x - y))),
        new["teacher"], tree["teacher"]))
    ds = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
        lambda x, y: float(jnp.sum(jnp.abs(x - y))),
        new["student"], tree["student"]))
    assert dt == 0.0 and ds > 0.0

    # kd_loss sanity: identical logits -> soft term 0
    z = jnp.zeros((2, 3, 5))
    assert float(kd_loss(z, z)) < 1e-6
