"""Full-CLIP scoring model: golden parity vs HF transformers' CLIPModel
(tiny random config) for both towers, and smoke-mode scoring."""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scail_tpu.models.clip_score import (ClipScoreConfig, clip_image_embed,
                                         clip_params_from_hf_state_dict,
                                         clip_text_embed, init_clip_params)

CFG = ClipScoreConfig(
    vision_width=32, vision_layers=2, vision_heads=4, vision_mlp=48,
    image_size=32, patch_size=16, text_width=24, text_layers=2,
    text_heads=4, text_mlp=40, vocab_size=64, context_length=16,
    embed_dim=20, hidden_act="gelu", eos_token_id=63, dtype="float32",
)


def _hf_model():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    tc = CLIPTextConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.text_width,
        intermediate_size=CFG.text_mlp, num_hidden_layers=CFG.text_layers,
        num_attention_heads=CFG.text_heads,
        max_position_embeddings=CFG.context_length, hidden_act="gelu",
        projection_dim=CFG.embed_dim, eos_token_id=CFG.eos_token_id,
        attention_dropout=0.0)
    vc = CLIPVisionConfig(
        hidden_size=CFG.vision_width, intermediate_size=CFG.vision_mlp,
        num_hidden_layers=CFG.vision_layers,
        num_attention_heads=CFG.vision_heads, image_size=CFG.image_size,
        patch_size=CFG.patch_size, hidden_act="gelu",
        projection_dim=CFG.embed_dim, attention_dropout=0.0)
    cfg = CLIPConfig(text_config=tc.to_dict(), vision_config=vc.to_dict(),
                     projection_dim=CFG.embed_dim)
    torch.manual_seed(0)
    return CLIPModel(cfg).eval()


def test_clip_towers_golden_vs_hf():
    hf = _hf_model()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = clip_params_from_hf_state_dict(sd, CFG)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(0, 62, (2, 16)).astype(np.int64)
    ids[0, 9] = CFG.eos_token_id
    ids[1, 15] = CFG.eos_token_id

    with torch.no_grad():
        want_img = hf.get_image_features(torch.from_numpy(imgs)).numpy()
        want_txt = hf.get_text_features(torch.from_numpy(ids)).numpy()

    got_img = np.asarray(clip_image_embed(params, CFG, imgs))
    got_txt = np.asarray(clip_text_embed(params, CFG, ids.astype(np.int32)))
    np.testing.assert_allclose(got_img, want_img, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_txt, want_txt, rtol=2e-4, atol=2e-4)


def test_clip_score_smoke_mode():
    """Random-init towers + the aggregation math end-to-end."""
    from scail_tpu.evals.clip_score import clip_score_from_embeddings

    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ids = np.full((2, 16), CFG.eos_token_id, np.int32)
    ie = np.asarray(clip_image_embed(params, CFG, imgs))
    te = np.asarray(clip_text_embed(params, CFG, ids))
    score = clip_score_from_embeddings(ie, te)
    assert np.isfinite(score)
    # identical embeddings give exactly 100
    assert abs(clip_score_from_embeddings(ie, ie) - 100.0) < 1e-4


def test_open_clip_converter_matches_hf():
    """Reconstruct an open_clip-layout state dict from the HF tiny model
    (fusing q/k/v into in_proj) and assert the open_clip converter yields
    identical params, hence identical embeddings (the HPS_v2 load path)."""
    from scail_tpu.models.clip_score import clip_params_from_open_clip

    hf = _hf_model()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params_hf = clip_params_from_hf_state_dict(sd, CFG)

    oc = {}
    for prefix_hf, prefix_oc in (("vision_model", "visual."),
                                 ("text_model", "")):
        L = CFG.vision_layers if prefix_oc else CFG.text_layers
        for i in range(L):
            e = f"{prefix_hf}.encoder.layers.{i}"
            o = f"{prefix_oc}transformer.resblocks.{i}"
            qw = sd[f"{e}.self_attn.q_proj.weight"]
            kw = sd[f"{e}.self_attn.k_proj.weight"]
            vw = sd[f"{e}.self_attn.v_proj.weight"]
            oc[f"{o}.attn.in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
            oc[f"{o}.attn.in_proj_bias"] = np.concatenate(
                [sd[f"{e}.self_attn.q_proj.bias"],
                 sd[f"{e}.self_attn.k_proj.bias"],
                 sd[f"{e}.self_attn.v_proj.bias"]], 0)
            oc[f"{o}.attn.out_proj.weight"] = sd[f"{e}.self_attn.out_proj.weight"]
            oc[f"{o}.attn.out_proj.bias"] = sd[f"{e}.self_attn.out_proj.bias"]
            for ln_hf, ln_oc in (("layer_norm1", "ln_1"), ("layer_norm2", "ln_2")):
                oc[f"{o}.{ln_oc}.weight"] = sd[f"{e}.{ln_hf}.weight"]
                oc[f"{o}.{ln_oc}.bias"] = sd[f"{e}.{ln_hf}.bias"]
            oc[f"{o}.mlp.c_fc.weight"] = sd[f"{e}.mlp.fc1.weight"]
            oc[f"{o}.mlp.c_fc.bias"] = sd[f"{e}.mlp.fc1.bias"]
            oc[f"{o}.mlp.c_proj.weight"] = sd[f"{e}.mlp.fc2.weight"]
            oc[f"{o}.mlp.c_proj.bias"] = sd[f"{e}.mlp.fc2.bias"]
    oc["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    oc["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    oc["visual.positional_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"]
    oc["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    oc["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    oc["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    oc["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    oc["visual.proj"] = sd["visual_projection.weight"].T
    oc["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    oc["positional_embedding"] = sd[
        "text_model.embeddings.position_embedding.weight"]
    oc["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    oc["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    oc["text_projection"] = sd["text_projection.weight"].T

    params_oc = clip_params_from_open_clip(oc, CFG)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-6),
        params_hf, params_oc)
