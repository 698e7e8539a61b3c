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
