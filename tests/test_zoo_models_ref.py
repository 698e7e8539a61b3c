"""Zoo families whose upstream lives only in the reference's SAT zoo
(no HF twin): golden parity against the ACTUAL reference torch modules
imported via tests/refmods.py.
"""

import argparse

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import refmods  # noqa: E402

pytestmark = pytest.mark.slow


def _sd(m):
    return {k: v.detach().float().numpy() for k, v in m.state_dict().items()}


def _cait_args(**over):
    base = dict(
        image_size=[16, 16], patch_size=8, pre_len=1, post_len=0,
        in_channels=3, num_classes=7, init_scale=1e-4,
        vocab_size=1, hidden_size=32, num_layers=2, num_attention_heads=4,
        inner_hidden_size=48, hidden_size_per_attention_head=None,
        dec_num_layers=2, dec_hidden_size=None, dec_num_attention_heads=None,
        dec_inner_hidden_size=None, dec_layernorm_order=None,
        dec_max_sequence_length=None, dec_hidden_size_per_attention_head=None,
        layernorm_order="pre", model_parallel_size=1, skip_init=False,
        use_gpu_initialization=False, seed=1234, checkpoint_activations=False,
        checkpoint_num_layers=1, hidden_dropout=0.0, attention_dropout=0.0,
        drop_path=0.0, make_vocab_size_divisible_by=1,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_cait_golden_vs_reference(monkeypatch):
    refmods.simple_init_distributed()
    cait_mod = refmods.import_ref("sat.model.official.cait_model")

    from scail_tpu.models.zoo.cait import (CaiTConfig, cait_forward,
                                           cait_params_from_sat)

    # The vendored fork's CaiT cannot be constructed as-is: CaiTEncoder
    # passes layernorm_epsilon/use_final_layernorm as explicit kwargs AND
    # BaseModel re-derives them from ARGS_DEFAULT, so BaseTransformer gets
    # duplicate kwargs (base_model.py:91-106).  Drop the two keys from
    # ARGS_DEFAULT for the build so the explicitly-passed values win --
    # the obviously intended semantics.
    td = refmods.import_ref("sat.transformer_defaults")
    for k in ("layernorm_epsilon", "use_final_layernorm", "is_decoder"):
        monkeypatch.delitem(td.ARGS_DEFAULT, k)

    torch.manual_seed(11)
    args = _cait_args()
    ref = cait_mod.CaiT(args).eval()

    # randomize LayerScale gammas / talking-head projections so the test
    # is sensitive to them (init is identity/constant)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.02 * torch.randn_like(p))

    cfg = CaiTConfig(image_size=16, patch_size=8, in_channels=3, dim=32,
                     num_heads=4, num_layers=2, dec_num_layers=2,
                     inner_hidden_size=48, num_classes=7)
    params = cait_params_from_sat(_sd(ref), cfg)

    rng = np.random.default_rng(11)
    imgs = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    b = 2
    seq = 1 + (16 // 8) ** 2
    input_ids = torch.zeros((b, 1), dtype=torch.long)
    enc_pos = torch.arange(seq)[None].repeat(b, 1)
    dec_pos = torch.zeros((b, 1), dtype=torch.long)
    with torch.no_grad():
        enc_out, dec_out = ref(
            input_ids, enc_pos, dec_pos, image=torch.from_numpy(imgs),
            enc_attention_mask=torch.ones(1, 1), offline=True,
        )[:2]

    got = cait_forward(params, cfg, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(got), dec_out.numpy(),
                               rtol=2e-4, atol=2e-4)


def _eva2_args(**over):
    base = dict(
        image_size=[16, 16], patch_size=8, pre_len=1, post_len=0,
        in_channels=3, predict_feature_dim=12,
        vocab_size=1, hidden_size=32, num_layers=2, num_attention_heads=4,
        inner_hidden_size=48, hidden_size_per_attention_head=None,
        layernorm_order="pre", layernorm_epsilon=1e-6,
        model_parallel_size=1, skip_init=False, use_gpu_initialization=False,
        seed=1234, checkpoint_activations=False, checkpoint_num_layers=1,
        hidden_dropout=0.0, attention_dropout=0.0, drop_path=0.0,
        make_vocab_size_divisible_by=1,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_eva2_golden_vs_reference():
    refmods.simple_init_distributed()
    eva_mod = refmods.import_ref("sat.model.official.eva2_model")

    from scail_tpu.models.zoo.eva2 import (EVA2Config, eva2_forward,
                                           eva2_params_from_sat)

    torch.manual_seed(12)
    ref = eva_mod.EVA2Model(_eva2_args()).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.02 * torch.randn_like(p))

    cfg = EVA2Config(image_size=16, patch_size=8, in_channels=3, dim=32,
                     num_heads=4, num_layers=2, inner_hidden_size=48,
                     predict_feature_dim=12)
    params = eva2_params_from_sat(_sd(ref), cfg)

    rng = np.random.default_rng(12)
    imgs = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    b, seq = 2, 1 + (16 // 8) ** 2
    input_ids = torch.zeros((b, 1), dtype=torch.long)
    pos_ids = torch.arange(seq)[None].repeat(b, 1)
    mask = torch.ones(1, 1)
    with torch.no_grad():
        want = ref(input_ids, pos_ids, mask,
                   image=torch.from_numpy(imgs))[0].numpy()

    got = eva2_forward(params, cfg, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    # masked-position path (mask-token substitution)
    bmp = np.zeros((b, (16 // 8) ** 2), bool)
    bmp[:, 1] = True
    with torch.no_grad():
        # reference indexes logits[bool_masked_pos] -> flattened rows
        want_m = ref(input_ids, pos_ids, mask, image=torch.from_numpy(imgs),
                     bool_masked_pos=torch.from_numpy(bmp))[0].numpy()
    got_m = eva2_forward(params, cfg, jnp.asarray(imgs),
                         bool_masked_pos=jnp.asarray(bmp))
    np.testing.assert_allclose(np.asarray(got_m)[np.asarray(bmp)], want_m,
                               rtol=2e-4, atol=2e-4)
