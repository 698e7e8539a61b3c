"""GeneralConditioner: output routing by rank, ucg dropout variants,
(c, uc) construction (reference modules.py:86-260)."""

import jax.numpy as jnp
import numpy as np

from scail_tpu.diffusion.conditioner import AbstractEmbModel, GeneralConditioner
from scail_tpu.utils.registry import register


@register(alias="tests.fake.TxtEmb")
class _TxtEmb(AbstractEmbModel):
    def __init__(self, dim=8):
        self.dim = dim

    def __call__(self, texts):
        # embedding encodes emptiness of the prompt so ucg swaps are visible
        vals = [0.0 if t == "" else float(len(t)) for t in texts]
        return jnp.asarray(vals)[:, None, None] * jnp.ones((len(texts), 3, self.dim))


@register(alias="tests.fake.VecEmb")
class _VecEmb(AbstractEmbModel):
    def __call__(self, v):
        return jnp.asarray(v, jnp.float32)  # (b, d) -> 'vector'


def _conditioner(ucg=0.0, legacy=None):
    return GeneralConditioner(emb_models=[
        {"target": "tests.fake.TxtEmb", "input_key": "txt",
         "ucg_rate": ucg, "legacy_ucg_val": legacy},
        {"target": "tests.fake.VecEmb", "input_key": "vec"},
    ])


def test_routing_by_ndim():
    c = _conditioner()
    out = c({"txt": ["hello"], "vec": np.ones((1, 4), np.float32)})
    assert out["crossattn"].shape == (1, 3, 8)
    assert out["vector"].shape == (1, 4)


def test_legacy_ucg_string_swap():
    cond = _conditioner(ucg=1.0, legacy="")  # always swap
    out = cond({"txt": ["hello"], "vec": np.ones((1, 4), np.float32)})
    # prompt replaced by "" -> zero embedding
    assert float(jnp.abs(out["crossattn"]).max()) == 0.0
    # disable_ucg (inference path) keeps the prompt
    out2 = cond({"txt": ["hello"], "vec": np.ones((1, 4), np.float32)},
                disable_ucg=True)
    assert float(jnp.abs(out2["crossattn"]).max()) > 0.0


def test_bernoulli_ucg_zeroes_embeddings():
    cond = _conditioner(ucg=1.0, legacy=None)  # always drop (multiplicative)
    out = cond({"txt": ["hello"], "vec": np.ones((1, 4), np.float32)})
    assert float(jnp.abs(out["crossattn"]).max()) == 0.0


def test_get_unconditional_conditioning_pair():
    cond = _conditioner(ucg=0.1, legacy="")
    c, uc = cond.get_unconditional_conditioning(
        {"txt": ["a character dancing"], "vec": np.ones((1, 4), np.float32)},
        batch_uc={"txt": [""], "vec": np.ones((1, 4), np.float32)},
    )
    assert float(jnp.abs(c["crossattn"]).max()) > 0
    assert float(jnp.abs(uc["crossattn"]).max()) == 0.0  # empty prompt
    np.testing.assert_array_equal(np.asarray(c["vector"]), np.asarray(uc["vector"]))


def test_force_zero_embeddings():
    cond = _conditioner()
    out = cond({"txt": ["hello"], "vec": np.ones((1, 4), np.float32)},
               force_zero_embeddings=("txt",))
    assert float(jnp.abs(out["crossattn"]).max()) == 0.0


# ---- correlated ucg (reference modules.py:126-235) -----------------------

@register(alias="tests.fake.IdVec")
class _IdVec(AbstractEmbModel):
    def __call__(self, v):
        return jnp.asarray(v, jnp.float32)


@register(alias="tests.fake.IdCross")
class _IdCross(AbstractEmbModel):
    def __call__(self, v):
        return jnp.asarray(v, jnp.float32)


def _cor_conditioner(cor_p):
    return GeneralConditioner(
        emb_models=[
            {"target": "tests.fake.IdVec", "input_key": "a", "ucg_rate": 0.1},
            {"target": "tests.fake.IdVec", "input_key": "b", "ucg_rate": 0.1},
        ],
        cor_embs=[0, 1], cor_p=cor_p)


def test_correlated_ucg_joint_drop():
    """cor_p puts all mass on 'both dropped' / 'both kept': the two
    embedders' per-sample drop decisions must coincide exactly (the whole
    point of correlated ucg -- an independent draw would decorrelate)."""
    cond = _cor_conditioner([0.5, 0.0, 0.0, 0.5])  # idx 0 (keep,keep) or 3 (drop,drop)
    cond.ucg_prng = np.random.RandomState(5)
    b = 256
    batch = {"a": np.ones((b, 2), np.float32),
             "b": np.ones((b, 2), np.float32)}
    out = np.asarray(cond(batch)["vector"])        # (b, 4) = [a | b]
    a_dropped = out[:, :2].max(axis=1) == 0.0
    b_dropped = out[:, 2:].max(axis=1) == 0.0
    np.testing.assert_array_equal(a_dropped, b_dropped)
    assert 0 < a_dropped.sum() < b                 # both outcomes occur


def test_correlated_ucg_bit_order():
    """Bit k of the categorical index drops embedder cor_embs[k]:
    index 1 = drop #0 keep #1, index 2 = keep #0 drop #1."""
    for idx, (drop_a, drop_b) in [(1, (True, False)), (2, (False, True))]:
        p = [0.0] * 4
        p[idx] = 1.0
        cond = _cor_conditioner(p)
        out = np.asarray(cond({"a": np.ones((3, 2), np.float32),
                               "b": np.ones((3, 2), np.float32)})["vector"])
        assert (out[:, :2].max() == 0.0) == drop_a
        assert (out[:, 2:].max() == 0.0) == drop_b


def test_correlated_ucg_disabled_at_inference():
    cond = _cor_conditioner([0.0, 0.0, 0.0, 1.0])  # always drop both
    batch = {"a": np.ones((2, 2), np.float32),
             "b": np.ones((2, 2), np.float32)}
    c, uc = cond.get_unconditional_conditioning(batch)
    assert float(np.asarray(c["vector"]).min()) == 1.0  # ucg off for (c, uc)


def test_correlated_legacy_swap_ignores_rate_gate():
    """The reference's surely_get_ucg_val has NO ucg_rate gate
    (modules.py:140-146): a correlated legacy embedder with ucg_rate=0
    still swaps wherever the joint draw says drop; the tensor-zeroing
    path keeps its rate > 0 gate."""
    cond = GeneralConditioner(
        emb_models=[
            {"target": "tests.fake.TxtEmb", "input_key": "txt",
             "ucg_rate": 0.0, "legacy_ucg_val": ""},
            {"target": "tests.fake.IdVec", "input_key": "v", "ucg_rate": 0.1},
        ],
        cor_embs=[0, 1], cor_p=[0.0, 1.0, 0.0, 0.0])  # idx 1: drop #0, keep #1
    out = cond({"txt": ["hello", "hey"], "v": np.ones((2, 2), np.float32)})
    assert float(jnp.abs(out["crossattn"]).max()) == 0.0  # swapped to ""
    assert float(np.asarray(out["vector"]).min()) == 1.0  # kept


def test_correlated_ucg_golden_vs_reference():
    """Bit-exact parity with the reference GeneralConditioner's correlated
    path (modules.py:199-213): same RandomState stream -> same joint
    draws -> identical masked outputs and identical concat order (the
    reference embeds correlated embedders FIRST)."""
    import torch

    from tests import refmods

    refmods.install_stubs()
    ref_mod = refmods.import_ref("sgm.modules.encoders.modules")

    class RefIdVec(ref_mod.AbstractEmbModel):
        def forward(self, v):
            return torch.as_tensor(np.asarray(v))

    # make the class importable for the reference's target-string factory
    # (pytest imports this file under a non-package name, so attach to the
    # package module refmods, which IS in sys.modules as tests.refmods)
    refmods.RefIdVec = RefIdVec
    emb_cfgs = [
        {"target": "tests.refmods.RefIdVec", "input_key": "a",
         "ucg_rate": 0.1},
        {"target": "tests.refmods.RefIdVec", "input_key": "b",
         "ucg_rate": 0.1},
        {"target": "tests.refmods.RefIdVec", "input_key": "c",
         "ucg_rate": 0.0},
    ]
    cor_p = [0.4, 0.3, 0.2, 0.1]
    ref = ref_mod.GeneralConditioner(emb_cfgs, cor_embs=[1, 0], cor_p=cor_p)

    b = 64
    batch = {k: np.random.default_rng(i).standard_normal(
        (b, 2)).astype(np.float32) for i, k in enumerate("abc")}
    np.random.seed(31)  # the reference draws from the GLOBAL np.random
    want = ref({k: torch.as_tensor(v) for k, v in batch.items()})

    mine = GeneralConditioner(
        emb_models=[
            {"target": "tests.fake.IdVec", "input_key": "a", "ucg_rate": 0.1},
            {"target": "tests.fake.IdVec", "input_key": "b", "ucg_rate": 0.1},
            {"target": "tests.fake.IdVec", "input_key": "c", "ucg_rate": 0.0},
        ],
        cor_embs=[1, 0], cor_p=cor_p)
    mine.ucg_prng = np.random.RandomState(31)  # same stream as np.random.seed
    got = mine(batch)
    np.testing.assert_allclose(np.asarray(got["vector"]),
                               want["vector"].numpy(), rtol=0, atol=0)
