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
