"""GeneralConditioner (reference: sgm/modules/encoders/modules.py:86-260).

Routes each embedder's output by rank into {vector(2d), crossattn(3d),
concat(4d/5d)}, applies per-embedder unconditional-guidance dropout, and
builds the (c, uc) pair for CFG sampling.  Embedders are host-side callables
(the text encoder tokenizes on host, runs its jitted encoder on device).

Correlated ucg (modules.py:126-235): `cor_embs` lists embedder indices whose
dropout decisions are drawn JOINTLY -- one categorical draw over the
2**len(cor_embs) on/off combinations with probabilities `cor_p`, bit k of
the draw dropping embedder cor_embs[k].  Correlated embedders are embedded
first (the reference's output concatenation order), the rest follow in
declaration order.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.utils.registry import instantiate_from_config, register

OUTPUT_DIM2KEYS = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}
KEY2CATDIM = {"vector": 1, "crossattn": 2, "concat": 1}


class AbstractEmbModel:
    """Base for conditioning embedders (modules.py:42-84)."""

    is_trainable: bool = False
    ucg_rate: float = 0.0
    input_key: Optional[str] = None
    legacy_ucg_val = None

    def __call__(self, value):
        raise NotImplementedError


@register(alias="sgm.modules.GeneralConditioner")
@register(alias="sgm.modules.encoders.modules.GeneralConditioner")
class GeneralConditioner:
    def __init__(self, emb_models, cor_embs=(), cor_p=()):
        self.embedders: List[AbstractEmbModel] = []
        for cfg in emb_models:
            cfg = dict(cfg)
            emb = instantiate_from_config(
                {"target": cfg["target"], "params": cfg.get("params", {})}
            )
            emb.is_trainable = cfg.get("is_trainable", False)
            emb.ucg_rate = cfg.get("ucg_rate", 0.0)
            emb.input_key = cfg.get("input_key")
            emb.legacy_ucg_val = cfg.get("legacy_ucg_val", None)
            self.embedders.append(emb)
        self.cor_embs = list(cor_embs)
        self.cor_p = list(cor_p)
        if self.cor_embs:
            assert len(self.cor_p) == 2 ** len(self.cor_embs), (
                f"cor_p needs one probability per on/off combination: "
                f"expected {2 ** len(self.cor_embs)}, got {len(self.cor_p)}")
        # per-host fold: multi-host DP replicas hold DIFFERENT examples, so
        # each host must draw a different ucg dropout sequence (the
        # reference gets this from its unseeded per-process RandomState)
        self.ucg_prng = np.random.RandomState(jax.process_index())

    def _maybe_legacy_ucg(self, emb, batch: Dict, cond_or_not) -> Dict:
        """String-swap ucg for text embedders (modules.py:132-148):
        cond_or_not=None draws per-element bernoulli(ucg_rate); an explicit
        0/1 vector (correlated mode) swaps exactly where it is 1."""
        vals = list(batch[emb.input_key])
        for i in range(len(vals)):
            drop = (self.ucg_prng.random() < emb.ucg_rate
                    if cond_or_not is None else bool(cond_or_not[i]))
            if drop:
                vals[i] = emb.legacy_ucg_val
        out = dict(batch)
        out[emb.input_key] = vals
        return out

    def _embed_one(self, emb, batch: Dict, output: Dict, cond_or_not,
                   force_zero_embeddings, disable_ucg: bool) -> None:
        """One embedder's contribution, concatenated into `output`
        (modules.py:150-198 get_single_embedding)."""
        apply_ucg = emb.ucg_rate > 0.0 and not disable_ucg
        # the legacy string-swap has NO rate gate in the reference: with an
        # explicit cond_or_not (correlated mode) surely_get_ucg_val swaps
        # wherever the joint draw says so, even at ucg_rate == 0
        # (modules.py:140-156); the tensor-zeroing path below keeps its
        # rate > 0 gate in both modes (modules.py:167).
        if (emb.legacy_ucg_val is not None and not disable_ucg
                and (cond_or_not is not None or emb.ucg_rate > 0.0)):
            batch = self._maybe_legacy_ucg(emb, batch, cond_or_not)
        emb_out = emb(batch[emb.input_key])
        if not isinstance(emb_out, (list, tuple)):
            emb_out = [emb_out]
        for e in emb_out:
            out_key = OUTPUT_DIM2KEYS[e.ndim]
            if apply_ucg and emb.legacy_ucg_val is None:
                if cond_or_not is None:
                    keep = np.asarray(
                        [0.0 if self.ucg_prng.random() < emb.ucg_rate
                         else 1.0 for _ in range(e.shape[0])], np.float32)
                else:
                    keep = 1.0 - np.asarray(cond_or_not, np.float32)
                e = e * jnp.asarray(keep).reshape(
                    (-1,) + (1,) * (e.ndim - 1))
            if emb.input_key in force_zero_embeddings:
                e = jnp.zeros_like(e)
            if out_key in output:
                output[out_key] = jnp.concatenate(
                    [output[out_key], e], axis=KEY2CATDIM[out_key])
            else:
                output[out_key] = e

    def __call__(self, batch: Dict, force_zero_embeddings=(),
                 disable_ucg: bool = False) -> Dict:
        output: Dict[str, jnp.ndarray] = {}
        cor = self.cor_embs if (self.cor_embs and not disable_ucg) else []
        if cor:
            # one joint draw per batch element; bit k of the index is the
            # drop decision for embedder cor_embs[k] (modules.py:206-213)
            bs = len(batch[self.embedders[cor[0]].input_key])
            rand_idx = self.ucg_prng.choice(
                len(self.cor_p), size=(bs,), p=self.cor_p)
            for emb_idx in cor:
                cond_or_not = rand_idx % 2
                rand_idx = rand_idx // 2
                self._embed_one(self.embedders[emb_idx], batch, output,
                                cond_or_not, force_zero_embeddings,
                                disable_ucg)
        for i, emb in enumerate(self.embedders):
            if i in cor:
                continue
            self._embed_one(emb, batch, output, None,
                            force_zero_embeddings, disable_ucg)
        return output

    def get_unconditional_conditioning(
        self, batch: Dict, batch_uc: Optional[Dict] = None,
        force_uc_zero_embeddings=(),
    ):
        """(modules.py:230-250): embed cond and uncond with ucg disabled."""
        c = self(batch, disable_ucg=True)
        uc = self(
            batch_uc if batch_uc is not None else batch,
            force_zero_embeddings=force_uc_zero_embeddings,
            disable_ucg=True,
        )
        return c, uc
