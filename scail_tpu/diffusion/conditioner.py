"""GeneralConditioner (reference: sgm/modules/encoders/modules.py:86-260).

Routes each embedder's output by rank into {vector(2d), crossattn(3d),
concat(4d/5d)}, applies per-embedder unconditional-guidance dropout, and
builds the (c, uc) pair for CFG sampling.  Embedders are host-side callables
(the text encoder tokenizes on host, runs its jitted encoder on device).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional

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
        self.ucg_prng = random.Random(0)

    def _maybe_legacy_ucg(self, emb, batch: Dict, force_cond: bool) -> Dict:
        """String-swap ucg for text embedders (modules.py:170-178)."""
        if emb.legacy_ucg_val is None or force_cond or emb.ucg_rate <= 0:
            return batch
        vals = list(batch[emb.input_key])
        for i in range(len(vals)):
            if self.ucg_prng.random() < emb.ucg_rate:
                vals[i] = emb.legacy_ucg_val
        out = dict(batch)
        out[emb.input_key] = vals
        return out

    def __call__(self, batch: Dict, force_zero_embeddings=(), disable_ucg: bool = False) -> Dict:
        output: Dict[str, jnp.ndarray] = {}
        for emb in self.embedders:
            b = self._maybe_legacy_ucg(emb, batch, force_cond=disable_ucg)
            emb_out = emb(b[emb.input_key])
            if not isinstance(emb_out, (list, tuple)):
                emb_out = [emb_out]
            for e in emb_out:
                out_key = OUTPUT_DIM2KEYS[e.ndim]
                if emb.ucg_rate > 0.0 and emb.legacy_ucg_val is None and not disable_ucg:
                    keep = np.asarray(
                        [0.0 if self.ucg_prng.random() < emb.ucg_rate else 1.0
                         for _ in range(e.shape[0])],
                        np.float32,
                    )
                    e = e * jnp.asarray(keep).reshape((-1,) + (1,) * (e.ndim - 1))
                if emb.input_key in force_zero_embeddings:
                    e = jnp.zeros_like(e)
                if out_key in output:
                    output[out_key] = jnp.concatenate(
                        [output[out_key], e], axis=KEY2CATDIM[out_key]
                    )
                else:
                    output[out_key] = e
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
