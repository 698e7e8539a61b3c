"""Training sigma samplers
(reference: sgm/modules/diffusionmodules/sigma_sampling.py).

Take explicit PRNG keys (functional style); the reference's dp-group
stratified `uniform_sampling` becomes per-replica key folding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scail_tpu.utils.registry import register
from scail_tpu.diffusion.discretization import RFDiscretization


@register(alias="sgm.modules.diffusionmodules.sigma_sampling.RFSampling")
class RFSampling:
    """LogisticNormal(p_mean, p_std): sigma = sigmoid(N(p_mean, p_std))
    (sigma_sampling.py:110-118)."""

    def __init__(self, p_mean: float = 0.0, p_std: float = 1.0):
        self.p_mean, self.p_std = p_mean, p_std

    def __call__(self, key, shape):
        # int (batch) or tuple shape: TASD losses sample per (b, t)
        # (loss.py:843, :906)
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        z = self.p_mean + self.p_std * jax.random.normal(key, shape)
        return jax.nn.sigmoid(z)


@register(alias="sgm.modules.diffusionmodules.sigma_sampling.EDMSampling")
class EDMSampling:
    def __init__(self, p_mean: float = -1.2, p_std: float = 1.2):
        self.p_mean, self.p_std = p_mean, p_std

    def __call__(self, key, n_samples: int):
        z = self.p_mean + self.p_std * jax.random.normal(key, (n_samples,))
        return jnp.exp(z)


@register(alias="sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling")
class DiscreteSampling:
    """Uniform over discretized indices (sigma_sampling.py:22-59); the
    reference's dp-stratified `uniform_sampling` groups are achieved by
    folding the data-parallel replica index into the key upstream."""

    def __init__(self, discretization_config=None, num_idx: int = 1000,
                 do_append_zero: bool = False, flip: bool = True, uniform_sampling: bool = False):
        from scail_tpu.utils.registry import instantiate_from_config

        disc = (
            instantiate_from_config(discretization_config)
            if discretization_config is not None
            else RFDiscretization(num_idx)
        )
        self.sigmas = jnp.asarray(disc(num_idx, do_append_zero=do_append_zero, flip=flip))
        self.num_idx = num_idx
        self.uniform_sampling = uniform_sampling

    def idx_to_sigma(self, idx):
        return self.sigmas[idx]

    def __call__(self, key, shape, rand=None, return_idx: bool = False):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        idx = rand if rand is not None else jax.random.randint(key, shape, 0, self.num_idx)
        if return_idx:  # TASD per-frame sampling (loss.py:843)
            return self.idx_to_sigma(idx), idx
        return self.idx_to_sigma(idx)
