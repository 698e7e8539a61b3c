"""Training sigma samplers
(reference: sgm/modules/diffusionmodules/sigma_sampling.py).

Take explicit PRNG keys (functional style); the reference's dp-group
stratified `uniform_sampling` becomes per-batch-chunk interval sampling
inside the one jitted step (see DiscreteSampling).
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
    """Uniform over discretized indices (sigma_sampling.py:22-59).

    `uniform_sampling=True` with `group_num=g` reproduces the reference's
    dp-group stratification (sigma_sampling.py:43-50): the dp world splits
    into g rank groups, group k drawing only from sigma interval
    [k*num_idx/g, (k+1)*num_idx/g).  TPU-natively the whole global batch
    lives in ONE jitted step with the batch dim sharded over 'data', so
    rank groups map to contiguous batch chunks: element i of a size-n
    batch belongs to group (i*g)//n.  When n and the dp size are both
    multiples of g this is exactly the reference's rank->group map (ranks
    of one group hold one contiguous batch slice)."""

    def __init__(self, discretization_config=None, num_idx: int = 1000,
                 do_append_zero: bool = False, flip: bool = True,
                 uniform_sampling: bool = False, group_num: int = 0):
        from scail_tpu.utils.registry import instantiate_from_config

        disc = (
            instantiate_from_config(discretization_config)
            if discretization_config is not None
            else RFDiscretization(num_idx)
        )
        self.sigmas = jnp.asarray(disc(num_idx, do_append_zero=do_append_zero, flip=flip))
        self.num_idx = num_idx
        if uniform_sampling:
            assert group_num > 0, "uniform_sampling needs group_num > 0"
            assert num_idx % group_num == 0, (num_idx, group_num)
        self.uniform_sampling = uniform_sampling
        self.group_num = group_num

    def idx_to_sigma(self, idx):
        return self.sigmas[idx]

    def __call__(self, key, shape, rand=None, return_idx: bool = False):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        if rand is not None:
            idx = rand
        elif self.uniform_sampling:
            interval = self.num_idx // self.group_num
            group = (jnp.arange(shape[0]) * self.group_num) // shape[0]
            lo = (group * interval).reshape((-1,) + (1,) * (len(shape) - 1))
            idx = lo + jax.random.randint(key, shape, 0, interval)
        else:
            idx = jax.random.randint(key, shape, 0, self.num_idx)
        if return_idx:  # TASD per-frame sampling (loss.py:843)
            return self.idx_to_sigma(idx), idx
        return self.idx_to_sigma(idx)
