"""Training losses (reference: sgm/modules/diffusionmodules/loss.py).

`RFLoss` (loss.py:659-763) is the SCAIL objective: sample
sigma ~ LogisticNormal, optionally resolution-shift it, noise only the
non-history frames, target = (noise - input) (rectified-flow velocity),
L2 masked to generated frames.

The reference broadcasts noise/sigma over the data-broadcast group
(loss.py:680-686); here all replicas derive them from the same PRNG key so
no collective is needed.  Spatial SP chunking (loss.py:688-712) is handled
by sharding the latent over the 'seq' mesh axis instead of manual chunking.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from scail_tpu.utils.misc import append_dims
from scail_tpu.utils.registry import instantiate_from_config, register


@register(alias="sgm.modules.diffusionmodules.loss.StandardDiffusionLoss")
class StandardDiffusionLoss:
    def __init__(self, sigma_sampler_config=None, type: str = "l2",
                 offset_noise_level: float = 0.0, batch2model_keys=None, **kw):
        self.sigma_sampler = (
            instantiate_from_config(sigma_sampler_config)
            if sigma_sampler_config is not None else None
        )
        assert type in ("l2", "l1")
        self.type = type
        self.offset_noise_level = offset_noise_level

    def get_loss(self, model_output, target, w):
        b = target.shape[0]
        err = model_output - target
        if self.type == "l2":
            per = (w * err ** 2).reshape(b, -1)
        else:
            per = (w * jnp.abs(err)).reshape(b, -1)
        return jnp.mean(per, axis=1)

    def __call__(self, key, network_fn, denoiser, cond: Dict, input, **model_kwargs):
        k_sig, k_noise = jax.random.split(key)
        sigma = self.sigma_sampler(k_sig, input.shape[0])
        noise = jax.random.normal(k_noise, input.shape, jnp.float32)
        noised = input.astype(jnp.float32) + noise * append_dims(sigma, input.ndim)
        out = denoiser(network_fn, noised, sigma, cond, **model_kwargs)
        w = append_dims(denoiser.w(sigma), input.ndim)
        return self.get_loss(out, input.astype(jnp.float32), w)


def _time_shift_traced(mu: float, t):
    """Traced version of sampling.py:913-918 ('normal' mode)."""
    return math.exp(mu) / (math.exp(mu) + 1.0 / t - 1.0)


def get_lin_function(x1: float = 256, y1: float = 0.5,
                     x2: float = 4096, y2: float = 1.15):
    """Resolution->shift line (loss.py:16-21)."""
    m = (y2 - y1) / (x2 - x1)
    b = y1 - m * x1
    return lambda x: m * x + b


def get_3d_position_ids(frame_len: int, h: int, w: int):
    """(t, h, w, 3) integer grid (loss.py:282-287)."""
    i = jnp.broadcast_to(jnp.arange(frame_len)[:, None, None], (frame_len, h, w))
    j = jnp.broadcast_to(jnp.arange(h)[None, :, None], (frame_len, h, w))
    k = jnp.broadcast_to(jnp.arange(w)[None, None, :], (frame_len, h, w))
    return jnp.stack([i, j, k], axis=-1)


def _tasd_position_ids(b: int, t: int, H: int, W: int, patch_size):
    """rope_position_ids for the doubled [clean | noised] sequence
    (loss.py:866-874, :946-950)."""
    pos = get_3d_position_ids(
        t // patch_size[0], H // patch_size[1], W // patch_size[2]
    ).reshape(-1, 3)
    pos = jnp.tile(pos, (2, 1))
    return jnp.broadcast_to(pos[None], (b, *pos.shape))


def guidance_scale_embedding(w, embedding_dim: int = 512):
    """Sinusoidal guidance-scale embedding, [sin|cos] order, w*1000
    (loss.py:533-551)."""
    import math as _math

    w = jnp.asarray(w, jnp.float32) * 1000.0
    half = embedding_dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-_math.log(10000.0) / (half - 1)))
    emb = w[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


@register(alias="sgm.modules.diffusionmodules.loss.PDDiffusionLoss")
class PDDiffusionLoss(StandardDiffusionLoss):
    """Progressive-distillation loss (loss.py:421-530): the student learns
    to match TWO teacher DDIM steps in one, at a random guidance scale.

    Works over the alphas_cumprod_sqrt parametrization (VideoScaling +
    ZeroSNRDDPMDiscretization); `teacher_fn` is the frozen teacher network.
    """

    def __init__(self, type: str = "l2", discretization_config=None,
                 num_idx: int = 1000, add_dsm_loss: bool = False, **kw):
        super().__init__(type=type, **kw)
        import numpy as _np

        disc = instantiate_from_config(discretization_config)
        ac, timesteps = disc(num_idx, do_append_zero=False, flip=True, return_idx=True)
        # prepend the clean endpoint (loss.py:452-453)
        self.ac_all = jnp.asarray(
            _np.concatenate([[1.0], _np.asarray(ac, _np.float32)]))
        self.timesteps = jnp.asarray(
            _np.concatenate([[-1], _np.asarray(timesteps)]).astype(_np.int32))
        self.num_idx = num_idx
        self.add_dsm_loss = add_dsm_loss

    def __call__(self, key, network_fn, denoiser, cond: Dict, input, *,
                 teacher_fn, uncond: Optional[Dict] = None, **model_kwargs):
        b = input.shape[0]
        k_rand, k_scale, k_noise = jax.random.split(key, 3)
        # random even index and guidance scale (loss.py:470-475)
        rand = jax.random.randint(k_rand, (b,), 1, self.num_idx // 2 + 1) * 2
        scale = 1.5 + jax.random.uniform(k_scale, (b,)) * 7.5
        ac = self.ac_all[rand]
        ac_next = self.ac_all[rand - 1]
        ac_nn = self.ac_all[rand - 2]
        noise = jax.random.normal(k_noise, input.shape, jnp.float32)

        inp = input.astype(jnp.float32)
        noised = (inp * append_dims(ac, inp.ndim)
                  + noise * append_dims((1 - ac ** 2) ** 0.5, inp.ndim))

        # student prediction at guidance scale `scale` (loss.py:498-501)
        out = denoiser(network_fn, noised, ac, cond,
                       idx=self.timesteps[rand], cfg_scale=scale, **model_kwargs)

        # teacher: two DDIM steps, no CFG (scale==1 path, sampling.py:558-563)
        def ddim_step(x, a, a_next, idx):
            den = denoiser(teacher_fn, x, a, cond, idx=idx, **model_kwargs)
            a_t = append_dims(((1 - a_next ** 2) / (1 - a ** 2)) ** 0.5, x.ndim)
            b_t = append_dims(a_next, x.ndim) - append_dims(a, x.ndim) * a_t
            return a_t * x + b_t * den

        x_next = jax.lax.stop_gradient(
            ddim_step(noised, ac, ac_next, self.timesteps[rand]))
        x_nn = jax.lax.stop_gradient(
            ddim_step(x_next, ac_next, ac_nn, self.timesteps[rand - 1]))
        a_t = (1 - ac_nn ** 2) ** 0.5 / (1 - ac ** 2) ** 0.5
        target = (x_nn - append_dims(a_t, inp.ndim) * noised) / append_dims(
            ac_nn - a_t * ac, inp.ndim)

        w = append_dims(1.0 / (1 - ac ** 2), inp.ndim)  # v-pred weighting
        loss = self.get_loss(out, target, w)
        if self.add_dsm_loss:
            loss = loss + 0.001 * self.get_loss(out, inp, w)
        return loss


@register(alias="sgm.modules.diffusionmodules.loss.TASDLoss")
class TASDLoss(StandardDiffusionLoss):
    """Temporal-autoregressive self-distillation loss, DDPM parametrization
    (loss.py:831-885): per-frame alphas_cumprod_sqrt, the CLEAN sequence is
    concatenated before the noised one along time as in-context history, the
    model denoises the second half, v-pred weight 1/(1-ac^2).

    Use with DiscreteDenoiser_TASD (per-frame sigma quantization) and a
    network that accepts per-frame timesteps + rope_position_ids.
    `noise` / `alphas_idx` can be injected for deterministic testing.
    """

    def __init__(self, min_snr_value=None, **kw):
        super().__init__(**kw)
        self.min_snr_value = min_snr_value

    def __call__(self, key, network_fn, denoiser, cond: Dict, input, *,
                 patch_size=(1, 2, 2), noise=None, alphas_idx=None,
                 **model_kwargs):
        b, t = input.shape[:2]
        k_sig, k_noise = jax.random.split(key)
        if alphas_idx is not None:
            idx = alphas_idx
            ac = self.sigma_sampler.idx_to_sigma(idx)
        else:
            ac, idx = self.sigma_sampler(k_sig, (b, t), return_idx=True)
        if noise is None:
            noise = jax.random.normal(k_noise, input.shape, jnp.float32)

        inp = input.astype(jnp.float32)
        noised = (inp * append_dims(ac, inp.ndim)
                  + noise * append_dims((1.0 - ac ** 2) ** 0.5, inp.ndim))

        # prepend the clean frames as in-context history (loss.py:860-865)
        noised = jnp.concatenate([inp, noised], axis=1)
        ac_full = jnp.concatenate([jnp.ones_like(ac), ac], axis=1)
        idx_full = jnp.concatenate([jnp.zeros_like(idx), idx], axis=1)

        pos = _tasd_position_ids(b, t, input.shape[3], input.shape[4], patch_size)
        out = denoiser(network_fn, noised, ac_full, cond,
                       idx=idx_full, rope_position_ids=pos, **model_kwargs)
        out = out[:, t:]
        ac_t = ac_full[:, t:]
        w = append_dims(1.0 / (1.0 - ac_t ** 2), inp.ndim)  # v-pred (loss.py:878)
        if self.min_snr_value is not None:
            # elementwise clamp (loss.py:880-881 writes python min(); the
            # intended min-SNR-gamma semantics are elementwise)
            w = jnp.minimum(w, self.min_snr_value)
        return self.get_loss(out, inp, w)


@register(alias="sgm.modules.diffusionmodules.loss.TASDLoss_RF")
class TASDLossRF(StandardDiffusionLoss):
    """Rectified-flow TASD (loss.py:889-969): per-frame t ~ LogisticNormal
    (optionally resolution-shifted), clean or lightly-noised frames
    prepended as history, target = noise - input on the noised half.

    `noise` / `t_indices` can be injected for deterministic testing.
    """

    def __init__(self, schedule_shift: bool = False,
                 noise_augmentation: bool = False, aug: bool = False,
                 aug_max=None, remove_first: bool = True, **kw):
        super().__init__(**kw)
        self.schedule_shift = schedule_shift
        self.noise_augmentation = noise_augmentation
        self.aug = aug
        self.aug_max = aug_max
        self.remove_first = remove_first

    def __call__(self, key, network_fn, denoiser, cond: Dict, input, *,
                 patch_size=(1, 2, 2), noise=None, t_indices=None,
                 **model_kwargs):
        b, t = input.shape[:2]
        ks = jax.random.split(key, 6)
        if t_indices is None:
            t_indices = self.sigma_sampler(ks[0], (b, t))
        if noise is None:
            noise = jax.random.normal(ks[1], input.shape, jnp.float32)

        if self.schedule_shift:  # loss.py:916-923
            image_seq_len = (
                input.shape[-1] * input.shape[-2]
                // patch_size[-1] // patch_size[-2]
            )
            mu = get_lin_function(y1=0.5, y2=1.15)(image_seq_len)
            t_indices = _time_shift_traced(mu, t_indices)

        inp = input.astype(jnp.float32)
        noised = (inp * append_dims(1.0 - t_indices, inp.ndim)
                  + noise * append_dims(t_indices, inp.ndim))

        if self.noise_augmentation:  # loss.py:931-932: history gets light noise
            sig = jnp.exp(-3.0 + 0.5 * jax.random.normal(ks[2], inp.shape))
            inp = inp + sig * jax.random.normal(ks[3], inp.shape)

        if not self.aug:
            noised_full = jnp.concatenate([inp, noised], axis=1)
            t_full = jnp.concatenate([jnp.zeros_like(t_indices), t_indices], axis=1)
        else:  # partially-noised history (loss.py:938-943)
            aug_noise = jax.random.normal(ks[4], inp.shape, jnp.float32)
            aug_idx = jax.random.uniform(ks[5], (b, t)) * self.aug_max
            aug_input = (inp * append_dims(1.0 - aug_idx, inp.ndim)
                         + aug_noise * append_dims(aug_idx, inp.ndim))
            noised_full = jnp.concatenate([aug_input, noised], axis=1)
            t_full = jnp.concatenate([aug_idx, t_indices], axis=1)

        pos = _tasd_position_ids(b, t, input.shape[3], input.shape[4], patch_size)
        out = denoiser(network_fn, noised_full, t_full, cond,
                       rope_position_ids=pos, **model_kwargs)
        out = out[:, t:]
        label = noise - inp  # post-augmentation input, like loss.py:957
        if self.remove_first:  # loss.py:958-960
            out = out[:, 1:]
            label = label[:, 1:]
        return self.get_loss(out, label, 1.0)


@register(alias="sgm.modules.diffusionmodules.loss.RFLoss")
class RFLoss(StandardDiffusionLoss):
    def __init__(self, schedule_shift: bool = False, **kw):
        super().__init__(**kw)
        self.schedule_shift = schedule_shift

    def __call__(
        self,
        key,
        network_fn,
        denoiser,
        cond: Dict,
        input,                       # (b, T, C, H, W) latent
        *,
        history_mask: Optional[jnp.ndarray] = None,  # (b, T, 4, H, W)
        patch_size=(1, 2, 2),
        **model_kwargs,
    ):
        b = input.shape[0]
        k_sig, k_noise = jax.random.split(key)
        sigma = self.sigma_sampler(k_sig, b)

        if self.schedule_shift:
            # resolution-dependent shift (loss.py:674-678)
            image_seq_len = (
                input.shape[-1] * input.shape[-2] // patch_size[-1] // patch_size[-2]
            )
            mu = float(
                (1.15 - 0.5) / (4096 - 256) * image_seq_len
                + 0.5 - (1.15 - 0.5) / (4096 - 256) * 256
            )
            sigma = _time_shift_traced(mu, sigma)

        noise = jax.random.normal(k_noise, input.shape, jnp.float32)

        if history_mask is None:
            hist = jnp.zeros_like(input[:, :, :1])
        else:
            hist = history_mask[:, :, :1].astype(jnp.float32)
        hist = jnp.broadcast_to(hist, input.shape)  # (loss.py:735-737)

        # history frames stay clean (loss.py:739-744)
        noise_masked = noise * (1.0 - hist)
        sig_b = append_dims(sigma, input.ndim)
        noised = input.astype(jnp.float32) * (1.0 - sig_b) + noise_masked * sig_b

        out = denoiser(
            network_fn, noised, sigma, cond,
            history_mask=history_mask, **model_kwargs,
        )

        loss_mask = 1.0 - hist
        # RF velocity target (loss.py:746-749)
        return self.get_loss(out, noise - input.astype(jnp.float32), loss_mask)
