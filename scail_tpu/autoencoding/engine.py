"""Functional AutoencodingEngine: adversarial autoencoder training with
alternating generator/discriminator optimizers.

Port of the reference's Lightning engine (sgm/models/autoencoder.py:
109-304): `training_step` picks the optimizer by `batch_idx % 2` and
forces the generator before `disc_start_iter` (:289-304); the generator
step differentiates encoder+decoder+regularizer(+logvar) against the
composite loss, the discriminator step differentiates only the
discriminator params (:183-198 parameter split).

TPU-native shape: both phases are separate jitted step functions over
one state pytree; the encode -> regularize -> decode composition is a
pure function, the adaptive GAN weight is computed through the decoder
head (see gan_loss.py), and optimizers are optax transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class AutoencoderTrainer:
    """encoder_apply(params, x) -> latent moments/features;
    regularizer(z, key) -> (z, reg_log)  [+ optional aux state];
    decoder_body(params, z) -> penultimate feats;
    decoder_head(head_params, feats) -> reconstruction.

    Splitting the decoder at its final layer gives the adaptive-weight
    context for free (autoencoder.py:200-201 get_last_layer); pass the
    full decode as `decoder_body` + identity head to opt out.
    """

    encoder_apply: Callable
    decoder_body: Callable
    decoder_head: Callable
    loss: Any                       # LPIPSWithDiscriminator-like
    regularizer: Callable
    disc_apply: Callable
    disc_start: int = 0
    ae_lr: float = 1e-4
    disc_lr: float = 1e-4
    lr_g_factor: float = 1.0

    def __post_init__(self):
        self._ae_tx = optax.adam(self.ae_lr * self.lr_g_factor)
        self._disc_tx = optax.adam(self.disc_lr)

    def init_state(self, ae_params: Dict, disc_params: Dict,
                   logvar: Optional[jnp.ndarray] = None) -> Dict:
        if logvar is None:
            logvar = jnp.zeros(())
        gen = {"ae": ae_params, "logvar": logvar}
        return {
            "gen": gen,
            "disc": disc_params,
            "opt_gen": self._ae_tx.init(gen),
            "opt_disc": self._disc_tx.init(disc_params),
            "step": 0,
        }

    # -- the autoencoder forward (autoencoder.py:222-227)
    def _reconstruct(self, ae_params, x, key):
        """regularizer signature: (reg_params_or_None, z, key) ->
        (z, log); trainable regularizer params (e.g. a VQ codebook) live
        under ae_params['regularizer'] so the generator optimizer trains
        them (autoencoder.py:187-188)."""
        z_raw = self.encoder_apply(ae_params["encoder"], x)
        z, reg_log = self.regularizer(ae_params.get("regularizer"), z_raw, key)
        feats = self.decoder_body(ae_params["decoder"], z)
        recon = self.decoder_head(ae_params["decoder_head"], feats)
        return recon, feats, z, reg_log

    def generator_step(self, state, batch, key, global_step: int):
        """One generator update; global_step is static (the disc_start
        gate retraces once when it flips, like the torch int compare)."""

        def loss_fn(gen):
            recon, feats, z, reg_log = self._reconstruct(
                gen["ae"], batch, key)
            ctx = (self.decoder_head, gen["ae"]["decoder_head"], feats)
            loss, log = self.loss.generator_loss(
                state["disc"], gen["logvar"], batch, recon, reg_log,
                global_step, key=key, adaptive_ctx=ctx,
                disc_apply=self.disc_apply)
            return loss, log

        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["gen"])
        if not self.loss.learn_logvar:
            grads = dict(grads, logvar=jnp.zeros_like(grads["logvar"]))
        updates, opt_gen = self._ae_tx.update(grads, state["opt_gen"],
                                              state["gen"])
        gen = optax.apply_updates(state["gen"], updates)
        new_state = dict(state, gen=gen, opt_gen=opt_gen,
                         step=state["step"] + 1)
        return new_state, loss, log

    def discriminator_step(self, state, batch, key, global_step: int):
        recon, _, _, _ = self._reconstruct(state["gen"]["ae"], batch, key)
        recon = jax.lax.stop_gradient(recon)

        def loss_fn(disc_params):
            return self.loss.discriminator_loss(
                disc_params, batch, recon, global_step,
                disc_apply=self.disc_apply)

        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["disc"])
        updates, opt_disc = self._disc_tx.update(grads, state["opt_disc"],
                                                 state["disc"])
        disc = optax.apply_updates(state["disc"], updates)
        new_state = dict(state, disc=disc, opt_disc=opt_disc,
                         step=state["step"] + 1)
        return new_state, loss, log

    def train_step(self, state, batch, key, batch_idx: int,
                   global_step: int):
        """Alternate optimizers like training_step (autoencoder.py:
        289-304): even batches (or anything before disc_start) train the
        generator, odd batches the discriminator."""
        optimizer_idx = batch_idx % 2
        if global_step < self.disc_start:
            optimizer_idx = 0
        if optimizer_idx == 0:
            return self.generator_step(state, batch, key, global_step)
        return self.discriminator_step(state, batch, key, global_step)
