"""Fused EMA-Adam optimizer
(reference: sat/ops/fused_ema_adam.py + sat/ops/csrc/adam/multi_tensor_ema_adam.cu).

The reference launches one multi-tensor CUDA kernel doing the Adam update
AND the EMA shadow update (shadow = decay*shadow + (1-decay)*new_param) in a
single pass.  On TPU the same fusion falls out of XLA: the whole optax
transformation below compiles into one fused update; an explicit Pallas
kernel is unnecessary for bandwidth (every op is elementwise and XLA fuses
the chain).  State mirrors the CUDA kernel's: exp_avg, exp_avg_sq, shadow.

`adam_w_mode` and bias correction follow fused_ema_adam.py:8-90.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class EmaAdamState(NamedTuple):
    count: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    shadow: optax.Params


def fused_ema_adam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    ema_decay: float = 0.9999,
    adam_w_mode: bool = True,
    bias_correction: bool = True,
) -> optax.GradientTransformation:
    def init_fn(params):
        z = lambda p: jnp.zeros_like(p)
        return EmaAdamState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree.map(z, params),
            exp_avg_sq=jax.tree.map(z, params),
            # materialize a copy: the shadow must not alias the param buffers
            # (jit donation would otherwise see the same buffer twice)
            shadow=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
        )

    def update_fn(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        if bias_correction:
            c1 = 1.0 - b1 ** count.astype(jnp.float32)
            c2 = 1.0 - b2 ** count.astype(jnp.float32)
        else:
            c1 = c2 = 1.0

        def upd(g, m, v, p, s):
            g = g.astype(jnp.float32)
            pf = p.astype(jnp.float32)
            if not adam_w_mode and weight_decay:
                g = g + weight_decay * pf  # L2 mode (csrc ADAM_MODE 1)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            denom = jnp.sqrt(v / c2) + eps
            step = (m / c1) / denom
            if adam_w_mode and weight_decay:
                step = step + weight_decay * pf
            new_p = pf - lr * step
            new_s = ema_decay * s.astype(jnp.float32) + (1 - ema_decay) * new_p
            return (new_p - pf).astype(p.dtype), m, v, new_s.astype(s.dtype)

        out = jax.tree.map(upd, grads, state.exp_avg, state.exp_avg_sq, params,
                           state.shadow)
        # match exactly the plain 4-tuples from upd: NamedTuple pytree
        # nodes (e.g. optax.MaskedNode under multi_transform) must stay
        # traversable
        is_upd = lambda x: type(x) is tuple
        updates = jax.tree.map(lambda o: o[0], out, is_leaf=is_upd)
        m = jax.tree.map(lambda o: o[1], out, is_leaf=is_upd)
        v = jax.tree.map(lambda o: o[2], out, is_leaf=is_upd)
        s = jax.tree.map(lambda o: o[3], out, is_leaf=is_upd)
        return updates, EmaAdamState(count=count, exp_avg=m, exp_avg_sq=v, shadow=s)

    return optax.GradientTransformation(init_fn, update_fn)


def swap_in_ema(params, opt_state: EmaAdamState):
    """Return (ema_params, original) -- the reference's EMA double-save swap
    (sat/training/model_io.py:114-157).  Frozen leaves under a selective
    finetune (optax.masked/multi_transform) carry MaskedNode shadows;
    those fall back to the live (never-updated) params."""
    import optax

    def pick(s, p):
        return p if isinstance(s, optax.MaskedNode) else s.astype(p.dtype)

    ema = jax.tree.map(pick, opt_state.shadow, params,
                       is_leaf=lambda x: isinstance(x, optax.MaskedNode))
    return ema, params
