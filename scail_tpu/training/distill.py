"""Teacher/student distillation utilities (reference:
sat/model/official/distill_model.py — DistillModel pairs a frozen
teacher with a trainable student and returns both logits; the loss is
supplied by the finetune script).

Functional equivalents: `distill_forward` runs both nets under one tree
{'teacher': ..., 'student': ...}, `student_only_optimizer` freezes the
teacher (the reference's disable_untrainable_params), and `kd_loss` is
the standard soft-target KL + hard-label CE mixture used by BERT
distillation."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def distill_forward(tree, teacher_fn, student_fn, *args, **kwargs):
    """Returns (teacher_logits, student_logits); teacher runs under
    stop_gradient (frozen, distill_model.py:14-17)."""
    t = jax.lax.stop_gradient(teacher_fn(tree["teacher"], *args, **kwargs))
    s = student_fn(tree["student"], *args, **kwargs)
    return t, s


def student_only_optimizer(tx):
    """Only the 'student' subtree trains (distill_model.py
    disable_untrainable_params)."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        param_labels=lambda tree: jax.tree.map_with_path(
            lambda path, _: "train" if any(
                getattr(p, "key", None) == "student" for p in path
            ) else "freeze", tree),
    )


def kd_loss(student_logits, teacher_logits, labels=None, *,
            temperature: float = 2.0, alpha: float = 0.5):
    """alpha * T^2 * KL(softmax(t/T) || softmax(s/T)) +
    (1-alpha) * CE(student, labels).  labels None -> soft term only."""
    T = temperature
    t = jax.nn.log_softmax(teacher_logits / T, axis=-1)
    s = jax.nn.log_softmax(student_logits / T, axis=-1)
    soft = jnp.sum(jnp.exp(t) * (t - s), axis=-1).mean() * (T * T)
    if labels is None:
        return soft
    hard = optax.softmax_cross_entropy_with_integer_labels(
        student_logits, labels).mean()
    return alpha * soft + (1.0 - alpha) * hard
