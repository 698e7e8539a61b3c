"""Autoregressive sampling library surface
(reference: sat/generation/autoregressive_sampling.py:52-150,
sat/generation/sampling_strategies/*).

Not on the SCAIL video path (the DiT is a diffusion model), but part of the
SAT library capabilities: `filling_sequence` drives any `logits_fn` with
top-k/top-p or beam-search strategies.  TPU-native: the decode loop is a
`lax.scan` over positions with a fixed-size sequence buffer (no dynamic
shapes), strategies are pure functions over logits.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class BaseStrategy:
    """top-k / top-p / temperature sampling (sampling_strategies/base_strategy.py)."""

    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 0.0
    end_tokens: Sequence[int] = ()

    def forward(self, logits, key):
        logits = logits.astype(jnp.float32) / max(self.temperature, 1e-6)
        if self.top_k > 0:
            kth = jnp.sort(logits, axis=-1)[..., -self.top_k][..., None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        if self.top_p > 0.0:
            sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            cutoff_idx = jnp.sum(cum < self.top_p, axis=-1, keepdims=True)
            cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
            logits = jnp.where(logits < cutoff, -jnp.inf, logits)
        return jax.random.categorical(key, logits, axis=-1)

    def is_done(self, tokens):
        if not self.end_tokens:
            return jnp.zeros(tokens.shape[0], bool)
        done = jnp.zeros(tokens.shape[0], bool)
        for e in self.end_tokens:
            done |= jnp.any(tokens == e, axis=-1)
        return done


def filling_sequence(
    logits_fn: Callable,
    seq: jnp.ndarray,            # (b, L) int32, -1 marks positions to fill
    strategy: Optional[BaseStrategy] = None,
    key=None,
):
    """Fill every -1 position left-to-right (autoregressive_sampling.py:52).

    logits_fn(tokens, position) -> (b, vocab) logits for the NEXT token given
    tokens[:, :position+1].  Compiles once; the loop is a lax.scan over the
    fill region with `lax.cond`-free masking (already-known positions keep
    their value).
    """
    strategy = strategy or BaseStrategy()
    key = key if key is not None else jax.random.PRNGKey(0)
    b, L = seq.shape
    to_fill = seq < 0
    first_fill = int(jnp.argmax(jnp.any(to_fill, axis=0)))

    def step(carry, pos):
        tokens, k = carry
        k, sk = jax.random.split(k)
        logits = logits_fn(tokens, pos - 1)
        sampled = strategy.forward(logits, sk)
        fill = tokens[:, pos] < 0
        tokens = tokens.at[:, pos].set(jnp.where(fill, sampled, tokens[:, pos]))
        return (tokens, k), None

    positions = jnp.arange(first_fill, L)
    (tokens, _), _ = jax.lax.scan(step, (seq, key), positions)
    return tokens


@dataclasses.dataclass
class BeamSearchStrategy:
    """Deterministic beam search (sampling_strategies/beam_search_strategy.py)."""

    num_beams: int = 4
    length_penalty: float = 1.0
    end_token: Optional[int] = None

    def search(self, logits_fn: Callable, prompt: jnp.ndarray, max_new: int):
        """prompt: (L0,) int32 -> best (L0+max_new,) sequence."""
        L0 = prompt.shape[0]
        nb = self.num_beams
        seqs = jnp.tile(prompt[None], (nb, 1))
        seqs = jnp.concatenate(
            [seqs, jnp.zeros((nb, max_new), jnp.int32)], axis=1)
        scores = jnp.full((nb,), -jnp.inf).at[0].set(0.0)

        def step(carry, i):
            seqs, scores = carry
            pos = L0 + i
            logits = logits_fn(seqs, pos - 1)          # (nb, vocab)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            vocab = logp.shape[-1]
            total = scores[:, None] + logp             # (nb, vocab)
            flat = total.reshape(-1)
            top_scores, top_idx = jax.lax.top_k(flat, nb)
            beam_idx = top_idx // vocab
            tok = top_idx % vocab
            seqs = seqs[beam_idx].at[:, pos].set(tok)
            return (seqs, top_scores), None

        (seqs, scores), _ = jax.lax.scan(step, (seqs, scores), jnp.arange(max_new))
        norm = scores / (jnp.asarray(max_new, jnp.float32) ** self.length_penalty)
        return seqs[jnp.argmax(norm)]
