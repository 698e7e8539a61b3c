"""AR generation library: greedy/top-k filling and beam search on toy LMs."""

import jax
import jax.numpy as jnp
import numpy as np

from scail_tpu.generation import BaseStrategy, BeamSearchStrategy, filling_sequence


def _counting_lm(tokens, pos):
    """Deterministic LM: next token = (current + 1) % vocab."""
    vocab = 7
    cur = tokens[:, pos]
    logits = jnp.full((tokens.shape[0], vocab), -1e9)
    nxt = (cur + 1) % vocab
    return logits.at[jnp.arange(tokens.shape[0]), nxt].set(0.0)


def test_filling_sequence_greedy():
    seq = jnp.asarray([[2, -1, -1, -1]], jnp.int32)
    out = filling_sequence(_counting_lm, seq, BaseStrategy(top_k=1),
                           key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), [[2, 3, 4, 5]])


def test_filling_preserves_known_positions():
    seq = jnp.asarray([[2, -1, 6, -1]], jnp.int32)
    out = filling_sequence(_counting_lm, seq, BaseStrategy(top_k=1),
                           key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), [[2, 3, 6, 0]])


def test_top_p_masks_tail():
    strat = BaseStrategy(top_p=0.6)
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    samples = [int(strat.forward(logits, jax.random.PRNGKey(i))[0]) for i in range(50)]
    assert set(samples) <= {0, 1}  # tail tokens masked


def test_beam_search_finds_best_path():
    # LM favoring token 1 at every step with slight noise; beam must return 1s
    def lm(tokens, pos):
        nb, vocab = tokens.shape[0], 5
        logits = jnp.zeros((nb, vocab))
        return logits.at[:, 1].set(2.0)

    bs = BeamSearchStrategy(num_beams=3)
    out = bs.search(lm, jnp.asarray([4], jnp.int32), max_new=4)
    np.testing.assert_array_equal(np.asarray(out), [4, 1, 1, 1, 1])
