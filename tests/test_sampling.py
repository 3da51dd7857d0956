import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.ops.sampling import sample_fast, sample_masked


def test_greedy_picks_argmax():
    logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 1.0]], jnp.float32)
    tokens, lps = sample_fast(logits, jax.random.key(0), jnp.zeros(2))
    np.testing.assert_array_equal(np.asarray(tokens), [1, 0])
    # greedy reports the unscaled distribution's logprob
    expected = jax.nn.log_softmax(logits, axis=-1)
    assert float(lps[0]) == pytest.approx(float(expected[0, 1]), rel=1e-5)


def test_fast_logprob_is_temperature_scaled():
    logits = jnp.asarray([[0.5, 1.5, -0.5, 0.0]], jnp.float32)
    temp = jnp.asarray([0.7])
    tokens, lps = sample_fast(logits, jax.random.key(1), temp)
    scaled = jax.nn.log_softmax(logits / 0.7, axis=-1)
    assert float(lps[0]) == pytest.approx(float(scaled[0, int(tokens[0])]), rel=1e-5)


def test_fast_sampling_distribution():
    logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]], jnp.float32))
    counts = np.zeros(3)
    key = jax.random.key(2)
    keys = jax.random.split(key, 400)
    toks = jax.vmap(lambda k: sample_fast(logits, k, jnp.ones(1))[0][0])(keys)
    for t in np.asarray(toks):
        counts[t] += 1
    freqs = counts / counts.sum()
    np.testing.assert_allclose(freqs, [0.7, 0.2, 0.1], atol=0.08)


def test_top_k_masks_tail():
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0, -1.0]], jnp.float32)
    keys = jax.random.split(jax.random.key(3), 200)
    toks = jax.vmap(
        lambda k: sample_masked(
            logits, k, jnp.ones(1), jnp.ones(1), jnp.asarray([2])
        )[0][0]
    )(keys)
    assert set(np.asarray(toks).tolist()) <= {0, 1}


def test_top_p_masks_tail():
    # probs ~ [0.85, 0.10, ...] → top_p=0.9 keeps exactly tokens {0, 1}
    logits = jnp.log(jnp.asarray([[0.85, 0.10, 0.03, 0.02]], jnp.float32))
    keys = jax.random.split(jax.random.key(4), 300)
    toks = jax.vmap(
        lambda k: sample_masked(
            logits, k, jnp.ones(1), jnp.asarray([0.9]), jnp.zeros(1, jnp.int32)
        )[0][0]
    )(keys)
    vals = set(np.asarray(toks).tolist())
    assert vals <= {0, 1}
    assert 1 in vals  # second token is inside the nucleus


def test_top_p_always_keeps_first_token():
    logits = jnp.log(jnp.asarray([[0.99, 0.01]], jnp.float32))
    tokens, _ = sample_masked(
        logits, jax.random.key(5), jnp.ones(1), jnp.asarray([0.001]), jnp.zeros(1, jnp.int32)
    )
    assert int(tokens[0]) == 0


def test_masked_logprob_unaffected_by_truncation():
    """The reported logprob must be the temperature-only distribution even
    when top-k/top-p truncate sampling — trainer/sampler contract."""
    logits = jnp.asarray([[1.0, 0.5, 0.0, -0.5]], jnp.float32)
    tokens, lps = sample_masked(
        logits, jax.random.key(6), jnp.ones(1), jnp.asarray([0.5]), jnp.asarray([2])
    )
    full = jax.nn.log_softmax(logits, axis=-1)
    assert float(lps[0]) == pytest.approx(float(full[0, int(tokens[0])]), rel=1e-5)
