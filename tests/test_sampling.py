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


def test_valid_vocab_excludes_padding_rows():
    """Padded-checkpoint guard (reference preprocess.py:107): ids beyond the
    tokenizer's entries are excluded from the candidate set even when their
    (untrained) logits dominate, for both sampler paths and greedy."""
    # padding row 3 has the largest logit
    logits = jnp.asarray([[0.0, 1.0, 0.5, 9.9]], jnp.float32)
    keys = jax.random.split(jax.random.key(3), 200)
    toks = jax.vmap(
        lambda k: sample_fast(logits, k, jnp.ones(1), valid_vocab=3)[0][0]
    )(keys)
    assert int(np.asarray(toks).max()) < 3
    # greedy picks the best VALID token
    t, _ = sample_fast(logits, jax.random.key(0), jnp.zeros(1), valid_vocab=3)
    assert int(t[0]) == 1
    t, _ = sample_masked(
        logits, jax.random.key(0), jnp.zeros(1), jnp.ones(1),
        jnp.zeros(1, jnp.int32), valid_vocab=3,
    )
    assert int(t[0]) == 1
    toks = jax.vmap(
        lambda k: sample_masked(
            logits, k, jnp.ones(1), jnp.ones(1), jnp.zeros(1, jnp.int32),
            valid_vocab=3,
        )[0][0]
    )(keys)
    assert int(np.asarray(toks).max()) < 3


def test_valid_vocab_engine_never_emits_padding_id():
    """Engine-level: a model whose lm_head favors padding rows must never
    emit an id >= valid_vocab into a rollout, and reported logprobs must
    still match teacher-forced score_tokens (trainer parity through the
    shared lm_head_logits mask)."""
    from dataclasses import replace

    from pipelinerl_tpu.inference import (
        EngineConfig, GenRequest, InferenceEngine, SamplingParams,
    )
    from pipelinerl_tpu.models.transformer import ModelConfig, init_params

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, num_kv_heads=2, dtype=jnp.float32,
        valid_vocab=48,
    )
    params = init_params(jax.random.key(0), cfg)
    # rig every padding row to dominate
    params["lm_head"] = params["lm_head"].at[:, 48:].add(5.0)
    engine = InferenceEngine(
        params, cfg,
        EngineConfig(max_slots=2, max_len=64, prefill_buckets=(16,),
                     cache_dtype=jnp.float32),
        eos_token_id=0,
    )
    temps = (0.0, 1.0)
    futs = [
        engine.submit(GenRequest([5, 7, 9], SamplingParams(temperature=t, max_tokens=24)))
        for t in temps
    ]
    import time as _time
    deadline = _time.monotonic() + 120
    while not all(f.done() for f in futs) and _time.monotonic() < deadline:
        engine.step()
    for temp, f in zip(temps, futs):
        res = f.result()
        assert res.token_ids, "no tokens generated"
        assert max(res.token_ids) < 48, res.token_ids
        if temp != 1.0:
            continue  # greedy reports the unscaled distribution by contract
        scored = engine.score_tokens([5, 7, 9] + res.token_ids)
        gen_lps = res.logprobs
        want = scored[2 : 2 + len(gen_lps)]
        np.testing.assert_allclose(gen_lps, want, rtol=1e-4, atol=1e-5)
    engine.stop()
