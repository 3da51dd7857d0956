"""Slab cross-turn prefix reuse (parked slots): turn N+1 of a conversation
must resume the finished slot's KV and prefill only the tail, with outputs
identical to a cold full-prompt prefill — the production-reachable prefix
cache for the DEFAULT kv layout (round-4 verdict missing #2: the paged-only
prefix cache was never enabled by any shipped config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.inference import (
    EngineConfig,
    GenRequest,
    InferenceEngine,
    SamplingParams,
)
from pipelinerl_tpu.models.transformer import ModelConfig, init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), cfg)
    return params, cfg


def _engine(params, cfg, prefix_cache=True, max_slots=4):
    return InferenceEngine(
        params, cfg,
        EngineConfig(
            max_slots=max_slots, max_len=256,
            prefill_buckets=(32, 64, 128, 192),
            cache_dtype=jnp.float32, decode_window=4,
            kv_layout="slab", prefix_cache=prefix_cache,
            slab_prefix_min_tokens=8,
        ),
        eos_token_id=-1,
    )


def _drain(engine, futures):
    while not all(f.done() for f in futures):
        engine.step()


def _greedy(n):
    return SamplingParams(temperature=0.0, max_tokens=n)


def test_multiturn_resumes_parked_slot(setup):
    params, cfg = setup
    rng = np.random.default_rng(0)
    base = rng.integers(1, 120, 40).tolist()

    # cold reference: two-turn conversation without parking
    cold = _engine(params, cfg, prefix_cache=False)
    f1 = cold.submit(GenRequest(prompt_ids=list(base), params=_greedy(8)))
    _drain(cold, [f1])
    turn2 = base + f1.result().token_ids + rng.integers(1, 120, 10).tolist()
    f2 = cold.submit(GenRequest(prompt_ids=list(turn2), params=_greedy(8)))
    _drain(cold, [f2])
    cold_tokens = f2.result().token_ids
    cold.stop()

    warm = _engine(params, cfg, prefix_cache=True)
    g1 = warm.submit(GenRequest(prompt_ids=list(base), params=_greedy(8)))
    _drain(warm, [g1])
    assert g1.result().token_ids == f1.result().token_ids
    # the finished slot is parked with its transcript
    assert len(warm._parked) == 1
    prefill_before = warm.total_prefill_tokens
    g2 = warm.submit(GenRequest(prompt_ids=list(turn2), params=_greedy(8)))
    _drain(warm, [g2])
    assert warm.slab_prefix_hits == 1
    # only the tail was prefilled (transcript = 48 tokens reused)
    tail_prefilled = warm.total_prefill_tokens - prefill_before
    assert tail_prefilled < len(turn2)
    assert warm.prefill_reused_tokens >= len(base)
    # token-exact vs the cold path
    assert g2.result().token_ids == cold_tokens
    warm.stop()


def test_parked_slots_evicted_under_pressure(setup):
    """Parking must never reduce peak concurrency: with all slots parked,
    fresh unrelated prompts evict LRU and admit normally."""
    params, cfg = setup
    rng = np.random.default_rng(1)
    engine = _engine(params, cfg, prefix_cache=True, max_slots=2)
    futures = [
        engine.submit(GenRequest(
            prompt_ids=rng.integers(1, 120, 24).tolist(), params=_greedy(4)
        ))
        for _ in range(2)
    ]
    _drain(engine, futures)
    assert len(engine._parked) == 2
    # four new unrelated prompts need both parked slots back
    futures = [
        engine.submit(GenRequest(
            prompt_ids=rng.integers(1, 120, 24).tolist(), params=_greedy(4)
        ))
        for _ in range(4)
    ]
    _drain(engine, futures)
    assert all(len(f.result().token_ids) == 4 for f in futures)
    engine.stop()


def test_park_skips_visual_and_short(setup):
    params, cfg = setup
    engine = _engine(params, cfg, prefix_cache=True)
    # short transcript (< slab_prefix_min_tokens=8): not parked
    f = engine.submit(GenRequest(prompt_ids=[5, 6], params=_greedy(2)))
    _drain(engine, [f])
    assert len(engine._parked) == 0
    engine.stop()


def test_multiturn_lineages_batch(setup):
    """Several lineages advancing in lockstep (the guessing shape) all hit
    their parked slots in one admission wave; outputs stay token-exact."""
    params, cfg = setup
    rng = np.random.default_rng(2)
    engine = _engine(params, cfg, prefix_cache=True, max_slots=4)
    bases = [rng.integers(1, 120, 30).tolist() for _ in range(3)]
    fs = [
        engine.submit(GenRequest(prompt_ids=list(b), params=_greedy(6)))
        for b in bases
    ]
    _drain(engine, fs)
    assert len(engine._parked) == 3
    turn2 = [
        b + f.result().token_ids + rng.integers(1, 120, 8).tolist()
        for b, f in zip(bases, fs)
    ]
    gs = [
        engine.submit(GenRequest(prompt_ids=list(t), params=_greedy(6)))
        for t in turn2
    ]
    _drain(engine, gs)
    assert engine.slab_prefix_hits == 3
    counters = engine.perf_counters()
    assert counters["prefix_cache_hits"] == 3
    engine.stop()


def test_resume_token_exact_at_window_boundary(setup):
    """max_tokens = 1 + k*W lands the final token exactly on a window
    boundary — that token's KV row is never written (it is only written
    when fed as a later step's input). Parking must exclude it, or the
    resumed turn attends over a garbage row and silently diverges
    (code-review finding, round 5)."""
    params, cfg = setup
    rng = np.random.default_rng(7)
    base = rng.integers(1, 120, 40).tolist()

    def two_turns(prefix_cache):
        eng = _engine(params, cfg, prefix_cache=prefix_cache)
        # decode_window=4 in _engine; max_tokens=9 = 1 prefill-sampled + 2*4
        f1 = eng.submit(GenRequest(prompt_ids=list(base), params=_greedy(9)))
        _drain(eng, [f1])
        t2 = base + f1.result().token_ids + rng.integers(1, 120, 10).tolist()
        f2 = eng.submit(GenRequest(prompt_ids=list(t2), params=_greedy(9)))
        _drain(eng, [f2])
        out = (f1.result().token_ids, f2.result().token_ids)
        hits = eng.slab_prefix_hits
        eng.stop()
        return out, hits

    rng = np.random.default_rng(7)
    (cold1, cold2), _ = two_turns(False)
    rng = np.random.default_rng(7)
    (warm1, warm2), hits = two_turns(True)
    assert warm1 == cold1
    assert hits == 1
    assert warm2 == cold2, "resumed turn diverged (unwritten final-token row?)"
