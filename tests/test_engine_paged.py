"""Paged KV engine: greedy parity with the slab layout, GRPO fork page
sharing, pool-exhaustion admission deferral, and page accounting across the
request lifecycle (the vLLM paged-attention role, SURVEY.md §2.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.inference import EngineConfig, GenRequest, InferenceEngine, SamplingParams
from pipelinerl_tpu.models.transformer import ModelConfig, init_params

pytestmark = pytest.mark.slow

EOS = 250


def _model():
    cfg = ModelConfig(
        vocab_size=260, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, dtype=jnp.float32,
    )
    return init_params(jax.random.key(0), cfg), cfg


def _engine(params, model_cfg, layout, **over):
    kwargs = dict(
        max_slots=4,
        max_len=96,
        prefill_buckets=(32, 64),
        cache_dtype=jnp.float32,
        decode_window=4,
        window_pipeline_depth=1,
        kv_layout=layout,
        kv_block_size=16,
    )
    kwargs.update(over)
    eng = InferenceEngine(params, model_cfg, EngineConfig(**kwargs), eos_token_id=EOS)
    return eng


def _drain(engine, futures):
    for _ in range(3000):
        engine.step()
        if all(f.done() for f in futures):
            return [f.result() for f in futures]
    raise TimeoutError("engine did not finish")


def _greedy(prompt, max_tokens=10):
    return GenRequest(
        prompt_ids=list(prompt),
        params=SamplingParams(temperature=0.0, max_tokens=max_tokens),
    )


def test_paged_matches_slab_greedy():
    params, model_cfg = _model()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 200, n).tolist() for n in (5, 17, 31, 23)]

    slab = _engine(params, model_cfg, "slab")
    ref = _drain(slab, [slab.submit(_greedy(p)) for p in prompts])
    slab.stop()

    paged = _engine(params, model_cfg, "paged")
    got = _drain(paged, [paged.submit(_greedy(p)) for p in prompts])
    paged.stop()

    for r, g in zip(ref, got):
        assert g.token_ids == r.token_ids, (r.token_ids, g.token_ids)
        # the paged kernel streams K/V in bf16 (slab XLA path is fp32 here),
        # so logprobs agree to bf16 attention precision, not exactly
        np.testing.assert_allclose(g.logprobs, r.logprobs, rtol=1e-2, atol=1e-2)
        assert g.finish_reason == r.finish_reason


def test_paged_fork_shares_prompt_pages():
    params, model_cfg = _model()
    rng = np.random.default_rng(1)
    prompt = rng.integers(1, 200, 20).tolist()  # 1 full 16-page + partial tail
    engine = _engine(params, model_cfg, "paged", prefix_cache=False)
    futures = [engine.submit(_greedy(prompt, max_tokens=6)) for _ in range(4)]
    # admit (one engine step) then check sharing before completion
    engine.step()
    assert engine.prefill_reused_tokens == 3 * 20
    pool = engine.block_pool
    # the full prompt page is shared by 4 slots
    shared_page = pool.table[0, 0]
    assert pool.refs[shared_page] == 4
    results = _drain(engine, futures)
    # forks must produce the same greedy continuation as the primary
    for r in results[1:]:
        assert r.token_ids == results[0].token_ids
    # all pages return to the pool after completion
    assert pool.free_blocks == pool.n_blocks
    pool.check_invariants()
    engine.stop()


def test_paged_pool_exhaustion_defers_admission():
    params, model_cfg = _model()
    rng = np.random.default_rng(2)
    # pool sized for ~2 concurrent requests: each reserves
    # 31 + 10 + 4 = 45 tokens → 3 pages of 16
    engine = _engine(
        params, model_cfg, "paged", kv_pool_blocks=6, max_slots=4,
        prefix_cache=False,
    )
    prompts = [rng.integers(1, 200, 31).tolist() for _ in range(5)]
    futures = [engine.submit(_greedy(p, max_tokens=10)) for p in prompts]
    engine.step()
    assert engine.num_active <= 2  # third+ deferred despite free slots
    results = _drain(engine, futures)  # deferred work completes as pages free
    for r in results:
        assert r.finish_reason in ("stop", "length")
        assert len(r.token_ids) >= 1
    assert engine.block_pool.free_blocks == 6
    engine.block_pool.check_invariants()
    engine.stop()


def test_paged_bucket_growth_and_shrink_parity():
    """The decode dispatch slices the block table to the pow2-bucketed max
    pages held by any ACTIVE slot (the window-amortized contiguous gather
    reads only the active working set). Drive the bucket up (a long-budget
    request joins) and back down (it retires) within one engine lifetime
    and check greedy parity against slab across the re-traces."""
    params, model_cfg = _model()
    rng = np.random.default_rng(7)
    short = rng.integers(1, 200, 6).tolist()  # ~3 pages reserved
    long = rng.integers(1, 200, 9).tolist()  # 9 + 70 + 4 → 6 pages → bucket 8

    def run(layout):
        eng = _engine(params, model_cfg, layout)
        outs = []
        # phase 1: short request alone (small bucket)
        outs += _drain(eng, [eng.submit(_greedy(short, max_tokens=8))])
        # phase 2: short + long in flight together (bucket grows mid-run)
        f_long = eng.submit(_greedy(long, max_tokens=70))
        f_short = eng.submit(_greedy(short, max_tokens=8))
        outs += _drain(eng, [f_long, f_short])
        # phase 3: long retired — bucket shrinks back
        outs += _drain(eng, [eng.submit(_greedy(short, max_tokens=8))])
        eng.stop()
        return outs

    ref = run("slab")
    got = run("paged")
    for r, g in zip(ref, got):
        assert g.token_ids == r.token_ids, (r.token_ids, g.token_ids)
        assert g.finish_reason == r.finish_reason


def test_paged_pallas_kernel_path_parity():
    """decode_attn_impl="ragged" routes the paged window through the Pallas
    page-table kernel (not the contiguous-gather XLA path). The host-side
    block-table slice must keep that kernel's grid/index maps consistent —
    greedy parity against slab on a bucket-sized workload (interpret mode
    on CPU)."""
    params, model_cfg = _model()
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 200, n).tolist() for n in (5, 19)]

    slab = _engine(params, model_cfg, "slab")
    ref = _drain(slab, [slab.submit(_greedy(p, max_tokens=6)) for p in prompts])
    slab.stop()

    paged = _engine(params, model_cfg, "paged", decode_attn_impl="ragged")
    got = _drain(paged, [paged.submit(_greedy(p, max_tokens=6)) for p in prompts])
    paged.stop()

    for r, g in zip(ref, got):
        assert g.token_ids == r.token_ids, (r.token_ids, g.token_ids)
        assert g.finish_reason == r.finish_reason


def test_paged_counters_and_abort():
    params, model_cfg = _model()
    rng = np.random.default_rng(3)
    engine = _engine(params, model_cfg, "paged", prefix_cache=False)
    req = GenRequest(
        prompt_ids=rng.integers(1, 200, 8).tolist(),
        params=SamplingParams(temperature=1.0, max_tokens=40),
        request_id="abortme",
    )
    fut = engine.submit(req)
    engine.step()
    counters = engine.perf_counters()
    assert counters["kv_pages_total"] == engine.block_pool.n_blocks
    assert counters["kv_pages_free"] < counters["kv_pages_total"]
    engine.abort("abortme")
    engine.step()
    assert fut.result(timeout=5).finish_reason == "abort"
    assert engine.block_pool.free_blocks == engine.block_pool.n_blocks
    engine.stop()


def test_prefix_cache_reuses_transcript_pages():
    """Cross-request prefix reuse: a request whose prompt extends a finished
    transcript must reattach the transcript's full pages (prefill only the
    tail) and produce EXACTLY the tokens a cold engine produces (the vLLM
    prefix-cache role, SURVEY.md §2.4)."""
    params, model_cfg = _model()
    rng = np.random.default_rng(1)
    prompt1 = rng.integers(1, 240, 20).tolist()

    warm = _engine(params, model_cfg, "paged", prefix_cache=True)
    r1 = _drain(warm, [warm.submit(_greedy(prompt1, max_tokens=8))])[0]
    transcript = prompt1 + r1.token_ids
    assert len(transcript) >= 16  # at least one full page registered
    prompt2 = transcript + rng.integers(1, 240, 6).tolist()

    r2_warm = _drain(warm, [warm.submit(_greedy(prompt2, max_tokens=8))])[0]
    counters = warm.perf_counters()
    assert counters["prefix_cache_hits"] >= 1
    assert counters["prefix_cache_reused_tokens"] >= 16
    assert warm.prefill_reused_tokens >= 16

    cold = _engine(params, model_cfg, "paged", prefix_cache=False)
    r2_cold = _drain(cold, [cold.submit(_greedy(prompt2, max_tokens=8))])[0]
    assert r2_warm.token_ids == r2_cold.token_ids
    assert [round(a, 4) for a in r2_warm.logprobs] == [
        round(a, 4) for a in r2_cold.logprobs
    ]


def test_prefix_cache_multi_turn_conversation():
    """13-turn guessing-shaped lineage: every turn after the first reuses the
    prior transcript's pages; total prefilled tokens stay near the sum of
    per-turn deltas instead of growing quadratically."""
    params, model_cfg = _model()
    rng = np.random.default_rng(2)
    engine = _engine(
        params, model_cfg, "paged", max_len=512, prefill_buckets=(32, 64, 128, 256, 512),
        kv_pool_blocks=256,
    )
    transcript = rng.integers(1, 240, 24).tolist()
    turns = 8
    for _ in range(turns):
        res = _drain(engine, [engine.submit(_greedy(transcript, max_tokens=4))])[0]
        transcript = transcript + res.token_ids + rng.integers(1, 240, 6).tolist()
    c = engine.perf_counters()
    assert c["prefix_cache_hits"] >= turns - 1
    # naive prefill would recompute the whole transcript each turn
    naive = sum(24 + i * 10 for i in range(turns))
    assert c["prefill_tokens"] < naive * 0.6, c


def test_prefix_cache_eviction_under_pressure():
    """Cached pages are evicted LRU when admissions need the pool."""
    params, model_cfg = _model()
    rng = np.random.default_rng(3)
    # tiny pool: 12 pages of 16 tokens; reserve per request ≈ prompt(20)
    # + max_new + window
    engine = _engine(
        params, model_cfg, "paged", max_slots=2, kv_pool_blocks=12,
    )
    for i in range(6):
        prompt = rng.integers(1, 240, 20).tolist()
        _drain(engine, [engine.submit(_greedy(prompt, max_tokens=8))])
    # the cache never blocks admission and pages_held stays bounded
    c = engine.perf_counters()
    assert c["kv_pages_free"] + c["prefix_cache_pages"] <= 12
    engine.block_pool.check_invariants()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ devices")
def test_paged_tp_matches_single_device():
    """Paged KV under tensor parallelism (round-2 verdict: paged rejected
    tp — the pool now shards its kv-head dim over the tp mesh and decode
    uses the GSPMD-partitionable XLA paged path)."""
    params, model_cfg = _model()
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 240, n).tolist() for n in (12, 25, 40)]
    plain = _engine(params, model_cfg, "paged")
    ref = _drain(plain, [plain.submit(_greedy(p, max_tokens=6)) for p in prompts])

    tp_engine = _engine(params, model_cfg, "paged", tp=2)
    assert tp_engine.mesh is not None
    got = _drain(tp_engine, [tp_engine.submit(_greedy(p, max_tokens=6)) for p in prompts])
    for a, b in zip(ref, got):
        assert a.token_ids == b.token_ids
    # in-flight weight push resharding works on the paged mesh too
    tp_engine.update_params(params, version=3)
    tp_engine.step()
    assert tp_engine.version == 3


def test_auto_layout_is_slab_paged_is_opt_in():
    """kv_layout=auto resolves to slab at every length (BENCH_r04: paged
    measured 0.22x slab throughput even with a 2.1x concurrency win);
    paged remains available explicitly for prefix-cache serving."""
    params, model_cfg = _model()
    short = _engine(params, model_cfg, "auto")
    assert not short.paged
    long = _engine(
        params, model_cfg, "auto", max_len=4096,
        prefill_buckets=(64, 128), kv_pool_blocks=64,
    )
    assert not long.paged
    explicit = _engine(
        params, model_cfg, "paged", max_len=4096,
        prefill_buckets=(64, 128), kv_pool_blocks=64,
    )
    assert explicit.paged


def test_prefix_extend_batched_heterogeneous_wave():
    """Two lineages with DIFFERENT prefix lengths extended in the SAME
    admission wave must share one batched _prefill_extend dispatch and
    produce exact parity with a cold (prefix_cache=False) engine — guards
    the heterogeneous (prefix_len, page-count) batching added in round 3
    (advisor round-3 finding: the path was only probed externally)."""
    params, model_cfg = _model()
    rng = np.random.default_rng(7)
    warm = _engine(
        params, model_cfg, "paged", prefix_cache=True, max_len=256,
        prefill_buckets=(32, 64, 128, 256), kv_pool_blocks=128,
    )
    # build two transcripts with different lengths (different page counts)
    base_a = rng.integers(1, 240, 30).tolist()
    base_b = rng.integers(1, 240, 52).tolist()
    ra = _drain(warm, [warm.submit(_greedy(base_a, max_tokens=6))])[0]
    rb = _drain(warm, [warm.submit(_greedy(base_b, max_tokens=6))])[0]
    prompt_a = base_a + ra.token_ids + rng.integers(1, 240, 5).tolist()
    prompt_b = base_b + rb.token_ids + rng.integers(1, 240, 9).tolist()
    # submit BOTH extensions before stepping: one admission wave
    futs = [warm.submit(_greedy(prompt_a, max_tokens=8)),
            warm.submit(_greedy(prompt_b, max_tokens=8))]
    got = _drain(warm, futs)
    c = warm.perf_counters()
    assert c["prefix_cache_hits"] >= 2, c
    warm.stop()

    cold = _engine(
        params, model_cfg, "paged", prefix_cache=False, max_len=256,
        prefill_buckets=(32, 64, 128, 256), kv_pool_blocks=128,
    )
    want = _drain(cold, [cold.submit(_greedy(p, max_tokens=8))
                         for p in (prompt_a, prompt_b)])
    cold.stop()
    for g, w in zip(got, want):
        assert g.token_ids == w.token_ids, (g.token_ids, w.token_ids)
        np.testing.assert_allclose(g.logprobs, w.logprobs, rtol=1e-4, atol=1e-5)
