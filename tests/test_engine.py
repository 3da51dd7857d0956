"""Continuous-batching engine correctness on a tiny CPU model."""

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
from pipelinerl_tpu.models.transformer import ModelConfig, forward, init_params

EOS = 0


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(
        vocab_size=32,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=2,
        num_kv_heads=2,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), cfg)
    return params, cfg


def make_engine(params, cfg, max_slots=3, max_len=64):
    engine = InferenceEngine(
        params,
        cfg,
        EngineConfig(
            max_slots=max_slots,
            max_len=max_len,
            prefill_buckets=(8, 16, 32),
            cache_dtype=jnp.float32,
        ),
        eos_token_id=EOS,
    )
    return engine


def greedy_reference(params, cfg, prompt, n_steps):
    """Autoregressive greedy generation via the full forward — ground truth."""
    ids = list(prompt)
    out = []
    for _ in range(n_steps):
        T = len(ids)
        logits = forward(
            params,
            cfg,
            jnp.asarray(ids)[None, :],
            jnp.arange(T)[None, :],
            jnp.zeros((1, T), jnp.int32),
        )
        token = int(jnp.argmax(logits[0, -1]))
        out.append(token)
        ids.append(token)
        if token == EOS:
            break
    return out


def run_sync(engine, requests):
    futures = [engine.submit(r) for r in requests]
    for _ in range(10_000):
        if all(f.done() for f in futures):
            break
        engine.step()
    assert all(f.done() for f in futures), "engine did not finish"
    return [f.result() for f in futures]


def test_greedy_matches_full_forward(tiny_model):
    params, cfg = tiny_model
    engine = make_engine(params, cfg)
    prompts = [[5, 7, 9], [11, 3], [2, 4, 6, 8, 10, 12]]
    reqs = [
        GenRequest(p, SamplingParams(temperature=0.0, max_tokens=8)) for p in prompts
    ]
    results = run_sync(engine, reqs)
    for prompt, res in zip(prompts, results):
        expected = greedy_reference(params, cfg, prompt, 8)
        assert res.token_ids == expected, f"prompt {prompt}"
        assert res.finish_reason in ("stop", "length")
        assert res.prompt_tokens == len(prompt)


def test_logprobs_match_teacher_forcing(tiny_model):
    """THE RL contract: sampler logprobs == teacher-forced recompute of the
    full prompt+completion sequence."""
    params, cfg = tiny_model
    engine = make_engine(params, cfg)
    prompt = [5, 7, 9, 11]
    req = GenRequest(prompt, SamplingParams(temperature=1.0, max_tokens=6))
    (res,) = run_sync(engine, [req])
    full = prompt + res.token_ids
    scored = engine.score_tokens(full, temperature=1.0)
    # scored[i] is logprob of full[i+1]; completion starts at len(prompt)
    recomputed = scored[len(prompt) - 1 :]
    np.testing.assert_allclose(res.logprobs, recomputed, rtol=1e-4, atol=1e-5)


def test_oversubscription_completes(tiny_model):
    params, cfg = tiny_model
    engine = make_engine(params, cfg, max_slots=2)
    reqs = [
        GenRequest([3 + i, 5, 7], SamplingParams(temperature=1.0, max_tokens=5))
        for i in range(7)
    ]
    results = run_sync(engine, reqs)
    assert len(results) == 7
    for res in results:
        assert 1 <= len(res.token_ids) <= 5
        assert len(res.logprobs) == len(res.token_ids)


def test_interleaving_matches_solo_run(tiny_model):
    """A greedy request must produce identical tokens whether it runs alone
    or interleaved with other requests (slot isolation)."""
    params, cfg = tiny_model
    solo_engine = make_engine(params, cfg, max_slots=1)
    probe = GenRequest([9, 13, 17], SamplingParams(temperature=0.0, max_tokens=8))
    (solo,) = run_sync(solo_engine, [probe])

    busy_engine = make_engine(params, cfg, max_slots=3)
    noise = [
        GenRequest([i + 1, i + 2], SamplingParams(temperature=1.0, max_tokens=10))
        for i in range(5)
    ]
    results = run_sync(busy_engine, noise[:2] + [probe] + noise[2:])
    assert results[2].token_ids == solo.token_ids


def test_inflight_weight_update(tiny_model):
    params, cfg = tiny_model
    engine = make_engine(params, cfg, max_slots=1, max_len=256)
    req = GenRequest(
        [3, 5, 7], SamplingParams(temperature=1.0, max_tokens=200, stop_token_ids=())
    )
    future = engine.submit(req)
    # run a couple of decode windows, then swap weights mid-generation
    for _ in range(2):
        engine.step()
    new_params = init_params(jax.random.key(42), cfg)
    engine.update_params(new_params, version=100)
    for _ in range(10_000):
        if future.done():
            break
        engine.step()
    res = future.result()
    assert res.model_version_start == 0
    assert res.model_version_end == 100
    assert len(res.token_ids) >= 1


def test_max_tokens_capped_by_cache(tiny_model):
    params, cfg = tiny_model
    engine = make_engine(params, cfg, max_slots=1, max_len=16)
    prompt = list(range(1, 11))  # 10 tokens, cache 16 → at most 6 new
    req = GenRequest(prompt, SamplingParams(temperature=1.0, max_tokens=100))
    (res,) = run_sync(engine, [req])
    assert len(res.token_ids) <= 6


def test_oversized_prompt_aborts(tiny_model):
    params, cfg = tiny_model
    engine = make_engine(params, cfg, max_len=16)
    req = GenRequest(list(range(1, 40)), SamplingParams())
    res = engine.submit(req).result(timeout=1)
    assert res.finish_reason == "abort"


def test_tp_sharded_engine_matches_unsharded(tiny_model):
    """Greedy outputs must be identical with tensor-parallel sharding."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ devices")
    params, cfg = tiny_model
    plain = make_engine(params, cfg)
    prompts = [[5, 7, 9], [11, 3, 2, 4]]
    reqs = [GenRequest(p, SamplingParams(temperature=0.0, max_tokens=6)) for p in prompts]
    plain_results = run_sync(plain, reqs)

    tp_engine = InferenceEngine(
        params,
        cfg,
        EngineConfig(
            max_slots=3, max_len=64, prefill_buckets=(8, 16, 32),
            cache_dtype=jnp.float32, tp=2,
        ),
        eos_token_id=EOS,
    )
    assert tp_engine.mesh is not None
    tp_reqs = [GenRequest(p, SamplingParams(temperature=0.0, max_tokens=6)) for p in prompts]
    tp_results = run_sync(tp_engine, tp_reqs)
    for a, b in zip(plain_results, tp_results):
        assert a.token_ids == b.token_ids
    # in-flight reshard push works too
    tp_engine.update_params(params, version=5)
    tp_engine.step()
    assert tp_engine.version == 5


def test_staged_attention_matches_incremental():
    """decode_attention_staged over frozen cache + band must equal the old
    per-step decode_attention with an up-to-date cache."""
    from pipelinerl_tpu.ops.attention import decode_attention, decode_attention_staged

    rng = np.random.default_rng(0)
    S, T, K, G, Dh, W = 3, 16, 2, 3, 8, 4
    H = K * G
    q = jnp.asarray(rng.normal(size=(S, H, Dh)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(S, K, Dh)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(S, K, Dh)), jnp.float32)
    k_cache = jnp.asarray(rng.normal(size=(S, T, K, Dh)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(S, T, K, Dh)), jnp.float32)
    base_lens = jnp.asarray([5, 0, 9], jnp.int32)
    step = 2  # band rows 0..1 valid

    # build staged band ([W, S, K, Dh]) and the equivalent "written" cache
    k_staged = jnp.asarray(rng.normal(size=(W, S, K, Dh)), jnp.float32)
    v_staged = jnp.asarray(rng.normal(size=(W, S, K, Dh)), jnp.float32)
    k_upd, v_upd = k_cache, v_cache
    for s in range(S):
        for w in range(step):
            k_upd = k_upd.at[s, int(base_lens[s]) + w].set(k_staged[w, s])
            v_upd = v_upd.at[s, int(base_lens[s]) + w].set(v_staged[w, s])

    out_staged = decode_attention_staged(
        q, k_new, v_new, k_cache, v_cache, base_lens,
        k_staged, v_staged, jnp.asarray(step),
    )
    out_ref = decode_attention(
        q, k_new, v_new, k_upd, v_upd, base_lens + step
    )
    np.testing.assert_allclose(
        np.asarray(out_staged), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )


def test_merge_staged_scatter():
    from pipelinerl_tpu.inference.engine import _merge_staged

    L, S, T_alloc, K, Dh, W = 2, 3, 12, 2, 4, 4
    cache = jnp.zeros((L, S, T_alloc, K, Dh), jnp.float32)
    staged = jnp.ones((L, W, S, K, Dh), jnp.float32) * jnp.arange(
        1, S + 1, dtype=jnp.float32
    )[None, None, :, None, None]
    base = jnp.asarray([0, 3, 8], jnp.int32)
    merged = np.asarray(_merge_staged(cache, staged, base))
    for s, b in enumerate([0, 3, 8]):
        assert (merged[:, s, b : b + W] == s + 1).all()
        assert (np.delete(merged[:, s], range(b, b + W), axis=1) == 0).all()


def test_group_prefix_fork_matches_separate_prefill(tiny_model):
    """Identical prompts submitted together must fork the prefilled KV: one
    real prefill, siblings reuse it, and every slot's greedy continuation
    still matches the full-forward ground truth."""
    params, cfg = tiny_model
    engine = make_engine(params, cfg, max_slots=4)
    prompt = [5, 9, 3, 7]
    reqs = [
        GenRequest(list(prompt), SamplingParams(temperature=0.0, max_tokens=6))
        for _ in range(4)
    ]
    results = run_sync(engine, reqs)
    expected = greedy_reference(params, cfg, prompt, 6)
    for r in results:
        assert r.token_ids == expected
    # 1 prefill computed, 3 forked
    assert engine.total_prefill_tokens == len(prompt)
    assert engine.prefill_reused_tokens == 3 * len(prompt)


def test_group_fork_samples_independently(tiny_model):
    """Forked siblings draw their own first token (T=1 sampling must not be
    perfectly correlated across the group)."""
    params, cfg = tiny_model
    engine = make_engine(params, cfg, max_slots=8)
    prompt = [5, 9, 3]
    reqs = [
        GenRequest(list(prompt), SamplingParams(temperature=5.0, max_tokens=4))
        for _ in range(8)
    ]
    results = run_sync(engine, reqs)
    firsts = {r.token_ids[0] for r in results if r.token_ids}
    assert len(firsts) > 1, f"all 8 forked rollouts sampled {firsts}"


def test_abort_queued_and_inflight(tiny_model):
    """abort() resolves a queued request immediately and frees an in-flight
    slot at the next step, keeping the tokens generated so far."""
    params, cfg = tiny_model
    engine = make_engine(params, cfg, max_slots=1)
    running = GenRequest(
        [5, 9], SamplingParams(temperature=0.0, max_tokens=40), request_id="run"
    )
    queued = GenRequest(
        [7, 3], SamplingParams(temperature=0.0, max_tokens=40), request_id="waiting"
    )
    f_run = engine.submit(running)
    f_q = engine.submit(queued)
    # a few steps: running occupies the only slot, queued stays queued
    for _ in range(4):
        engine.step()
    assert not f_q.done()
    engine.abort("waiting")
    engine.step()
    assert f_q.done() and f_q.result().finish_reason == "abort"
    engine.abort("run")
    for _ in range(40):
        if f_run.done():
            break
        engine.step()
    res = f_run.result()
    assert res.finish_reason in ("abort", "stop", "length")
    if res.finish_reason == "abort":
        assert engine.aborted_requests >= 2
    # slot is free again and the engine still serves new work
    f_new = engine.submit(GenRequest([2, 4], SamplingParams(temperature=0.0, max_tokens=3)))
    for _ in range(200):
        if f_new.done():
            break
        engine.step()
    assert f_new.done() and f_new.result().finish_reason in ("stop", "length")


def test_perf_counters_shape(tiny_model):
    params, cfg = tiny_model
    engine = make_engine(params, cfg)
    run_sync(engine, [GenRequest([5, 9], SamplingParams(temperature=0.0, max_tokens=4))])
    c = engine.perf_counters()
    assert c["generated_tokens"] >= 4
    assert 0.0 <= c["speculation_waste_frac"] <= 1.0
    assert 0.0 < c["slot_occupancy"] <= 1.0


def test_pp_sharded_engine_matches_unsharded(tiny_model):
    """Greedy outputs must be identical with pipeline-parallel layer
    sharding (the reference's vLLM pipeline-parallel-size knob,
    conf/base.yaml:71) — and with the combined tp×pp mesh."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4+ devices")
    params, cfg = tiny_model
    plain = make_engine(params, cfg)
    prompts = [[5, 7, 9], [11, 3, 2, 4]]
    reqs = [GenRequest(p, SamplingParams(temperature=0.0, max_tokens=6)) for p in prompts]
    plain_results = run_sync(plain, reqs)

    for tp, pp in ((1, 2), (2, 2)):
        sharded = InferenceEngine(
            params,
            cfg,
            EngineConfig(
                max_slots=3, max_len=64, prefill_buckets=(8, 16, 32),
                cache_dtype=jnp.float32, tp=tp, pp=pp,
            ),
            eos_token_id=EOS,
        )
        assert sharded.mesh is not None
        sreqs = [
            GenRequest(p, SamplingParams(temperature=0.0, max_tokens=6))
            for p in prompts
        ]
        sresults = run_sync(sharded, sreqs)
        for a, b in zip(plain_results, sresults):
            assert a.token_ids == b.token_ids, (tp, pp)
        # in-flight reshard push works on the pp mesh too
        sharded.update_params(params, version=7)
        sharded.step()
        assert sharded.version == 7


def test_pp_rejects_indivisible_layers(tiny_model):
    params, cfg = tiny_model
    with pytest.raises(ValueError, match="not divisible"):
        InferenceEngine(
            params, cfg,
            EngineConfig(max_slots=2, max_len=64, prefill_buckets=(8,),
                         cache_dtype=jnp.float32, pp=3),
            eos_token_id=EOS,
        )


def test_adaptive_window_cuts_budget_speculation(tiny_model):
    """Budget-aware speculation: slots whose remaining max_tokens budget is
    below the full decode window must be served by a smaller compiled window
    (and the pipeline drained), cutting tokens decoded past the budget
    (round-2 BENCH wasted 23% of decode as speculation)."""
    params, cfg = tiny_model

    def run(adaptive):
        engine = InferenceEngine(
            params,
            cfg,
            EngineConfig(
                max_slots=4, max_len=64, prefill_buckets=(8, 16),
                cache_dtype=jnp.float32, decode_window=8,
                window_pipeline_depth=2, adaptive_window=adaptive,
            ),
            eos_token_id=EOS,
        )
        reqs = [
            GenRequest([3 + i, 5, 7], SamplingParams(temperature=0.0, max_tokens=3))
            for i in range(8)
        ]
        results = run_sync(engine, reqs)
        return engine, results

    adaptive_engine, adaptive_results = run(True)
    plain_engine, plain_results = run(False)
    # identical greedy outputs — window size is an execution detail
    for a, b in zip(adaptive_results, plain_results):
        assert a.token_ids == b.token_ids
    # small windows were actually dispatched
    assert any(w < 8 for w in adaptive_engine.window_size_counts)
    assert adaptive_engine.speculative_wasted_tokens < plain_engine.speculative_wasted_tokens


def test_streamed_host_weight_push(tiny_model):
    """A HOST-side (numpy) param tree pushed via update_params is staged
    onto the device by the engine's transfer thread and pointer-swapped
    between decode windows — requests in flight keep decoding throughout
    (round 3 chunked device_put ON the engine thread and stalled decode,
    BENCH_r03 utilization 0.008)."""
    import time as _time

    import numpy as _np

    params, cfg = tiny_model
    engine = make_engine(params, cfg)
    fut = engine.submit(GenRequest([5, 7, 9], SamplingParams(temperature=0.0, max_tokens=20)))
    engine.step()
    host_tree = jax.tree.map(lambda x: _np.asarray(x), params)
    engine.update_params(host_tree, version=9)
    # identical weights: greedy continuation must be unaffected by the swap
    deadline = _time.monotonic() + 60
    while _time.monotonic() < deadline:
        engine.step()
        if fut.done() and engine.version == 9:
            break
    assert engine.version == 9
    assert engine.last_push_timings["bytes"] > 0
    expected = greedy_reference(params, cfg, [5, 7, 9], 20)
    assert fut.result().token_ids == expected


def test_multiwindow_depth2_greedy_parity(tiny_model):
    """REGRESSION (round-3 find, present since round 2): with
    window_pipeline_depth=2, windows are dispatched before the previous
    window's sync, so the host's last-token view is one window stale — every
    generation spanning >1 decode window silently restarted each window from
    the wrong token. The device now carries the last sampled token between
    windows. Existing greedy tests never crossed a window boundary at
    depth 2 (budgets <= one window)."""
    params, cfg = tiny_model
    for depth in (1, 2, 3):
        engine = InferenceEngine(
            params,
            cfg,
            EngineConfig(
                max_slots=3, max_len=64, prefill_buckets=(8, 16),
                cache_dtype=jnp.float32, decode_window=4,
                window_pipeline_depth=depth, adaptive_window=False,
            ),
            eos_token_id=EOS,
        )
        prompts = [[5, 7, 9], [11, 3, 2, 4]]
        reqs = [
            GenRequest(p, SamplingParams(temperature=0.0, max_tokens=17))
            for p in prompts
        ]
        results = run_sync(engine, reqs)
        for prompt, res in zip(prompts, results):
            expected = greedy_reference(params, cfg, prompt, 17)
            assert res.token_ids == expected, f"depth={depth} prompt={prompt}"
        # logged logprobs must equal teacher-forcing across the boundaries
        for prompt, res in zip(prompts, results):
            seq = prompt + res.token_ids
            scored = engine.score_tokens(seq)
            ref_lps = scored[len(prompt) - 1 :]
            for a, b in zip(res.logprobs, ref_lps):
                assert abs(a - b) < 1e-3, f"depth={depth}"
        engine.stop()


def test_early_retirement_frees_slots_and_keeps_parity(tiny_model):
    """Budget-bound finishes are predictable at dispatch time: a slot whose
    remaining budget is covered by in-flight windows is freed for admission
    BEFORE its finishing window syncs (cutting the depth-driven detection
    lag behind the round-3 23% jittered waste). Results must be byte-equal
    to the unpipelined engine, and retired slots must actually re-admit
    while the old occupant's windows are still in flight."""
    params, cfg = tiny_model
    # depth 2, tiny windows: every multi-window generation crosses the
    # retire path; 12 requests through 2 slots forces reuse under lag
    engine = InferenceEngine(
        params, cfg,
        EngineConfig(max_slots=2, max_len=64, prefill_buckets=(8, 16),
                     cache_dtype=jnp.float32, decode_window=4,
                     window_pipeline_depth=2, adaptive_window=False),
        eos_token_id=EOS,
    )
    prompts = [[5 + i, 7, 9] for i in range(12)]
    budgets = [3, 9, 17, 6] * 3  # mix of sub-window and multi-window budgets
    reqs = [
        GenRequest(p, SamplingParams(temperature=0.0, max_tokens=b))
        for p, b in zip(prompts, budgets)
    ]
    results = run_sync(engine, reqs)
    for prompt, budget, res in zip(prompts, budgets, results):
        expected = greedy_reference(params, cfg, prompt, budget)
        assert res.token_ids == expected, (prompt, budget, res.token_ids, expected)
        # logprob parity with teacher forcing across retire boundaries
        scored = engine.score_tokens(prompt + res.token_ids)
        got = res.logprobs
        want = scored[len(prompt) - 1 : len(prompt) - 1 + len(got)]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert not engine._retiring, "retiring registry must drain"
    engine.stop()


def test_leaf_streamed_host_push_for_oversize_trees(tiny_model):
    """Pushes too large to double-buffer (7B on a 16 GB chip) stream leaf
    by leaf with one-leaf HBM overhead; forcing the threshold to 0 exercises
    that path: the swap must land, report mode=streamed, and leave greedy
    continuations correct."""
    import time as _time

    import numpy as _np

    params, cfg = tiny_model
    engine = InferenceEngine(
        params, cfg,
        EngineConfig(max_slots=2, max_len=64, prefill_buckets=(8, 16),
                     cache_dtype=jnp.float32,
                     push_double_buffer_max_bytes=0),
        eos_token_id=EOS,
    )
    fut = engine.submit(GenRequest([5, 7, 9], SamplingParams(temperature=0.0, max_tokens=20)))
    engine.step()
    host_tree = jax.tree.map(lambda x: _np.asarray(x), params)
    engine.update_params(host_tree, version=4)
    deadline = _time.monotonic() + 60
    while _time.monotonic() < deadline:
        engine.step()
        if fut.done() and engine.version == 4:
            break
    assert engine.version == 4
    assert engine.last_push_timings["mode"] == "streamed"
    expected = greedy_reference(params, cfg, [5, 7, 9], 20)
    assert fut.result().token_ids == expected
    engine.stop()
