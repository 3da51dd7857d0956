"""Benchmark: continuous-batching decode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The metric is rollout decode throughput (generated tokens/sec/chip) on a
Qwen2.5-0.5B-shaped model at full slot occupancy — the quantity PipelineRL's
actor side is bounded by (reference emits it as
``output_tokens_per_second``, actor.py:84-106; the reference publishes no
absolute number — BASELINE.md — so ``vs_baseline`` is reported against this
repo's round-1 result, BENCH_r01.json: 10006.5 tok/s).

Extras in the same JSON object: HBM-roofline utilization (decode is
weight-read-bound), grouped-rollout throughput (8 attempts sharing one
prompt — exercises the prefix-fork path), and warmup/compile time (persistent
compilation cache enabled, so the second run should be far cheaper).

Secondary numbers (prefill throughput, step latency) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROUND1_TOKS_PER_SEC = 10006.5  # BENCH_r01.json
V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth, bytes/s
V5E_BF16_TFLOPS = 197.0  # v5e peak bf16


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pipelinerl_tpu.inference import EngineConfig, GenRequest, InferenceEngine, SamplingParams
    from pipelinerl_tpu.models.transformer import ModelConfig, init_params
    from pipelinerl_tpu.utils import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"compilation cache: {cache_dir}")

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    model_cfg = ModelConfig(
        vocab_size=151_936,
        hidden_size=896,
        intermediate_size=4864,
        num_layers=24,
        num_heads=14,
        num_kv_heads=2,
        head_dim=64,
        rope_theta=1_000_000.0,
        attention_bias=True,
        dtype=jnp.bfloat16,
    )
    params = init_params(jax.random.key(0), model_cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    param_bytes = sum(
        int(np.prod(p.shape)) * p.dtype.itemsize for p in jax.tree.leaves(params)
    )
    log(f"model: {n_params / 1e6:.0f}M params, {param_bytes / 1e9:.2f} GB")

    SLOTS = int(os.environ.get("BENCH_SLOTS", 64))
    PROMPT_LEN = 128
    MAX_TOKENS = 128
    WINDOW = int(os.environ.get("BENCH_WINDOW", 32))
    DEPTH = int(os.environ.get("BENCH_DEPTH", 2))

    def make_engine():
        return InferenceEngine(
            params,
            model_cfg,
            EngineConfig(
                max_slots=SLOTS,
                max_len=PROMPT_LEN + MAX_TOKENS + 72,
                prefill_buckets=(128,),
                cache_dtype=jnp.bfloat16,
                # over the tunneled chip each host sync costs ~1 RTT; long
                # windows + depth-2 pipelining amortize it
                decode_window=WINDOW,
                window_pipeline_depth=DEPTH,
            ),
            eos_token_id=-1,  # random weights: never stop early
        )

    engine = make_engine()
    log(f"decode_attn_impl: {engine.decode_attn_impl}")
    rng = np.random.default_rng(0)

    def submit_wave(n, jitter=False):
        futures = []
        for _ in range(n):
            prompt = rng.integers(1, 100_000, PROMPT_LEN - 1).tolist()
            max_tok = int(rng.integers(MAX_TOKENS // 2, MAX_TOKENS + 1)) if jitter else MAX_TOKENS
            futures.append(
                engine.submit(
                    GenRequest(
                        prompt_ids=prompt,
                        params=SamplingParams(temperature=1.0, max_tokens=max_tok),
                    )
                )
            )
        return futures

    def submit_groups(n_groups, group=8):
        """GRPO-shaped load: ``group`` attempts share one prompt (prefix fork)."""
        futures = []
        for _ in range(n_groups):
            prompt = rng.integers(1, 100_000, PROMPT_LEN - 1).tolist()
            for _ in range(group):
                futures.append(
                    engine.submit(
                        GenRequest(
                            prompt_ids=list(prompt),
                            params=SamplingParams(temperature=1.0, max_tokens=MAX_TOKENS),
                        )
                    )
                )
        return futures

    def drain(futures):
        while not all(f.done() for f in futures):
            engine.step()

    # warmup: compile prefill (batches 8/4/2/1), decode, and fork programs
    t0 = time.monotonic()
    drain(submit_wave(8) + submit_wave(4) + submit_wave(2) + submit_wave(1))
    drain(submit_groups(1, group=8))
    warmup_s = time.monotonic() - t0
    log(f"warmup (compile) took {warmup_s:.1f}s")

    # headline: synchronized full-occupancy waves — the same workload BENCH_r01
    # measured, so vs_baseline is apples-to-apples
    gen_before = engine.total_generated_tokens
    steps_before = engine.decode_steps
    t0 = time.monotonic()
    drain(submit_wave(SLOTS))
    drain(submit_wave(SLOTS))
    elapsed = time.monotonic() - t0
    gen = engine.total_generated_tokens - gen_before
    steps = engine.decode_steps - steps_before
    tok_per_sec = gen / elapsed
    ms_per_step = 1000 * elapsed / max(steps, 1)
    log(
        f"generated {gen} tokens in {elapsed:.2f}s over {steps} decode steps "
        f"({ms_per_step:.1f} ms/step at batch {SLOTS})"
    )

    # continuous-batching stream: jittered lengths stagger finishes so
    # admissions interleave decode windows (the realistic actor-side load)
    gen_before = engine.total_generated_tokens
    t0 = time.monotonic()
    drain(submit_wave(3 * SLOTS, jitter=True))
    stream_tok_per_sec = (engine.total_generated_tokens - gen_before) / (
        time.monotonic() - t0
    )
    log(f"continuous stream (jittered): {stream_tok_per_sec:.0f} tok/s")

    # roofline: each decode step reads all weights once plus the live KV
    steps_per_sec = steps / elapsed
    avg_ctx = PROMPT_LEN + MAX_TOKENS / 2
    kv_bytes_per_step = (
        SLOTS * avg_ctx * model_cfg.num_kv_heads * 64 * 2 * 2 * model_cfg.num_layers
    )
    hbm_bytes_per_sec = steps_per_sec * (param_bytes + kv_bytes_per_step)
    hbm_util = hbm_bytes_per_sec / (V5E_HBM_GBPS * 1e9)
    flops_per_tok = 2 * n_params
    mfu = tok_per_sec * flops_per_tok / (V5E_BF16_TFLOPS * 1e12)
    log(f"HBM roofline utilization ~{100 * hbm_util:.1f}%  (MFU {100 * mfu:.2f}%)")

    # grouped-rollout throughput: 8 attempts per prompt → prefill once, fork 7
    gen_before = engine.total_generated_tokens
    reused_before = engine.prefill_reused_tokens
    t0 = time.monotonic()
    drain(submit_groups(3 * SLOTS // 8, group=8))
    g_elapsed = time.monotonic() - t0
    g_gen = engine.total_generated_tokens - gen_before
    group_tok_per_sec = g_gen / g_elapsed
    log(
        f"grouped (8-way shared prompt): {group_tok_per_sec:.0f} tok/s, "
        f"reused {engine.prefill_reused_tokens - reused_before} prompt tokens via fork"
    )
    counters = engine.perf_counters()
    log(f"engine counters: {counters}")
    decode_impl = engine.decode_attn_impl
    engine.stop()
    del engine

    # trainer-side throughput: the reference's headline metric is
    # throughput/tokens_perGPU_per_sec (finetune_loop.py:882-905) — one
    # packed [1, L] REINFORCE grad+update step on the same 0.5B model
    train_tok_per_sec, train_mfu = bench_train_step(params, model_cfg)

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip_0.5b_bs64",
                "value": round(tok_per_sec, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tok_per_sec / ROUND1_TOKS_PER_SEC, 3),
                "hbm_roofline_frac": round(hbm_util, 3),
                "mfu": round(mfu, 4),
                "grouped_rollout_tokens_per_sec": round(group_tok_per_sec, 1),
                "continuous_stream_tokens_per_sec": round(stream_tok_per_sec, 1),
                "warmup_compile_s": round(warmup_s, 1),
                "speculation_waste_frac": round(counters["speculation_waste_frac"], 4),
                "decode_attn_impl": decode_impl,
                "train_tokens_per_sec_per_chip": round(train_tok_per_sec, 1),
                "train_mfu": round(train_mfu, 4),
            }
        ),
        flush=True,
    )


def bench_train_step(params, model_cfg) -> tuple[float, float]:
    """Packed-sequence RL grad+optimizer step throughput (tokens/s/chip) and
    training MFU on the bench model. Packed [1, L] row, REINFORCE loss,
    adamw, remat — the trainer's hot path (train/trainer.py grad_pass)."""
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from pipelinerl_tpu.train.rl_loss import RLLossConfig, rl_loss

    L_SEQ = int(os.environ.get("BENCH_TRAIN_SEQLEN", 4096))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    loss_cfg = RLLossConfig(policy_loss="reinforce", batch_size=8, max_segments=64)
    optimizer = optax.adamw(1e-5)
    opt_state = jax.jit(optimizer.init)(params)

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 100_000, (1, L_SEQ)).astype(np.int32)
    seg = (np.arange(L_SEQ) // (L_SEQ // 8)).astype(np.int32)[None]
    pos = (np.arange(L_SEQ) % (L_SEQ // 8)).astype(np.int32)[None]
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),  # every position contributes loss
        "position_ids": jnp.asarray(pos),
        "segment_ids": jnp.asarray(seg),
        "rewards": jnp.ones((1, L_SEQ), jnp.float32),
        "advantages": jnp.ones((1, L_SEQ), jnp.float32),
        "ref_logprobs": jnp.zeros((1, L_SEQ), jnp.float32),
        "old_logprobs": jnp.full((1, L_SEQ), -1.0, jnp.float32),
        "group_tokens": jnp.full((1, L_SEQ), float(L_SEQ // 8), jnp.float32),
        "num_labels": jnp.full((1, L_SEQ), float(L_SEQ // 8), jnp.float32),
        "overflow": jnp.zeros((1, L_SEQ), jnp.float32),
    }

    @jax.jit
    def train_step(p, o, b):
        def loss_fn(pp):
            return rl_loss(
                pp, model_cfg, loss_cfg, b, jnp.zeros(()), 100, jnp.zeros(()),
                remat=True,
            )

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, o2 = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    t0 = time.monotonic()
    params, opt_state, loss = train_step(params, opt_state, batch)
    jax.block_until_ready(loss)
    log(f"train-step compile took {time.monotonic() - t0:.1f}s")
    best = float("inf")
    for _ in range(5):
        t0 = time.monotonic()
        params, opt_state, loss = train_step(params, opt_state, batch)
        jax.block_until_ready(loss)
        best = min(best, time.monotonic() - t0)
    tok_per_sec = L_SEQ / best
    # fwd 2 + bwd 4 ≈ 6 × params FLOPs per token
    mfu = tok_per_sec * 6 * n_params / (V5E_BF16_TFLOPS * 1e12)
    log(
        f"train step: {1000 * best:.1f} ms @ L={L_SEQ} → {tok_per_sec:.0f} "
        f"tokens/s/chip (train MFU {100 * mfu:.1f}%)"
    )
    return tok_per_sec, mfu


if __name__ == "__main__":
    main()
