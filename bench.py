"""Benchmark: continuous-batching decode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is rollout decode throughput (generated tokens/sec/chip) on a
Qwen2.5-0.5B-shaped model at full slot occupancy — the quantity PipelineRL's
actor side is bounded by (reference emits it as
``output_tokens_per_second``, actor.py:84-106; no absolute baseline is
published — BASELINE.md — so vs_baseline is reported against the
reference's H100 setup only when that number exists; null otherwise).

Secondary numbers (prefill throughput, step latency, train-step tokens/s)
go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pipelinerl_tpu.inference import EngineConfig, GenRequest, InferenceEngine, SamplingParams
    from pipelinerl_tpu.models.transformer import ModelConfig, init_params

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

    import os
    SLOTS = int(os.environ.get("BENCH_SLOTS", 64))
    PROMPT_LEN = 128
    MAX_TOKENS = 128
    WINDOW = int(os.environ.get("BENCH_WINDOW", 32))
    DEPTH = int(os.environ.get("BENCH_DEPTH", 2))
    engine = InferenceEngine(
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
        eos_token_id=-1,  # random weights: never stop early, measure full length
    )
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

    def drain(futures):
        while not all(f.done() for f in futures):
            engine.step()

    # warmup: compile prefill (batches 8/4/2/1) + decode, then stagger slots
    t0 = time.monotonic()
    drain(submit_wave(8) + submit_wave(4) + submit_wave(2) + submit_wave(1))
    log(f"warmup (compile) took {time.monotonic() - t0:.1f}s")

    # timed steady-state stream: jittered lengths stagger finishes, so the
    # run exercises continuous batching (admissions interleaving decode
    # windows) rather than one synchronized wave — the actor-side workload
    # shape of PipelineRL
    gen_before = engine.total_generated_tokens
    steps_before = engine.decode_steps
    t0 = time.monotonic()
    drain(submit_wave(3 * SLOTS, jitter=True))
    elapsed = time.monotonic() - t0
    gen = engine.total_generated_tokens - gen_before
    steps = engine.decode_steps - steps_before
    tok_per_sec = gen / elapsed
    log(
        f"generated {gen} tokens in {elapsed:.2f}s over {steps} decode steps "
        f"({1000 * elapsed / max(steps, 1):.1f} ms/step at batch {SLOTS})"
    )
    engine.stop()

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip_0.5b_bs64",
                "value": round(tok_per_sec, 1),
                "unit": "tokens/s",
                "vs_baseline": None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
