"""Probe: decode throughput vs (slots, window, adaptive policy).

Decode at short context is HBM-bandwidth-bound on the weights: a step at
batch 64 and batch 256 read the same 1.26 GB, so widening the slot batch is
nearly free throughput — this probe finds the knee. Also compares the
adaptive (median-remaining) window policy against fixed windows on the
jittered continuous-batching workload.

Run ALONE on the TPU: python scripts/probe_decode.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_config(params, model_cfg, slots, window, adaptive):
    import jax.numpy as jnp

    from pipelinerl_tpu.inference import (
        EngineConfig,
        GenRequest,
        InferenceEngine,
        SamplingParams,
    )

    engine = InferenceEngine(
        params,
        model_cfg,
        EngineConfig(
            max_slots=slots,
            max_len=328,
            prefill_buckets=(128,),
            cache_dtype=jnp.bfloat16,
            decode_window=window,
            window_pipeline_depth=2,
            adaptive_window=adaptive,
        ),
        eos_token_id=-1,
    )
    rng = np.random.default_rng(0)

    def wave(n, jitter):
        futures = []
        for _ in range(n):
            prompt = rng.integers(1, 100_000, 127).tolist()
            mt = int(rng.integers(64, 129)) if jitter else 128
            futures.append(
                engine.submit(
                    GenRequest(prompt, SamplingParams(temperature=1.0, max_tokens=mt))
                )
            )
        return futures

    def drain(futures):
        while not all(f.done() for f in futures):
            engine.step()

    t0 = time.monotonic()
    drain(wave(8, False) + wave(4, False) + wave(2, False) + wave(1, True))
    compile_s = time.monotonic() - t0

    gen0 = engine.total_generated_tokens
    t0 = time.monotonic()
    drain(wave(2 * slots, False))
    sync_rate = (engine.total_generated_tokens - gen0) / (time.monotonic() - t0)

    gen0 = engine.total_generated_tokens
    waste0 = engine.speculative_wasted_tokens
    t0 = time.monotonic()
    drain(wave(3 * slots, True))
    elapsed = time.monotonic() - t0
    gen = engine.total_generated_tokens - gen0
    waste = engine.speculative_wasted_tokens - waste0
    jit_rate = gen / elapsed
    counters = engine.perf_counters()
    print(
        f"S={slots:4d} W={window:3d} adaptive={int(adaptive)}: "
        f"sync {sync_rate:7.0f} tok/s  jitter {jit_rate:7.0f} tok/s  "
        f"waste {100 * waste / max(1, gen + waste):4.1f}%  "
        f"occ {counters['slot_occupancy']:.2f}  windows {counters['window_size_counts']}"
        f"  (compile {compile_s:.0f}s)",
        flush=True,
    )
    engine.stop()
    del engine


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pipelinerl_tpu.models.transformer import ModelConfig, init_params
    from pipelinerl_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model_cfg = ModelConfig(
        vocab_size=151_936, hidden_size=896, intermediate_size=4864,
        num_layers=24, num_heads=14, num_kv_heads=2, head_dim=64,
        rope_theta=1e6, attention_bias=True, dtype=jnp.bfloat16,
    )
    params = init_params(jax.random.key(0), model_cfg)
    configs = [
        (64, 32, False),
        (64, 32, True),
        (128, 32, True),
        (128, 16, False),
        (256, 32, True),
    ]
    for slots, window, adaptive in configs:
        try:
            run_config(params, model_cfg, slots, window, adaptive)
        except Exception as e:  # noqa: BLE001
            print(f"S={slots} W={window} adaptive={int(adaptive)} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
