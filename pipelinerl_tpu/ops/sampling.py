"""Token sampling with per-token "processed" logprobs.

Contract (mirrors what the reference relies on from vLLM's
``logprobs-mode: processed_logprobs`` + temperature processor,
/root/reference/conf/base.yaml:65 and pipelinerl/llm.py:387-404): the sampler
returns, for every sampled token, ``log softmax(logits / temperature)`` —
exactly the quantity the trainer recomputes (train/rl_loss.py applies the
same temperature), so importance ratios start at 1 when the policy hasn't
moved. top-k/top-p truncate the *sampling* distribution but do not change
the reported logprob (temperature-only processing), keeping the
trainer/sampler contract independent of eval-time truncation settings.

Two jitted paths:
- fast path: no truncation (the RL rollout setting: temperature=1, top_p=1),
- masked path: vectorized per-slot top-k and/or top-p via one descending sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30
_MIN_TEMP = 1e-4


def _scaled_logprobs(logits: jnp.ndarray, temperature: jnp.ndarray) -> jnp.ndarray:
    """log softmax(logits / max(T, eps)) — greedy (T=0) reports the
    unscaled distribution's logprob."""
    temp = jnp.maximum(temperature, _MIN_TEMP)[:, None]
    report_temp = jnp.where(temperature[:, None] < _MIN_TEMP, 1.0, temp)
    scaled = logits / report_temp
    return scaled - jax.nn.logsumexp(scaled, axis=-1, keepdims=True)


def sample_fast(
    logits: jnp.ndarray,  # [S, V] fp32
    rng: jax.Array,
    temperature: jnp.ndarray,  # [S]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Temperature-only sampling. Returns (tokens [S], logprobs [S]).

    Decode-loop hot path: every extra elementwise pass over the [S, V]
    logits costs ~40 MB of HBM traffic per step, so the Gumbel argmax and
    both logprob reductions reuse ONE scaled tensor instead of calling
    jax.random.categorical + a separate log-softmax (measured 0.32 ms/step
    of the 4.0 ms decode step at S=64, V=152k on v5e — scripts/probe_window)."""
    greedy = temperature < _MIN_TEMP
    temp = jnp.maximum(temperature, _MIN_TEMP)[:, None]
    scaled = logits / temp
    gumbel = jax.random.gumbel(rng, scaled.shape, dtype=scaled.dtype)
    sampled = jnp.argmax(scaled + gumbel, axis=-1)
    # greedy = argmax(logits) = argmax(scaled): positive temperature scaling
    # preserves the ordering, so the sampled-path tensor is reused
    tokens = jnp.where(greedy, jnp.argmax(scaled, axis=-1), sampled)
    # reported logprob: log softmax(logits / report_temp); greedy slots
    # report the unscaled (T=1) distribution (_scaled_logprobs contract)
    sel_scaled = jnp.take_along_axis(scaled, tokens[:, None], axis=-1)[:, 0]
    lse_scaled = jax.nn.logsumexp(scaled, axis=-1)
    sel_raw = jnp.take_along_axis(logits, tokens[:, None], axis=-1)[:, 0]
    lse_raw = jax.nn.logsumexp(logits, axis=-1)
    logprobs = jnp.where(greedy, sel_raw - lse_raw, sel_scaled - lse_scaled)
    return tokens, logprobs


def sample_masked(
    logits: jnp.ndarray,  # [S, V] fp32
    rng: jax.Array,
    temperature: jnp.ndarray,  # [S]
    top_p: jnp.ndarray,  # [S] in (0, 1]; 1 disables
    top_k: jnp.ndarray,  # [S] int; 0 disables
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slot top-k/top-p truncated sampling (exact, one sort per call)."""
    S, V = logits.shape
    greedy = temperature < _MIN_TEMP
    temp = jnp.maximum(temperature, _MIN_TEMP)[:, None]
    scaled = logits / temp

    order = jnp.argsort(-scaled, axis=-1)  # descending
    sorted_scaled = jnp.take_along_axis(scaled, order, axis=-1)
    sorted_probs = jax.nn.softmax(sorted_scaled, axis=-1)
    cumprobs = jnp.cumsum(sorted_probs, axis=-1)
    ranks = jnp.arange(V)[None, :]

    keep_k = jnp.where(top_k[:, None] > 0, ranks < top_k[:, None], True)
    # keep the smallest prefix whose mass reaches top_p (first token always kept)
    keep_p = (cumprobs - sorted_probs) < top_p[:, None]
    keep_sorted = keep_k & keep_p
    masked_sorted = jnp.where(keep_sorted, sorted_scaled, _NEG_INF)
    sampled_rank = jax.random.categorical(rng, masked_sorted, axis=-1)
    sampled = jnp.take_along_axis(order, sampled_rank[:, None], axis=-1)[:, 0]
    tokens = jnp.where(greedy, jnp.argmax(logits, axis=-1), sampled)
    logprobs = jnp.take_along_axis(
        _scaled_logprobs(logits, temperature), tokens[:, None], axis=-1
    )[:, 0]
    return tokens, logprobs
