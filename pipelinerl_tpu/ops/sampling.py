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

Padded-vocab guard (``valid_vocab``): checkpoints like Qwen2.5 carry more
logit rows (151,936) than the tokenizer has entries (~151,643); the
untrained padding rows can carry arbitrary logits and a sampled padding id
detokenizes to garbage that would flow into training. The reference patches
such ids post-hoc with "the" (preprocess.py:107 replace_oov_tokens_with_the);
here padding rows are simply excluded from the CANDIDATE set at sample time
while the reported logprob stays the full-V softmax — the exact quantity the
trainer recomputes — so sampler/trainer logprob parity is untouched and no
padding id can ever be emitted."""

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
    valid_vocab: int | None = None,  # static: exclude token ids >= this
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
    # candidate tensor: padding rows excluded from argmax/Gumbel-argmax only;
    # reported logprobs below stay full-V (trainer parity)
    cand = scaled
    if valid_vocab is not None and valid_vocab < logits.shape[-1]:
        cand = jnp.where(
            jnp.arange(logits.shape[-1])[None, :] < valid_vocab, scaled, _NEG_INF
        )
    gumbel = jax.random.gumbel(rng, cand.shape, dtype=cand.dtype)
    sampled = jnp.argmax(cand + gumbel, axis=-1)
    # greedy = argmax(logits) = argmax(scaled): positive temperature scaling
    # preserves the ordering, so the sampled-path tensor is reused
    tokens = jnp.where(greedy, jnp.argmax(cand, axis=-1), sampled)
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
    valid_vocab: int | None = None,  # static: exclude token ids >= this
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slot top-k/top-p truncated sampling (exact, one sort per call)."""
    S, V = logits.shape
    greedy = temperature < _MIN_TEMP
    temp = jnp.maximum(temperature, _MIN_TEMP)[:, None]
    scaled = logits / temp
    if valid_vocab is not None and valid_vocab < V:
        # padding rows sort to the tail and can never survive top-k/top-p;
        # reported logprobs stay full-V (see module docstring)
        scaled = jnp.where(jnp.arange(V)[None, :] < valid_vocab, scaled, _NEG_INF)

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
    # greedy over the masked scaled tensor: same ordering as logits within
    # the valid rows, padding rows excluded
    tokens = jnp.where(greedy, jnp.argmax(scaled, axis=-1), sampled)
    logprobs = jnp.take_along_axis(
        _scaled_logprobs(logits, temperature), tokens[:, None], axis=-1
    )[:, 0]
    return tokens, logprobs
