"""RL policy-gradient losses (REINFORCE / PPO / GSPO) as pure JAX functions.

Re-implements the math of the reference ``rl_step``
(/root/reference/pipelinerl/finetune/rl/__init__.py:136-450) in a jit/grad
friendly form:

- logprobs of realized tokens via gather − logsumexp (no full softmax
  materialization beyond the logits themselves),
- Schulman KL approximations to both the reference policy and the behavior
  (old) policy, with log-ratio clamping,
- three policy objectives selected *statically* (separate compiled programs):
  PPO token-level clip, REINFORCE with a detached clipped ratio, GSPO
  sequence-level ratios via fixed-size segment sums,
- per-token weights 1/batch_size (or 1/group_tokens under group
  normalization), overlong filtering, linear coefficient decay,
- a metrics dict of jnp scalars matching the reference's stats names.

All shapes are static: batches are packed [1, L] rows (types.TrainerBatch);
GSPO segment reductions use ``jax.ops.segment_sum`` with a static
``max_segments`` instead of the reference's dynamic ``index_add_``
(rl/utils.py:106-208). Under context parallelism the segment sums are
``psum``-ed over the CP mesh axis, which reproduces the reference's
deadlock-safe all-reduce semantics for free (collectives are compiled in,
so empty shards cannot desynchronize).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.transformer import ModelConfig, forward


@dataclass(frozen=True)
class RLLossConfig:
    """Static loss configuration (hashable; part of the jit cache key).

    Field semantics follow the reference RLConfig
    (finetune/rl/__init__.py:43-105)."""

    policy_loss: str = "reinforce"  # "ppo" | "reinforce" | "gspo"
    use_advantages: bool = True
    epsilon_low: float = 0.02
    epsilon_high: float = 0.02
    batch_size: int = 0  # sequences per global batch; required unless group_normalization
    kl_coef: float = 0.0
    final_kl_coef: float = 0.0
    entropy_bonus: float = 0.0
    final_entropy_bonus: float = 0.0
    relu_log_p_weights: bool = False
    clamp_log_ratio_ref_new_value: float = 5.0
    divide_advantage_by_std: bool = False
    overlong_filtering: bool = False
    group_normalization: bool = False
    temperature: float = 1.0
    value_loss_coef: float = 0.0
    # static upper bound on sequences per packed row (GSPO segment sums)
    max_segments: int = 512
    # consumed by the preprocessor, not the loss (reference RLConfig keeps it
    # in the same config block, rl/__init__.py:43-105)
    filter_zero_advantage_groups: bool = False

    @property
    def use_entropy_loss(self) -> bool:
        return self.entropy_bonus != 0.0 or self.final_entropy_bonus != 0.0


def linear_decay_coef(step, max_step: int, initial: float, final: float):
    return initial + (final - initial) * step / max(1, max_step)


def token_logprobs_from_logits(
    logits: jnp.ndarray,  # [B, L, V] fp32 (pre-shift)
    input_ids: jnp.ndarray,  # [B, L]
    temperature: float,
) -> jnp.ndarray:
    """logprob of input_ids[:, 1:] under logits[:, :-1] / temperature.
    Returns [B, L-1] fp32."""
    logits = logits[:, :-1, :] / temperature
    targets = input_ids[:, 1:]
    selected = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    log_norm = jax.nn.logsumexp(logits, axis=-1)
    return selected - log_norm


def _token_stats_from_logits(
    logits: jnp.ndarray,  # [B, L, V]
    input_ids: jnp.ndarray,  # [B, L]
    temperature: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(new_logprobs, entropy), both [B, L-1] fp32 at positions predicting
    input_ids[:, 1:]."""
    logits_t = logits[:, :-1, :].astype(jnp.float32) / temperature
    targets = input_ids[:, 1:]
    selected = jnp.take_along_axis(logits_t, targets[..., None], axis=-1)[..., 0]
    log_norm = jax.nn.logsumexp(logits_t, axis=-1)
    new_logprobs = selected - log_norm
    # Exact entropy; XLA fuses the softmax with the logits producer so no
    # extra [L, V] buffers persist (the reference chunks the vocab by hand,
    # rl/__init__.py:222-233 — unnecessary under XLA).
    logprobs_full = logits_t - log_norm[..., None]
    entropy = -jnp.sum(jnp.exp(logprobs_full) * logprobs_full, axis=-1)
    return new_logprobs, entropy


def _token_stats_chunked(
    model_params: dict,
    model_cfg: ModelConfig,
    normed_hidden: jnp.ndarray,  # [B, L, D] — final-norm'd trunk output
    input_ids: jnp.ndarray,  # [B, L]
    temperature: float,
    chunk: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ``_token_stats_from_logits`` but the [*, V] fp32
    logits only ever exist one sequence chunk at a time: a ``lax.scan`` over
    L/chunk blocks with ``jax.checkpoint`` recomputes each block's unembed
    in the backward pass. At L=16384 x V=152k the full fp32 logits are
    ~10 GB — over a v5e chip's HBM — which is what killed the round-3
    single-chip 16k train bench; chunked, the live logits are chunk/L of
    that. Only used when L % chunk == 0 and the program is not sequence-
    sharded (CP shards the L axis; a scan over L would fight GSPMD)."""
    from ..models.transformer import lm_head_logits

    B, L, D = normed_hidden.shape
    n_chunks = L // chunk
    # targets shifted left by one: position i predicts input_ids[i+1]; the
    # final position's target is a dummy (its stats are sliced off below)
    targets = jnp.concatenate([input_ids[:, 1:], input_ids[:, :1]], axis=1)
    hs = normed_hidden.reshape(B, n_chunks, chunk, D).swapaxes(0, 1)
    ts = targets.reshape(B, n_chunks, chunk).swapaxes(0, 1)

    def body(_, xs):
        h_c, t_c = xs
        logits_t = lm_head_logits(model_params, model_cfg, h_c) / temperature
        log_norm = jax.nn.logsumexp(logits_t, axis=-1)
        selected = jnp.take_along_axis(logits_t, t_c[..., None], axis=-1)[..., 0]
        logprobs_full = logits_t - log_norm[..., None]
        ent = -jnp.sum(jnp.exp(logprobs_full) * logprobs_full, axis=-1)
        return None, (selected - log_norm, ent)

    _, (lp_b, ent_b) = jax.lax.scan(jax.checkpoint(body), None, (hs, ts))
    new_logprobs = lp_b.swapaxes(0, 1).reshape(B, L)[:, :-1]
    entropy = ent_b.swapaxes(0, 1).reshape(B, L)[:, :-1]
    return new_logprobs, entropy


def rl_loss_from_logits(
    logits: jnp.ndarray,  # [1, L, V] fp32
    batch: dict,  # arrays of TrainerBatch, each [1, L]
    step: jnp.ndarray,  # scalar int — current optimizer step
    max_step: int,
    cfg: RLLossConfig,
    axis_name: str | None = None,
    values: jnp.ndarray | None = None,  # [B, L] value-head predictions
) -> tuple[jnp.ndarray, dict]:
    """Compute the scalar loss and metrics given precomputed logits.

    Split from the model forward so tests can drive it with synthetic logits
    and so alternative forwards (remat, CP) reuse the same math.
    """
    new_logprobs, entropy = _token_stats_from_logits(
        logits, batch["input_ids"], cfg.temperature
    )
    return _rl_loss_from_stats(
        new_logprobs, entropy, batch, step, max_step, cfg,
        axis_name=axis_name, values=values,
    )


def _rl_loss_from_stats(
    new_logprobs: jnp.ndarray,  # [B, L-1] fp32
    entropy: jnp.ndarray,  # [B, L-1] fp32 (differentiable)
    batch: dict,
    step: jnp.ndarray,
    max_step: int,
    cfg: RLLossConfig,
    axis_name: str | None = None,
    values: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    input_ids = batch["input_ids"]
    labels = batch["labels"]
    masks = (labels != -100)[:, 1:]
    masks_f = masks.astype(jnp.float32)

    if not cfg.use_entropy_loss:
        entropy = jax.lax.stop_gradient(entropy)

    rewards = batch["rewards"][:, 1:]
    ref_logprobs = batch["ref_logprobs"][:, 1:]
    old_logprobs = batch["old_logprobs"][:, 1:]
    group_tokens = batch["group_tokens"][:, 1:]
    num_labels = jnp.maximum(batch["num_labels"][:, 1:], 1.0)
    overflow = batch["overflow"][:, 1:]
    if values is not None:
        # actor-critic: advantages = MC return − V(s)
        # (reference rl/__init__.py:265-274); the policy term detaches them
        # below, the value loss keeps the gradient
        values_t = values[:, :-1]
        advantages = rewards - values_t
    else:
        values_t = None
        advantages = batch["advantages"][:, 1:]

    if cfg.group_normalization:
        tokens_weights = 1.0 / jnp.maximum(group_tokens, 1e-6)
    else:
        assert cfg.batch_size > 0, "batch_size required without group_normalization"
        tokens_weights = jnp.full_like(group_tokens, 1.0 / cfg.batch_size)
    if cfg.overlong_filtering:
        tokens_weights = tokens_weights * (1.0 - overflow)

    log_ratio_new_old = new_logprobs - old_logprobs
    ratio_new_old = jnp.exp(log_ratio_new_old)
    log_ratio_ref_new = ref_logprobs - new_logprobs

    log_p_weights = advantages if cfg.use_advantages else rewards
    log_p_weights = jax.lax.stop_gradient(log_p_weights)
    if cfg.relu_log_p_weights:
        log_p_weights = jnp.maximum(log_p_weights, 0.0)

    clamp_val = cfg.clamp_log_ratio_ref_new_value
    clamp_ref_new_ind = (jnp.abs(log_ratio_ref_new) > clamp_val).astype(jnp.float32)
    log_ratio_ref_new_c = jnp.clip(log_ratio_ref_new, -clamp_val, clamp_val)
    approx_kl = jnp.exp(log_ratio_ref_new_c) - log_ratio_ref_new_c - 1.0
    approx_kl_new_old = jnp.exp(log_ratio_new_old) - log_ratio_new_old - 1.0

    entropy_coef = linear_decay_coef(step, max_step, cfg.entropy_bonus, cfg.final_entropy_bonus)
    kl_coef = linear_decay_coef(step, max_step, cfg.kl_coef, cfg.final_kl_coef)

    def masked_sum(x):
        return jnp.sum(x * masks_f)

    if cfg.policy_loss == "ppo":
        surr1 = ratio_new_old * log_p_weights
        clamped_ratio = jnp.clip(ratio_new_old, 1 - cfg.epsilon_low, 1 + cfg.epsilon_high)
        clamp_new_old_ind = (clamped_ratio != ratio_new_old).astype(jnp.float32)
        surr2 = clamped_ratio * log_p_weights
        policy_loss = jnp.minimum(surr1, surr2)
        per_token = policy_loss - kl_coef * approx_kl
        if cfg.use_entropy_loss:
            per_token = per_token + entropy_coef * entropy
        total_loss = -masked_sum(per_token * tokens_weights)
    elif cfg.policy_loss == "reinforce":
        clamp_new_old_ind = (ratio_new_old > 1 + cfg.epsilon_high).astype(jnp.float32)
        ratio_clamped = jnp.clip(ratio_new_old, 0.0, 1 + cfg.epsilon_high)
        policy_loss = new_logprobs * log_p_weights * jax.lax.stop_gradient(ratio_clamped)
        per_token = policy_loss - kl_coef * approx_kl
        if cfg.use_entropy_loss:
            per_token = per_token + entropy_coef * entropy
        total_loss = -masked_sum(per_token * tokens_weights)
    elif cfg.policy_loss == "gspo":
        # rows are independent packs: offset each row's segment ids so one
        # flat segment_sum covers the whole [B, L] batch (cfg.max_segments
        # is the per-row bound)
        B = input_ids.shape[0]
        seg = batch["segment_ids"][:, 1:] + (
            jnp.arange(B, dtype=jnp.int32)[:, None] * cfg.max_segments
        )
        seg = seg.reshape(-1)
        n_seg = cfg.max_segments * B

        def seg_sum(x):  # [B, L-1] → [n_seg]
            s = jax.ops.segment_sum(
                (x * masks_f).reshape(-1), seg, num_segments=n_seg
            )
            if axis_name is not None:
                s = jax.lax.psum(s, axis_name)
            return s

        lrn_sum = seg_sum(log_ratio_new_old)
        adv_sum = seg_sum(advantages)
        tok_count = seg_sum(jnp.ones_like(masks_f))
        weight_sum = seg_sum(tokens_weights)

        group_ratio = jnp.exp(lrn_sum / jnp.maximum(tok_count, 1e-6))
        group_adv = jax.lax.stop_gradient(adv_sum / jnp.maximum(tok_count, 1e-6))
        valid = (tok_count > 0) & (weight_sum > 0)
        surr1 = group_ratio * group_adv
        clamped_group = jnp.clip(group_ratio, 1 - cfg.epsilon_low, 1 + cfg.epsilon_high)
        surr2 = clamped_group * group_adv
        clamp_seg_ind = ((clamped_group != group_ratio) & valid).astype(jnp.float32)
        min_terms = jnp.minimum(surr1, surr2) * valid.astype(jnp.float32) * weight_sum
        total_loss = -jnp.sum(min_terms)
        # token-level indicator expansion for metrics (reference :347-350)
        clamp_new_old_ind = jnp.take(clamp_seg_ind, seg).reshape(masks_f.shape)
    else:
        raise ValueError(f"Unknown policy_loss {cfg.policy_loss!r}")

    if values_t is not None:
        value_loss = masked_sum(0.5 * jnp.square(values_t - rewards) * tokens_weights)
        total_loss = total_loss + cfg.value_loss_coef * value_loss
    else:
        value_loss = None

    num_output_tokens = masks_f.sum()
    safe_denom = jnp.maximum(num_output_tokens, 1.0)

    def seq_mean_sum(x):
        """sum over tokens of x/num_labels — per-sequence mean summed over
        sequences (reference sum_sum(x / num_labels_in_seq, ...))."""
        return masked_sum(x / num_labels)

    def masked_max(x):
        return jnp.max(jnp.where(masks, x, -jnp.inf))

    def masked_min(x):
        return jnp.min(jnp.where(masks, x, jnp.inf))

    metrics = {
        "loss": total_loss,
        "reward": seq_mean_sum(rewards),
        "max_reward": masked_max(rewards),
        "min_reward": masked_min(rewards),
        "entropy": seq_mean_sum(jax.lax.stop_gradient(entropy)),
        "old_logprobs": seq_mean_sum(old_logprobs),
        "new_logprobs": seq_mean_sum(jax.lax.stop_gradient(new_logprobs)),
        "ref_logprobs": seq_mean_sum(ref_logprobs),
        "advantage": seq_mean_sum(advantages),
        "max_advantage": masked_max(advantages),
        "min_advantage": masked_min(advantages),
        "kl": seq_mean_sum(jax.lax.stop_gradient(approx_kl)),
        "kl_new_old": seq_mean_sum(jax.lax.stop_gradient(approx_kl_new_old)),
        "mean_abs_log_ratio_new_old": seq_mean_sum(
            jax.lax.stop_gradient(jnp.abs(log_ratio_new_old))
        ),
        "max_kl": masked_max(jax.lax.stop_gradient(approx_kl)),
        "ratio_new_old": seq_mean_sum(jax.lax.stop_gradient(ratio_new_old)),
        "ratio_new_old_sum": masked_sum(jax.lax.stop_gradient(ratio_new_old)),
        "ratio_new_old_squared_sum": masked_sum(
            jax.lax.stop_gradient(ratio_new_old * ratio_new_old)
        ),
        "ratio_ref_new": seq_mean_sum(jax.lax.stop_gradient(jnp.exp(log_ratio_ref_new))),
        "ratio_ref_old": seq_mean_sum(jnp.exp(ref_logprobs - old_logprobs)),
        "clamp_log_ratio_ref_new_indicator": seq_mean_sum(clamp_ref_new_ind),
        "clamp_log_ratio_new_old_indicator": seq_mean_sum(clamp_new_old_ind),
        "token_weight": seq_mean_sum(tokens_weights),
        "num_output_tokens_sum": num_output_tokens,
        "kl_coef": kl_coef * jnp.ones(()),
        "entropy_bonus_coef": entropy_coef * jnp.ones(()),
    }
    if values_t is not None:
        metrics["value_mean"] = seq_mean_sum(jax.lax.stop_gradient(values_t))
        metrics["value_loss"] = jax.lax.stop_gradient(value_loss)
        metrics["value_mse"] = seq_mean_sum(
            jax.lax.stop_gradient(jnp.square(values_t - rewards))
        )
    return total_loss, metrics


def rl_loss(
    params: dict,
    model_cfg: ModelConfig,
    loss_cfg: RLLossConfig,
    batch: dict,
    step: jnp.ndarray,
    max_step: int,
    sentinel: jnp.ndarray,  # scalar float 0/1 — zero out sentinel batches
    axis_name: str | None = None,
    remat: bool = True,
    attn_impl: str = "xla",
    image_embeds: jnp.ndarray | None = None,  # [B, M, D] frozen-tower output
    image_mask: jnp.ndarray | None = None,  # [B, L] placeholder positions
    logits_chunk: int | None = None,  # sequence-chunked unembed (see below)
) -> tuple[jnp.ndarray, dict]:
    """Forward + loss for one packed micro-batch. The loss of a sentinel batch
    is multiplied by 0 (matched collective/gradient structure across ranks,
    reference finetune_loop.py:784-786). VLM rows pass mrope position rows as
    batch["position_ids"] ([3, B, L]) plus spliced visual tokens.

    ``logits_chunk``: when set (single-device long rows), the [L, V] fp32
    logits are never materialized — the unembed + logsumexp/entropy run in a
    rematerialized scan over L/chunk blocks (``_token_stats_chunked``).
    Leave None under CP (the L axis is sharded) and for short rows."""
    model_params = {
        k: v for k, v in params.items() if k not in ("value_head", "vision_tower")
    }
    L = batch["input_ids"].shape[1]
    chunked = (
        logits_chunk is not None and L % logits_chunk == 0 and L > logits_chunk
    )
    outs = forward(
        model_params,
        model_cfg,
        batch["input_ids"],
        batch["position_ids"],
        batch["segment_ids"],
        remat=remat,
        attn_impl=attn_impl,
        return_hidden="value_head" in params,
        image_embeds=image_embeds,
        image_mask=image_mask,
        skip_unembed=chunked,
    )
    values = None
    if "value_head" in params:
        from ..models.transformer import value_predictions

        logits, hidden = outs
        values = value_predictions(params["value_head"], hidden)
    else:
        logits = outs
    if chunked:
        # ``logits`` holds the final-norm'd hidden under skip_unembed
        new_logprobs, entropy = _token_stats_chunked(
            model_params, model_cfg, logits, batch["input_ids"],
            loss_cfg.temperature, logits_chunk,
        )
        loss, metrics = _rl_loss_from_stats(
            new_logprobs, entropy, batch, step, max_step, loss_cfg,
            axis_name=axis_name, values=values,
        )
    else:
        loss, metrics = rl_loss_from_logits(
            logits, batch, step, max_step, loss_cfg,
            axis_name=axis_name, values=values,
        )
    loss = loss * (1.0 - sentinel)
    metrics["loss"] = loss
    return loss, metrics
