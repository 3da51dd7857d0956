"""Actor: schedules grouped rollouts against inference engines with lag
control, stamps samples with weight versions, publishes stats.

Re-design of the reference actor (/root/reference/pipelinerl/actor.py) as a
single-process asyncio scheduler (the reference fans out to subprocess
rollout workers because HTTP clients are CPU-bound; the in-process client is
not, so coroutines suffice — HTTP mode can still spread actors over hosts).

Semantics preserved:
- each problem spawns a *group* of ``attempts`` rollouts (GRPO group,
  actor.py:176-230); the group is written to the ``actor`` stream only when
  complete, shuffled;
- least-busy engine selection with a per-engine in-flight cap
  (actor.py:268-273);
- lag control: with ``finetune.max_lag`` set, at most
  ``ceil(max_lag/attempts) + ceil(update_size/attempts)`` groups may be
  submitted per weight version, budget refilled on each version bump
  (actor.py:510-577);
- samples stamped with the trainer weight version observed at scheduling
  time; rollout-level retries with exponential backoff (actor.py:146-208).
"""

from __future__ import annotations

import asyncio
import logging
import math
import random
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from .config import Config
from .inference.client import BaseLLM
from .state import TrainerState
from .streams import SingleStreamSpec, StreamWriter
from .train.advantages import training_text_to_sample
from .types import RolloutResult
from .utils import SlidingWindowAggregator, calculate_stats

logger = logging.getLogger(__name__)


def _has_degenerate_text(result: RolloutResult) -> bool:
    """A rollout whose transcript contains an aborted or empty completion
    (e.g. an over-length prompt the engine resolved with zero tokens) must
    not become a training sample — the reference retries abort-shaped
    completions instead (/root/reference/pipelinerl/async_llm.py:61-168)."""
    return any(
        t.finish_reason == "abort" or t.output_tokens == 0
        for t in result.training_texts
    )


@dataclass
class ActorStats:
    groups_completed: int = 0
    rollouts_completed: int = 0
    samples_written: int = 0
    output_tokens: int = 0
    # degenerate-completion accounting (aborted/empty rollouts retried, and
    # groups dropped because a member stayed degenerate after retries)
    aborted_rollout_retries: int = 0
    dropped_degenerate_groups: int = 0
    metrics: dict[str, list[float]] = field(default_factory=dict)
    # per-dataset and per-domain windowed aggregates (reference publishes
    # per-dataset groups, actor.py:696-780)
    grouped_metrics: dict[str, dict[str, list[float]]] = field(default_factory=dict)
    # per-problem success history → always/sometimes/never aggregation
    # (reference utils.py:382-401) — cumulative, not windowed
    problem_success: dict[str, list[float]] = field(default_factory=dict)
    # model-version lag of produced samples (reference actor lag metrics)
    version_lags: list[float] = field(default_factory=list)
    # full-run success history (NOT drained by snapshot): learning-oracle
    # tests assert on the tail of this instead of the last publish window,
    # whose handful of groups is too noisy to gate on
    success_history: list[float] = field(default_factory=list)

    def record_rollout(self, result: RolloutResult, problem_key: str | None = None) -> None:
        self.rollouts_completed += 1
        group_keys = []
        if getattr(result, "dataset_name", None):
            group_keys.append(f"dataset/{result.dataset_name}")
        if getattr(result, "domain", None):
            group_keys.append(f"domain/{result.domain}")
        for name, value in result.metrics.model_dump().items():
            if isinstance(value, bool):
                value = float(value)
            if isinstance(value, (int, float)):
                self.metrics.setdefault(name, []).append(float(value))
                for gk in group_keys:
                    self.grouped_metrics.setdefault(gk, {}).setdefault(
                        name, []
                    ).append(float(value))
        if problem_key is not None:
            self.problem_success.setdefault(problem_key, []).append(
                float(result.metrics.success)
            )
        self.success_history.append(float(result.metrics.success))

    def snapshot(self) -> dict[str, Any]:
        """Windowed stats: metric buffers drain on publish so each snapshot
        covers only the rollouts since the previous one."""
        out: dict[str, Any] = {
            "groups_completed": self.groups_completed,
            "rollouts_completed": self.rollouts_completed,
            "samples_written": self.samples_written,
            "output_tokens": self.output_tokens,
            "aborted_rollout_retries": self.aborted_rollout_retries,
            "dropped_degenerate_groups": self.dropped_degenerate_groups,
        }
        for name, values in self.metrics.items():
            for stat, val in calculate_stats(values).items():
                out[f"{name}_{stat}"] = val
        self.metrics = {}
        for gk, metrics in self.grouped_metrics.items():
            for name, values in metrics.items():
                if values:
                    out[f"{gk}/{name}_mean"] = sum(values) / len(values)
                    out[f"{gk}/{name}_count"] = len(values)
        self.grouped_metrics = {}
        from .utils import always_or_never_success_stats

        out.update(always_or_never_success_stats(self.problem_success))
        if self.success_history:
            tail = self.success_history[-max(1, len(self.success_history) // 3) :]
            out["success_tail_mean"] = sum(tail) / len(tail)
        if self.version_lags:
            for stat, val in calculate_stats(self.version_lags).items():
                out[f"model_version_lag_{stat}"] = val
            self.version_lags = []
        return out


class ActorLoop:
    def __init__(
        self,
        cfg: Config,
        llms: Sequence[BaseLLM],
        problems: Sequence[dict],
        trainer_state: TrainerState,
        exp_path: str,
        rollout_policy: Callable,
        is_training: bool = True,
    ):
        self.cfg = cfg
        self.llms = list(llms)
        self.problems = list(problems)
        self.trainer_state = trainer_state
        self.exp_path = exp_path
        self.rollout_policy = rollout_policy
        self.is_training = is_training
        self.attempts = int(cfg.attempts) if is_training else int(cfg.get("test_attempts", 1))
        self.stats = ActorStats()
        self.tokens_window = SlidingWindowAggregator(
            int(cfg.actor.get("throughput_window_size", 50))
        )
        self._active_per_llm = [0] * len(self.llms)
        self._rng = random.Random(int(cfg.get("seed", 0)))
        # eval interleaving pauses train scheduling (reference actor.py:868-909)
        self.is_scheduling_paused = False

        topic = "actor" if is_training else "actor_test"
        self.data_spec = SingleStreamSpec(exp_path=exp_path, topic=topic)
        self.stats_spec = SingleStreamSpec(
            exp_path=exp_path, topic="stats" if is_training else "stats_test"
        )

    # -- lag budget (reference actor.py:510-534) ---------------------------
    def _lag_budget(self, trained_version: int) -> float:
        """ABSOLUTE submit budget (in groups) at a given trainer version
        (≡ cumulative trained samples): submitted×attempts may run at most
        max_lag + one update window ahead of training. Derived from the
        version itself — not from counting observed version bumps — because
        cross-process weight pushes arrive in bursts and an incremental
        counter silently loses budget (round-2 stall in the 2-process
        pipeline test)."""
        max_lag = self.cfg.finetune.get("max_lag")
        if not self.is_training or max_lag is None:
            return math.inf
        samples_per_step = int(self.cfg.finetune.samples_per_step)
        # weight_update_interval is in samples (weight version ≡ cumulative
        # samples, reference finetune_loop.py:948-949); round up to whole
        # optimizer steps like the reference (actor.py:513-516)
        update_interval = int(self.cfg.finetune.get("weight_update_interval", 1))
        total_update_size = (
            math.ceil(update_interval / samples_per_step) * samples_per_step
        )
        return (
            math.ceil(int(max_lag) / self.attempts)
            + math.ceil(total_update_size / self.attempts)
            + int(trained_version) // self.attempts
        )

    def _pick_llm(self) -> int | None:
        cap = int(self.cfg.actor.get("llm_max_rollouts", 64))
        best, best_active = None, cap
        for i, active in enumerate(self._active_per_llm):
            if active < best_active:
                best, best_active = i, active
        return best

    async def _run_one_rollout(self, problem: dict, group_id: str, rollout_idx: int) -> RolloutResult:
        max_retries = int(self.cfg.actor.get("max_rollout_retries", 2))
        attempt = 0
        while True:
            llm_idx = self._pick_llm()
            while llm_idx is None:
                await asyncio.sleep(0.01)
                llm_idx = self._pick_llm()
            self._active_per_llm[llm_idx] += 1
            try:
                result = await self.rollout_policy(
                    self.cfg, self.llms[llm_idx], problem, None
                )
                if _has_degenerate_text(result):
                    # aborted/empty completion: retry once within the same
                    # budget (transient aborts recover; a deterministically
                    # over-length prompt stays degenerate and its group is
                    # dropped by the run loop)
                    attempt += 1
                    if max_retries < 0 or attempt <= max_retries:
                        self.stats.aborted_rollout_retries += 1
                        logger.warning(
                            "Rollout produced an aborted/empty completion "
                            "(attempt %d/%d); retrying", attempt, max_retries,
                        )
                        continue
                    logger.warning(
                        "Rollout still degenerate after %d attempts; its "
                        "group will be dropped", attempt,
                    )
                break
            except Exception:
                attempt += 1
                if max_retries >= 0 and attempt > max_retries:
                    raise
                logger.exception(
                    "Rollout failed (attempt %d/%d); retrying", attempt, max_retries
                )
                await asyncio.sleep(min(2.0 ** attempt * 0.1, 5.0))
            finally:
                self._active_per_llm[llm_idx] -= 1
        result.group_id = group_id
        if result.model_version is None:
            # the version the engine actually GENERATED under (stamped by
            # make_training_text from the engine's model_version_start) —
            # overwriting with the trainer's current version here made every
            # lag read ~0 (round-4 find); trainer_state is only a fallback
            # for domains that build TrainingTexts by hand
            versions = [
                t.metadata.get("model_version")
                for t in result.training_texts
                if t.metadata.get("model_version") is not None
            ]
            result.model_version = (
                min(versions)
                if versions
                else (self.trainer_state.propagated_weight_version or 0)
            )
        return result

    async def _run_group(self, problem: dict) -> list[RolloutResult]:
        group_id = str(uuid.uuid4())
        tasks = [
            asyncio.create_task(self._run_one_rollout(problem, group_id, i))
            for i in range(self.attempts)
        ]
        try:
            return await asyncio.gather(*tasks)
        except Exception:
            for t in tasks:
                t.cancel()
            raise

    def _apply_difficulty_aware_penalty(self, results: list[RolloutResult]) -> None:
        """Rescale the overlong length penalty by group solve rate: successful
        rollouts on hard problems keep more of their length budget, failed
        overlong rollouts keep the full penalty; sequences that hit
        max_tokens unfinished always get the full penalty
        (reference actor.py:602-644)."""
        dap = self.cfg.actor.get("difficulty_aware_penalty")
        buffer_tokens = int(self.cfg.get("rewards", Config({})).get("buffer_tokens", 0) or 0)
        max_tokens = self.cfg.llm.parameters.get("max_tokens")
        if (
            not self.is_training
            or not dap
            or not dap.get("enabled", False)
            or buffer_tokens <= 0
            or max_tokens is None
        ):
            return
        from .domains.math.rollouts import length_penalty

        gamma = float(dap.get("gamma", 1.0))
        failure_scale = float(dap.get("failure_scale", 1.0))
        solve_rate = sum(float(r.metrics.success) for r in results) / len(results)
        success_scale = solve_rate**gamma
        for r in results:
            rollout_scale = success_scale if r.metrics.success else failure_scale
            delta_total = 0.0
            for text in r.training_texts:
                if text.output_tokens >= max_tokens and not text.finished:
                    scale = 1.0  # hard-cap guard
                else:
                    scale = rollout_scale
                original = length_penalty(max_tokens, text.output_tokens, buffer_tokens)
                delta = original * scale - original
                text.reward += delta
                delta_total += delta
            r.metrics.reward += delta_total

    def _write_group(self, writer: StreamWriter, results: list[RolloutResult]) -> None:
        samples = []
        entries = []
        for rollout_idx, result in enumerate(results):
            for step_idx, text in enumerate(result.training_texts):
                entries.append((result, rollout_idx, step_idx, text))
        self._rng.shuffle(entries)
        for result, rollout_idx, step_idx, text in entries:
            text.group_id = result.group_id
            sample = training_text_to_sample(
                text,
                model_version=result.model_version or 0,
                rollout_index=rollout_idx,
                step_index=step_idx,
            )
            sample["dataset_name"] = result.dataset_name
            sample["domain"] = result.domain
            samples.append(sample)
            self.stats.output_tokens += text.output_tokens
        writer.write(
            {
                "group_id": results[0].group_id,
                "model_version": min(r.model_version or 0 for r in results),
                "samples": samples,
            }
        )
        self.stats.samples_written += len(samples)
        self.stats.groups_completed += 1
        self.tokens_window.update(time.monotonic(), sum(t[3].output_tokens for t in entries))

    async def run(self, total_groups: int | None = None) -> ActorStats:
        """Schedule groups until ``total_groups`` complete (or problems are
        exhausted), respecting the lag budget."""
        submitted = 0
        completed = 0
        domain_mix = self.cfg.get("domain_mix")
        sampler = None
        if domain_mix and self.is_training:
            from .domain_sampling import DomainWeightedSampler

            sampler = DomainWeightedSampler(
                self.problems, dict(domain_mix.items()), rng=self._rng,
                adaptive=bool(self.cfg.get("adaptive_domain_sampling", True)),
            )
            problem_iter = iter(self._sampled_stream(sampler, total_groups))
        else:
            problem_iter = iter(self._problem_stream(total_groups))
        in_flight: set[asyncio.Task] = set()
        max_parallel = int(self.cfg.actor.get("max_parallel_groups", 16))
        publish_every = int(self.cfg.actor.get("publish_stats_every_n_groups", 8))

        with StreamWriter(self.data_spec) as writer, StreamWriter(self.stats_spec) as stats_writer:
            exhausted = False
            while not exhausted or in_flight:
                version = self.trainer_state.propagated_weight_version or 0
                can_submit = self._lag_budget(version)
                while (
                    not exhausted
                    and not self.is_scheduling_paused
                    and len(in_flight) < max_parallel
                    and submitted < can_submit
                ):
                    try:
                        problem = next(problem_iter)
                    except StopIteration:
                        exhausted = True
                        break
                    task = asyncio.create_task(self._run_group(problem))
                    task.problem = problem  # for per-problem success stats
                    in_flight.add(task)
                    submitted += 1
                if not in_flight:
                    if self.trainer_state.training_done:
                        break
                    await asyncio.sleep(0.01)
                    continue
                done, in_flight = await asyncio.wait(
                    in_flight, return_when=asyncio.FIRST_COMPLETED, timeout=0.5
                )
                for task in done:
                    results = task.result()
                    if any(_has_degenerate_text(r) for r in results):
                        # a member stayed aborted/empty after retries: the
                        # whole group is unusable (LOO advantages need all
                        # attempts) — drop it, never write a training sample
                        self.stats.dropped_degenerate_groups += 1
                        completed += 1
                        continue
                    if sampler is not None:
                        for r in results:
                            if r.domain:
                                sampler.record_completion(r.domain)
                    self._apply_difficulty_aware_penalty(results)
                    problem_key = None
                    problem = getattr(task, "problem", None)
                    if problem is not None:
                        import json as _json

                        problem_key = _json.dumps(
                            problem, sort_keys=True, default=str
                        )[:256]
                    current_version = self.trainer_state.propagated_weight_version or 0
                    for r in results:
                        self.stats.record_rollout(r, problem_key)
                        self.stats.version_lags.append(
                            float(current_version - (r.model_version or 0))
                        )
                    self._write_group(writer, results)
                    completed += 1
                    if completed % publish_every == 0:
                        snap = self.stats.snapshot()
                        snap["output_tokens_per_second"] = self.tokens_window.rate_per_sec()
                        stats_writer.write(snap)
                if self.trainer_state.training_done:
                    for task in in_flight:
                        task.cancel()
                    break
            # final snapshot: eval interleaves are short (completed <
            # publish_every) and would otherwise never reach stats_test.
            # Train loops keep their windowed metrics for the caller's
            # closing snapshot instead.
            if not self.is_training:
                snap = self.stats.snapshot()
                snap["output_tokens_per_second"] = self.tokens_window.rate_per_sec()
                stats_writer.write(snap)
        return self.stats

    def _sampled_stream(self, sampler, total_groups: int | None):
        count = 0
        while total_groups is None or count < total_groups:
            yield sampler.sample()
            count += 1

    def _problem_stream(self, total_groups: int | None):
        """Cycle problems until total_groups (or training_done breaks the run
        loop); reshuffled every epoch like the reference actor's dataset
        cycling (reference actor.py RolloutMaker loop). A small problem set
        must not starve a long run after one pass."""
        import random

        rng = random.Random(self.cfg.get("seed", 0))
        epoch_problems = list(self.problems)
        count = 0
        while True:
            for problem in epoch_problems:
                if total_groups is not None and count >= total_groups:
                    return
                yield problem
                count += 1
            if not epoch_problems:
                return
            epoch_problems = list(self.problems)
            rng.shuffle(epoch_problems)
