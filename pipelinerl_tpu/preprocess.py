"""Preprocessor: groups → advantages → (optional ref logprobs) → packing →
partitioned training_data stream with backpressure.

Re-design of the reference preprocessing loop
(/root/reference/pipelinerl/preprocess.py:370-704). Differences that follow
from the TPU design:

- packs are padded to the *static* ``finetune.seq_length`` (one compiled
  trainer program) instead of "multiple of seq_parallel";
- ref-logprob annotation scores token ids directly against a reference
  engine (``llm.ascore``) instead of an HTTP /v1/completions echo round-trip;
- the ring buffer, zero-advantage filtering, per-lead sample accounting with
  sentinel equalization, and samples_processed backpressure keep the
  reference semantics.
"""

from __future__ import annotations

import logging
import time
from collections import deque
from typing import Any, Callable, Sequence

from .config import Config
from .state import TrainerState
from .streams import (
    RangeStreamWriter,
    SingleStreamSpec,
    StreamRangeSpec,
    StreamReader,
    get_streams_backend,
)
from .train.advantages import group_advantages_all_zero, populate_rl_data
from .train.packing import greedy_pack, make_sentinel_batch, pack_samples

logger = logging.getLogger(__name__)


class Preprocessor:
    def __init__(
        self,
        cfg: Config,
        exp_path: str,
        trainer_state: TrainerState,
        eos_token_id: int,
        num_trainers: int = 1,
        ref_score_fn: Callable[[Sequence[int]], list[float]] | None = None,
        input_topic: str = "actor",
        output_topic: str = "training_data",
        image_token_id: int | None = None,
        spatial_merge_size: int = 2,
    ):
        self.cfg = cfg
        self.exp_path = exp_path
        self.trainer_state = trainer_state
        self.eos_token_id = eos_token_id
        self.num_trainers = num_trainers
        self.ref_score_fn = ref_score_fn
        self.input_spec = SingleStreamSpec(exp_path=exp_path, topic=input_topic)
        self.output_spec = StreamRangeSpec(
            exp_path=exp_path, topic=output_topic, partitions=tuple(range(num_trainers))
        )
        self.seq_length = int(cfg.finetune.seq_length)
        # VLM: needed to compute mrope rows at packing time (pack_visual_sample)
        self.image_token_id = image_token_id
        self.spatial_merge_size = spatial_merge_size
        ring_size = int(cfg.preprocess.get("ring_buffer_size", 128))
        self.ring: deque[dict] = deque(maxlen=ring_size if cfg.get("pop_old_data", True) else None)
        self.published_samples = 0
        self.dropped_old_samples = 0
        self.filtered_zero_adv_groups = 0
        self._stop = False

    def stop(self) -> None:
        self._stop = True

    # ------------------------------------------------------------------
    def process_group(self, group_msg: dict) -> list[dict]:
        """Advantages (+ ref logprobs) for one group; returns sample dicts."""
        samples = group_msg["samples"]
        attempts = int(self.cfg.attempts)
        rollouts = {s["rollout_index"] for s in samples}
        if len(rollouts) != attempts:
            raise ValueError(
                f"Group {group_msg.get('group_id')} has {len(rollouts)} rollouts, "
                f"expected {attempts}"
            )
        if self.ref_score_fn is not None:
            for s in samples:
                scored = self.ref_score_fn(s["input_ids"])
                # scored[i] is logprob of token i+1 → align to labels
                ref = [0.0] + list(scored)
                s["ref_logprobs"] = [
                    ref[i] if s["labels"][i] != -100 else 0.0
                    for i in range(len(s["input_ids"]))
                ]
        populate_rl_data(
            samples,
            eos_token_id=self.eos_token_id,
            divide_advantage_by_std=bool(
                self.cfg.finetune.rl.get("divide_advantage_by_std", False)
            ),
        )
        if bool(self.cfg.finetune.rl.get("filter_zero_advantage_groups", False)):
            if group_advantages_all_zero(samples):
                self.filtered_zero_adv_groups += 1
                return []
        max_len = self.seq_length
        kept = []
        for s in samples:
            if len(s["input_ids"]) > max_len:
                logger.warning(
                    "Dropping sample of %d tokens > seq_length %d",
                    len(s["input_ids"]),
                    max_len,
                )
                continue
            kept.append(s)
        return kept

    def _backpressure_limit(self) -> int:
        max_ready = int(self.cfg.preprocess.get("max_ready_samples_per_lead", 64))
        return self.trainer_state.samples_processed + max_ready * self.num_trainers

    def run(self, max_groups: int | None = None) -> None:
        """Tail the actor stream forever (or for max_groups), packing into the
        training_data partitions round-robin with sentinel equalization."""
        reader = StreamReader(self.input_spec, poll_interval=0.02)
        writer = RangeStreamWriter(self.output_spec)
        groups_done = 0
        pending: list[dict] = []
        samples_per_step = int(self.cfg.finetune.samples_per_step)
        try:
            while not self._stop:
                got_any = False
                for msg in reader.read_available(max_messages=64):
                    got_any = True
                    kept = self.process_group(msg)
                    for s in kept:
                        if self.ring.maxlen is not None and len(self.ring) == self.ring.maxlen:
                            self.dropped_old_samples += 1
                        self.ring.append(s)
                    groups_done += 1
                    if max_groups is not None and groups_done >= max_groups:
                        self._stop = True
                        break
                # backpressure: don't run ahead of the trainer
                emitted = False
                while self.ring and self.published_samples < self._backpressure_limit():
                    self._emit_packs(writer)
                    emitted = True
                if self.trainer_state.training_done:
                    break
                if not got_any and not emitted:
                    # nothing consumed and nothing emitted (empty or
                    # backpressured) — yield instead of busy-spinning
                    time.sleep(0.02)
            # flush
            while self.ring:
                self._emit_packs(writer, force=True)
        finally:
            writer.close()
            reader.stop()

    def _emit_packs(self, writer: RangeStreamWriter, force: bool = False) -> None:
        """Pack from the ring buffer head into one fixed-shape batch per
        trainer partition (lead), topping up with sentinels so every lead
        sees the same number of micro-batches (reference preprocess.py:594-663)."""
        as_arrays = get_streams_backend() == "binary"
        for partition in range(self.num_trainers):
            batch = self._next_batch()
            writer.write(batch.to_msg(arrays=as_arrays), partition=partition)
            self.published_samples += batch.num_sequences

    def _next_batch(self):
        chosen: list[dict] = []
        used = 0
        while self.ring:
            head = self.ring[0]
            if head.get("visual_features"):
                if chosen:
                    break  # emit the text pack first; image row comes next
                from .train.packing import pack_visual_sample

                if self.image_token_id is None:
                    raise ValueError(
                        "multimodal sample but preprocessor has no image_token_id"
                    )
                return pack_visual_sample(
                    self.ring.popleft(),
                    self.seq_length,
                    self.eos_token_id,
                    self.image_token_id,
                    self.spatial_merge_size,
                )
            n = len(head["input_ids"])
            if used + n > self.seq_length:
                break
            s = self.ring.popleft()
            chosen.append(s)
            used += n
        if not chosen:
            return make_sentinel_batch(self.seq_length, self.eos_token_id)
        return pack_samples(chosen, self.seq_length, self.eos_token_id)
