"""Core data model shared by all pipeline stages.

TPU-native re-design of the reference's data model
(/root/reference/pipelinerl/rollouts.py:6-97 and finetune/types.py:46-181):
``TrainingText`` / ``RolloutResult`` keep the same field contract so domains
written against the reference API port over unchanged, while the trainer batch
(``TrainerBatch``) is numpy/JAX-based with *static* shapes — packed [1, L]
rows padded to the configured sequence length so every micro-batch hits the
same compiled XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np
from pydantic import BaseModel, ConfigDict, Field

# Matches the reference's label-mask convention (finetune/data.py:29).
MASKED_TOKEN_ID = -100


class BaseMetrics(BaseModel):
    """Per-rollout scalar metrics every domain must report."""

    reward: float
    success: bool | float
    no_error: bool | float
    no_answer: bool | float

    model_config = ConfigDict(extra="allow")


class TrainingText(BaseModel):
    """One trainable (prompt, completion) span with sampler logprobs.

    Same contract as the reference TrainingText (rollouts.py:13-57):
    ``input_ids`` is the *exact* prompt+completion token sequence the sampler
    consumed/produced, ``labels`` masks prompt positions with -100, and
    ``logprobs`` are the sampler's per-completion-token logprobs.
    """

    text: str = ""
    n_predicted: int = 0
    reward: float = 0.0
    logprobs: List[float] = Field(default_factory=list)
    ref_logprobs: List[float] = Field(default_factory=list)
    input_ids: List[int] = Field(default_factory=list)
    labels: List[int] = Field(default_factory=list)
    group_id: str | None = None
    finished: bool = False
    finish_reason: str | None = None
    prompt_tokens: int = 0
    output_tokens: int = 0
    visual_features: Optional[Dict[str, Any]] = None
    metadata: dict = Field(default_factory=dict)

    model_config = ConfigDict(arbitrary_types_allowed=True)

    @property
    def prompt_text(self) -> str:
        return self.text[: -self.n_predicted] if self.n_predicted else self.text

    @property
    def output_text(self) -> str:
        return self.text[-self.n_predicted :] if self.n_predicted else ""


class RolloutResult(BaseModel):
    """Everything a domain returns for one rollout (reference rollouts.py:60-68)."""

    training_texts: list[TrainingText]
    metrics: BaseMetrics
    latency: float = 0.0
    model_version: int | None = None
    dataset_name: str | None = None
    group_id: str | None = None
    domain: str | None = None


def apply_rollout_reward(
    training_texts: Sequence[TrainingText], reward: float
) -> list[TrainingText]:
    texts = list(training_texts)
    for t in texts:
        t.reward = reward
    return texts


def rollout_has_overflow(training_texts: Sequence[TrainingText]) -> bool:
    return any(not t.finished for t in training_texts)


# ---------------------------------------------------------------------------
# Trainer-side batch
# ---------------------------------------------------------------------------

# Per-token float columns carried alongside input_ids through packing
# (reference RL_DATA_COLUMNS, finetune/rl/__init__.py:32-40).
RL_DATA_COLUMNS = (
    "rewards",
    "advantages",
    "ref_logprobs",
    "old_logprobs",
    "group_tokens",
    "num_labels",
    "overflow",
)

_INT_FIELDS = ("input_ids", "labels", "position_ids", "segment_ids")
_FLOAT_FIELDS = RL_DATA_COLUMNS


class TrainerBatch:
    """A packed, fixed-shape training micro-batch.

    All array fields have shape [1, L] with L = the static packed length
    (``finetune.seq_length``). Unlike the reference PipelineBatchEncoding
    (finetune/types.py:46-181) there is no "unpacked" mode: single sequences
    are just packs of one — one compiled program serves every batch.

    ``segment_ids`` identifies the original sequence of each token (padding
    tokens get segment -1 is NOT used; padding is a sentinel segment with all
    labels masked so it contributes nothing to the loss).
    """

    __slots__ = (
        "input_ids",
        "labels",
        "position_ids",
        "segment_ids",
        "rewards",
        "advantages",
        "ref_logprobs",
        "old_logprobs",
        "group_tokens",
        "num_labels",
        "overflow",
        "model_version",
        "sentinel",
        "padding",
        "seq_boundaries",
        "num_sequences",
        "visual",
    )

    def __init__(
        self,
        *,
        input_ids: np.ndarray,
        labels: np.ndarray,
        position_ids: np.ndarray,
        segment_ids: np.ndarray,
        rewards: np.ndarray,
        advantages: np.ndarray,
        ref_logprobs: np.ndarray,
        old_logprobs: np.ndarray,
        group_tokens: np.ndarray,
        num_labels: np.ndarray,
        overflow: np.ndarray,
        model_version: int = 0,
        sentinel: bool = False,
        padding: int = 0,
        seq_boundaries: np.ndarray | None = None,
        num_sequences: int = 0,
        visual: dict | None = None,
    ):
        def as2d(x, dtype):
            arr = np.asarray(x, dtype=dtype)
            if arr.ndim == 1:
                arr = arr[None, :]
            return arr

        self.input_ids = as2d(input_ids, np.int32)
        self.labels = as2d(labels, np.int32)
        self.position_ids = as2d(position_ids, np.int32)
        self.segment_ids = as2d(segment_ids, np.int32)
        self.rewards = as2d(rewards, np.float32)
        self.advantages = as2d(advantages, np.float32)
        self.ref_logprobs = as2d(ref_logprobs, np.float32)
        self.old_logprobs = as2d(old_logprobs, np.float32)
        self.group_tokens = as2d(group_tokens, np.float32)
        self.num_labels = as2d(num_labels, np.float32)
        self.overflow = as2d(overflow, np.float32)
        self.model_version = int(model_version)
        self.sentinel = bool(sentinel)
        self.padding = int(padding)
        self.seq_boundaries = (
            np.asarray(seq_boundaries, dtype=np.int32)
            if seq_boundaries is not None
            else None
        )
        self.num_sequences = int(num_sequences)
        # VLM row (single-sequence, reference runs chartqa unpacked —
        # launch.py:63-69): {"pixel_values" [N, patch_dim] f32,
        # "image_grid_thw" [n, 3] i64, "mrope_position_ids" [3, L] i32}
        if visual is not None:
            visual = {
                "pixel_values": np.asarray(visual["pixel_values"], np.float32),
                "image_grid_thw": np.asarray(
                    visual["image_grid_thw"], np.int64
                ).reshape(-1, 3),
                "mrope_position_ids": np.asarray(
                    visual["mrope_position_ids"], np.int32
                ),
            }
        self.visual = visual

    @property
    def length(self) -> int:
        return int(self.input_ids.shape[1])

    def arrays(self) -> dict[str, np.ndarray]:
        out = {}
        for name in _INT_FIELDS + _FLOAT_FIELDS:
            out[name] = getattr(self, name)
        return out

    def to_msg(self, arrays: bool = False) -> dict[str, Any]:
        """Serialize for the training_data stream. ``arrays=True`` keeps
        numpy arrays (binary stream backend: ~4-5x faster encode/decode than
        the JSON list path on full packed batches)."""
        if arrays:
            msg: dict[str, Any] = {
                name: getattr(self, name)[0] for name in _INT_FIELDS + _FLOAT_FIELDS
            }
        else:
            msg = {
                name: getattr(self, name)[0].tolist()
                for name in _INT_FIELDS + _FLOAT_FIELDS
            }
        msg["model_version"] = self.model_version
        msg["sentinel"] = self.sentinel
        msg["padding"] = self.padding
        msg["num_sequences"] = self.num_sequences
        if self.seq_boundaries is not None:
            msg["seq_boundaries"] = self.seq_boundaries.tolist()
        if self.visual is not None:
            msg["visual"] = (
                dict(self.visual)
                if arrays
                else {k: v.tolist() for k, v in self.visual.items()}
            )
        return msg

    @classmethod
    def from_msg(cls, msg: dict[str, Any]) -> "TrainerBatch":
        kwargs: dict[str, Any] = {
            name: np.asarray(msg[name]) for name in _INT_FIELDS + _FLOAT_FIELDS
        }
        return cls(
            model_version=msg.get("model_version", 0),
            sentinel=msg.get("sentinel", False),
            padding=msg.get("padding", 0),
            num_sequences=msg.get("num_sequences", 0),
            seq_boundaries=msg.get("seq_boundaries"),
            visual=msg.get("visual"),
            **kwargs,
        )

    def make_slices(self, num_slices: int) -> list["TrainerBatch"]:
        """Split into ``num_slices`` contiguous context-parallel shards
        (contract of reference types.py:145-180)."""
        length = self.length
        if self.visual is not None and num_slices > 1:
            raise ValueError(
                "VLM batches cannot be context-parallel sliced (reference "
                "also forbids seq_parallel for VLM, launch.py:63-69)"
            )
        if length % num_slices != 0:
            raise ValueError(f"length {length} not divisible by {num_slices}")
        step = length // num_slices
        slices = []
        for i in range(num_slices):
            sl = slice(i * step, (i + 1) * step)
            kwargs = {name: getattr(self, name)[:, sl] for name in _INT_FIELDS + _FLOAT_FIELDS}
            slices.append(
                TrainerBatch(
                    model_version=self.model_version,
                    sentinel=self.sentinel,
                    padding=self.padding,
                    seq_boundaries=self.seq_boundaries,
                    num_sequences=self.num_sequences,
                    **kwargs,
                )
            )
        return slices
