"""Trainer-state messages and the listener used by every non-trainer stage.

Mirrors the reference's control-plane contract
(/root/reference/pipelinerl/finetune_loop.py:141-171 and state.py:20-65):
the trainer publishes ``WeightUpdateSuccess`` / ``SamplesProcessed`` /
``TrainingDone`` messages to the ``weight_update_request`` topic; actors and
preprocessors tail it in a daemon thread to track the propagated weight
version (== cumulative trained samples) and apply backpressure/lag control.
"""

from __future__ import annotations

import threading
from typing import Literal

from pydantic import BaseModel

from .streams import SingleStreamSpec, StreamReader, StreamWriter

TRAINER_TOPIC = "weight_update_request"


class WeightUpdateRequest(BaseModel):
    kind: Literal["weight_update_request"] = "weight_update_request"
    version: int


class WeightUpdateSuccess(BaseModel):
    kind: Literal["weight_update_success"] = "weight_update_success"
    version: int


class SamplesProcessed(BaseModel):
    kind: Literal["samples_processed"] = "samples_processed"
    samples: int


class TrainingDone(BaseModel):
    kind: Literal["training_done"] = "training_done"


def parse_trainer_message(msg: dict):
    kind = msg.get("kind")
    types = {
        "weight_update_request": WeightUpdateRequest,
        "weight_update_success": WeightUpdateSuccess,
        "samples_processed": SamplesProcessed,
        "training_done": TrainingDone,
    }
    cls = types.get(kind)
    if cls is None:
        raise ValueError(f"Unknown trainer message kind: {kind!r}")
    return cls.model_validate(msg)


def trainer_state_spec(exp_path: str) -> SingleStreamSpec:
    return SingleStreamSpec(exp_path=exp_path, topic=TRAINER_TOPIC)


class TrainerState:
    """Tracks the trainer's progress as observed from the control stream."""

    def __init__(self, exp_path: str):
        self.exp_path = exp_path
        self.propagated_weight_version: int | None = None
        self.samples_processed: int = 0
        self.training_done: bool = False
        self._cond = threading.Condition()
        self._thread: threading.Thread | None = None
        self._reader: StreamReader | None = None

    # -- publishing side (trainer) ----------------------------------------
    @staticmethod
    def make_writer(exp_path: str) -> StreamWriter:
        return StreamWriter(trainer_state_spec(exp_path))

    # -- listening side ----------------------------------------------------
    def start_listening(self) -> None:
        assert self._thread is None
        self._reader = StreamReader(trainer_state_spec(self.exp_path))
        self._thread = threading.Thread(target=self._listen, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._reader is not None:
            self._reader.stop()

    def _listen(self) -> None:
        assert self._reader is not None
        for msg in self._reader.read():
            self.process_message(msg)
            if self.training_done:
                break

    def process_message(self, msg: dict) -> None:
        parsed = parse_trainer_message(msg)
        with self._cond:
            if isinstance(parsed, (WeightUpdateSuccess, WeightUpdateRequest)):
                if (
                    self.propagated_weight_version is None
                    or parsed.version > self.propagated_weight_version
                ):
                    self.propagated_weight_version = parsed.version
            elif isinstance(parsed, SamplesProcessed):
                self.samples_processed = max(self.samples_processed, parsed.samples)
            elif isinstance(parsed, TrainingDone):
                self.training_done = True
            self._cond.notify_all()

    def debug_mode_init(self) -> None:
        """Fake version 0 when running a stage in isolation
        (reference state.py:28-32)."""
        with self._cond:
            self.propagated_weight_version = 0
            self._cond.notify_all()

    def wait_for_model_version(
        self, min_version: int = 0, timeout: float | None = None
    ) -> int:
        deadline = None if timeout is None else (timeout + _now())
        with self._cond:
            while (
                self.propagated_weight_version is None
                or self.propagated_weight_version < min_version
            ):
                if self.training_done:
                    break
                remaining = None if deadline is None else deadline - _now()
                if remaining is not None and remaining <= 0:
                    raise TimeoutError(
                        f"Timed out waiting for weight version >= {min_version}"
                    )
                self._cond.wait(timeout=0.2 if remaining is None else min(0.2, remaining))
            return self.propagated_weight_version or 0


def _now() -> float:
    import time

    return time.monotonic()
