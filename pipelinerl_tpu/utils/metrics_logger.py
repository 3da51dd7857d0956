"""Per-stage metrics logging: JSONL files + optional W&B forwarding.

The reference logs every stage to one shared W&B run group
(utils.py:198-253). wandb is not installed in this image, so the primary
sink is ``<output_dir>/metrics/<stage>.jsonl`` (one JSON object per step
with a wall-clock stamp); if wandb IS importable the same dicts are
forwarded with the run group derived from the output dir, keeping the
reference's observability contract.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any


class MetricsLogger:
    def __init__(self, output_dir: str | Path, stage: str, use_wandb: bool = True):
        self.path = Path(output_dir) / "metrics" / f"{stage}.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", buffering=1)
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: F401 — optional

                run_group = Path(output_dir).name
                self._wandb = wandb.init(
                    project="pipelinerl-tpu",
                    group=run_group,
                    name=f"{run_group}/{stage}",
                    resume="allow",
                )
            except Exception:
                self._wandb = None

    def log(self, metrics: dict[str, Any], step: int | None = None) -> None:
        record = {"_time": time.time(), **metrics}
        if step is not None:
            record["_step"] = step
        self._fh.write(json.dumps(record, default=float) + "\n")
        if self._wandb is not None:
            try:
                self._wandb.log(metrics, step=step)
            except Exception:
                pass

    def close(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
