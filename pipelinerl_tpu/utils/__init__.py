"""Host-side helpers: per-stage logging, stats math, process supervision."""

from __future__ import annotations

import logging
import math
import os
import signal
import sys
from contextlib import contextmanager
from pathlib import Path
from typing import Iterable

import numpy as np


def enable_compilation_cache(cache_dir: str | Path | None = None) -> str:
    """Point JAX at a persistent on-disk compilation cache so the multi-
    hundred-second warmup compile is paid once per (program, jaxlib) rather
    than once per process. Safe to call more than once. Returns the dir."""
    import jax

    path = str(
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or Path.home() / ".cache" / "pipelinerl_tpu_xla_cache"
    )
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def setup_logging(stage_dir: str | Path | None = None, level: int = logging.INFO) -> None:
    """Configure per-stage logging: stderr + rotating files under the stage dir
    (the reference's primary debugging surface, utils.py:275-322)."""
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stderr)]
    if stage_dir is not None:
        Path(stage_dir).mkdir(parents=True, exist_ok=True)
        for name, lvl in (("info", logging.INFO), ("error", logging.ERROR)):
            fh = logging.FileHandler(Path(stage_dir) / f"{name}.log")
            fh.setLevel(lvl)
            handlers.append(fh)
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )


def calculate_stats(values: Iterable[float]) -> dict[str, float]:
    """mean/min/max/var aggregate used by actor metric publishing
    (reference utils.py:404-428)."""
    arr = np.asarray(list(values), dtype=np.float64)
    if arr.size == 0:
        return {}
    return {
        "mean": float(arr.mean()),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "var": float(arr.var()),
    }


def always_or_never_success_stats(
    problem_success: dict[str, list[float]],
) -> dict[str, float]:
    """Fraction of problems that always/sometimes/never succeed
    (reference utils.py:382-401)."""
    if not problem_success:
        return {}
    always = sometimes = never = 0
    for successes in problem_success.values():
        if not successes:
            continue
        if all(successes):
            always += 1
        elif any(successes):
            sometimes += 1
        else:
            never += 1
    total = max(1, always + sometimes + never)
    return {
        "always_success": always / total,
        "sometimes_success": sometimes / total,
        "never_success": never / total,
    }


@contextmanager
def better_crashing(stage_name: str):
    """Crash hard (kill the whole process group) on unhandled errors so the
    supervisor notices — semantics of reference utils.py:494-508."""
    try:
        yield
    except Exception:
        logging.getLogger(stage_name).exception("Stage %s crashed", stage_name)
        os.kill(os.getpid(), signal.SIGTERM)
        raise


def effective_sample_size(ratio_sum: float, ratio_sq_sum: float) -> float:
    """ESS estimate from importance-ratio sums (reference finetune_loop.py:912-922)."""
    if ratio_sq_sum <= 0:
        return 0.0
    return ratio_sum * ratio_sum / ratio_sq_sum


class SlidingWindowAggregator:
    """Windowed throughput stats (reference actor.py:62-106)."""

    def __init__(self, window_size: int = 50):
        self.window_size = window_size
        self._values: list[tuple[float, float]] = []  # (timestamp, value)

    def update(self, timestamp: float, value: float) -> None:
        self._values.append((timestamp, value))
        if len(self._values) > self.window_size:
            self._values = self._values[-self.window_size :]

    def rate_per_sec(self) -> float:
        if len(self._values) < 2:
            return 0.0
        t0, _ = self._values[0]
        t1, _ = self._values[-1]
        if t1 <= t0:
            return 0.0
        total = sum(v for _, v in self._values[1:])
        return total / (t1 - t0)
