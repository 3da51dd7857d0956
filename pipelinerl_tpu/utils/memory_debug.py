"""Memory snapshots + jax-profiler tracing at named trainer phases.

Reference analogue: finetune/memory_debug.py (JSONL snapshots of
RSS/CUDA/cgroup at phase hooks, gated by finetune.memory_debug.*) — here the
device side reads JAX's per-device memory_stats (TPU HBM allocator) and the
live-array census, and a second, TPU-native tracing hook wraps a configured
step range in ``jax.profiler`` (the reference has no profiler integration;
SURVEY.md §5.1).

Enable with::

    finetune:
      memory_debug: {enabled: true, every_n: 1}
      profile: {enabled: true, start_step: 10, num_steps: 3}
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path
from typing import Any

import jax

logger = logging.getLogger(__name__)


def _host_memory() -> dict[str, int]:
    out: dict[str, int] = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith(("VmRSS:", "VmHWM:")):
                    key, value = line.split(":", 1)
                    out[key.lower()] = int(value.strip().split()[0]) * 1024
    except OSError:
        pass
    for path, key in (
        ("/sys/fs/cgroup/memory.current", "cgroup_v2_current"),
        ("/sys/fs/cgroup/memory/memory.usage_in_bytes", "cgroup_v1_usage"),
    ):
        try:
            out[key] = int(Path(path).read_text().strip())
        except (OSError, ValueError):
            pass
    return out


def _device_memory() -> dict[str, Any]:
    out: dict[str, Any] = {}
    try:
        for i, dev in enumerate(jax.local_devices()):
            stats = getattr(dev, "memory_stats", lambda: None)()
            if stats:
                out[f"device_{i}"] = {
                    k: stats[k]
                    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                    if k in stats
                }
    except Exception:  # backend without memory stats (CPU)
        pass
    try:
        arrays = jax.live_arrays()
        out["live_arrays"] = len(arrays)
        out["live_array_bytes"] = int(sum(a.nbytes for a in arrays))
    except Exception:
        pass
    return out


class MemoryDebugger:
    """JSONL memory snapshots at named phases (one file per rank)."""

    def __init__(self, out_path: str | Path, rank: int = 0, every_n: int = 1):
        self.path = Path(out_path) / f"memory_debug_{rank}.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.every_n = max(1, every_n)
        self._counts: dict[str, int] = {}
        self._fh = open(self.path, "a", buffering=1)

    def snapshot(self, phase: str, step: int | None = None, **extra: Any) -> None:
        count = self._counts.get(phase, 0)
        self._counts[phase] = count + 1
        if count % self.every_n:
            return
        record = {
            "ts": time.time(),
            "phase": phase,
            "step": step,
            "pid": os.getpid(),
            **_host_memory(),
            **_device_memory(),
            **extra,
        }
        self._fh.write(json.dumps(record) + "\n")

    def close(self) -> None:
        self._fh.close()


class NullDebugger:
    def snapshot(self, phase: str, step: int | None = None, **extra: Any) -> None:
        pass

    def close(self) -> None:
        pass


def create_memory_debugger(cfg: Any, exp_path: str, rank: int = 0):
    """Gated constructor (reference create_memory_debugger)."""
    md = cfg.select("finetune.memory_debug") if hasattr(cfg, "select") else None
    if not md or not md.get("enabled", False):
        return NullDebugger()
    return MemoryDebugger(
        Path(exp_path) / "metrics", rank=rank, every_n=int(md.get("every_n", 1))
    )


class StepProfiler:
    """Wraps steps [start_step, start_step+num_steps) in a jax.profiler
    trace; the TensorBoard-readable trace lands under
    <exp>/profile/plugins/profile/..."""

    def __init__(self, out_dir: str | Path, start_step: int, num_steps: int):
        self.out_dir = str(out_dir)
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self.active = False

    def on_step(self, step: int) -> None:
        if not self.active and step == self.start_step:
            Path(self.out_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.out_dir)
            self.active = True
            logger.info("jax profiler trace started (steps %d..%d) -> %s",
                        self.start_step, self.stop_step - 1, self.out_dir)
        elif self.active and step >= self.stop_step:
            self.stop()

    def stop(self) -> None:
        if self.active:
            jax.profiler.stop_trace()
            self.active = False
            logger.info("jax profiler trace written to %s", self.out_dir)


class NullProfiler:
    def on_step(self, step: int) -> None:
        pass

    def stop(self) -> None:
        pass


def create_step_profiler(cfg: Any, exp_path: str):
    prof = cfg.select("finetune.profile") if hasattr(cfg, "select") else None
    if not prof or not prof.get("enabled", False):
        return NullProfiler()
    return StepProfiler(
        Path(exp_path) / "profile",
        start_step=int(prof.get("start_step", 2)),
        num_steps=int(prof.get("num_steps", 3)),
    )
