"""Memory snapshot tracer + jax step profiler."""

import json
from pathlib import Path

from pipelinerl_tpu.config import Config
from pipelinerl_tpu.utils.memory_debug import (
    MemoryDebugger,
    NullDebugger,
    NullProfiler,
    StepProfiler,
    create_memory_debugger,
    create_step_profiler,
)


def test_snapshots_written_with_expected_fields(tmp_path):
    dbg = MemoryDebugger(tmp_path, rank=3, every_n=2)
    for step in range(4):
        dbg.snapshot("before_train_pass", step=step, queue_depth=step)
    dbg.snapshot("after_save", step=99)
    dbg.close()
    lines = [json.loads(l) for l in (tmp_path / "memory_debug_3.jsonl").open()]
    # every_n=2 keeps snapshots 0 and 2 of the phase, plus the save phase
    assert [l["step"] for l in lines] == [0, 2, 99]
    first = lines[0]
    assert first["phase"] == "before_train_pass"
    assert first["queue_depth"] == 0
    assert "vmrss" in first  # host RSS from /proc
    assert "live_array_bytes" in first


def test_gating(tmp_path):
    assert isinstance(
        create_memory_debugger(Config({}), str(tmp_path)), NullDebugger
    )
    cfg = Config({"finetune": {"memory_debug": {"enabled": True}}})
    dbg = create_memory_debugger(cfg, str(tmp_path), rank=0)
    assert isinstance(dbg, MemoryDebugger)
    dbg.close()
    assert isinstance(create_step_profiler(Config({}), str(tmp_path)), NullProfiler)


def test_step_profiler_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    prof = StepProfiler(tmp_path / "prof", start_step=2, num_steps=2)
    f = jax.jit(lambda x: x * 2 + 1)
    for step in range(6):
        prof.on_step(step)
        jax.block_until_ready(f(jnp.ones((8, 8))))
    prof.stop()
    assert not prof.active
    # a TensorBoard-readable trace directory exists and is non-empty
    produced = list(Path(tmp_path / "prof").rglob("*"))
    assert produced, "profiler wrote nothing"


def test_trainer_config_plumbing(tmp_path):
    cfg = Config(
        {"finetune": {"profile": {"enabled": True, "start_step": 1, "num_steps": 1}}}
    )
    prof = create_step_profiler(cfg, str(tmp_path))
    assert isinstance(prof, StepProfiler)
    assert prof.start_step == 1 and prof.stop_step == 2
