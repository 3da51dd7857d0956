"""Full multi-process deployment test: the REAL ``run_processes`` launcher
spawns a stream hub, an engine server, TWO trainer processes forming one
jax.distributed world (dp=4 × tp=2 over 8 virtual CPU devices), an actor,
and a preprocessor — streams ride the TCP hub, weight updates ride the
binary HTTP push — and the bandit still LEARNS.

This is the v5e-16-shaped deployment (BASELINE.md north star) exercised on
virtual CPU devices: trainer world spanning processes over DCN-like
boundaries, engines receiving in-flight cross-process weight pushes
(reference analogues: launch.py:306-399 multi-node launch,
finetune_loop.py:234-292 NCCL broadcast, streams.py:103-232 Redis).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_worldmap_split_trainer_jobs():
    from pipelinerl_tpu.config import Config
    from pipelinerl_tpu.world import WorldMap

    cfg = Config(
        {
            "world": {
                "hosts": ["10.0.0.1", "10.0.0.2"],
                "replicas": 2,
                "trainer_procs": 2,
                "stream_hub": True,
            },
            "actor": {"replicas": 2},
        }
    )
    wm = WorldMap(cfg)
    assert len(wm.jobs_of("engine")) == 2
    assert len(wm.jobs_of("trainer")) == 2
    assert len(wm.jobs_of("stream_hub")) == 1
    assert wm.stream_hub_addr == "10.0.0.1:7099"
    assert wm.num_trainers == 2
    trainers = wm.jobs_of("trainer")
    assert [t.extra["process_id"] for t in trainers] == [0, 1]
    assert all(t.extra["coordinator"] == "10.0.0.1:7199" for t in trainers)
    # engines spread over both hosts
    assert {j.hostname for j in wm.jobs_of("engine")} == {"10.0.0.1", "10.0.0.2"}
    assert not wm.jobs_of("device")


def test_run_processes_dry_run_split(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["DRY_RUN"] = "1"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "from pipelinerl_tpu.launch import main; main()",
            f"output_dir={tmp_path}",
            "--config-dir=conf",
            "--config-name=bandit_cpu",
            "launch_mode=processes",
            "+world.trainer_procs=2",
            "+world.stream_hub=true",
            "+parallel.dp=4",
            "+parallel.tp=2",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    exp_cfg = (tmp_path / "conf" / "exp_config.yaml").read_text()
    assert "backend: tcp" in exp_cfg
    assert "trainer" in exp_cfg


@pytest.mark.slow
def test_two_process_trainer_pipeline_learns(tmp_path):
    """The full supervised deployment with a split 2-process trainer world."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # every spawned chip job gets 4 virtual CPU devices: the two trainer
    # ranks form an 8-device global mesh (dp=4 across ranks, tp=2 on-host)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(REPO)
    env.pop("DRY_RUN", None)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "from pipelinerl_tpu.launch import main; main()",
            f"output_dir={tmp_path}",
            "--config-dir=conf",
            "--config-name=bandit_cpu",
            "launch_mode=processes",
            "+world.trainer_procs=2",
            "+world.stream_hub=true",
            # unique ports: a previous timed-out run must not collide
            f"+world.stream_hub_port={18000 + os.getpid() % 2000}",
            f"+world.coordinator_port={21000 + os.getpid() % 2000}",
            f"+world.engine_start_port={24000 + os.getpid() % 2000}",
            "+parallel.dp=4",
            "+parallel.tp=2",
            "finetune.max_train_steps=24",
            "total_groups=120",
            "max_lag=64",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    launcher_logs = ""
    for f in sorted((tmp_path / "logs").glob("*.out")):
        launcher_logs += f"\n===== {f.name} =====\n" + f.read_text()[-2500:]
    assert proc.returncode == 0, (proc.stderr[-2000:] or "") + launcher_logs

    # both trainer ranks ran real optimizer steps
    metrics_files = list(tmp_path.glob("metrics/trainer_*.jsonl"))
    assert metrics_files, f"no trainer metrics under {tmp_path}: {launcher_logs}"
    steps_by_rank = {}
    for mf in metrics_files:
        last = [json.loads(l) for l in mf.read_text().splitlines() if l.strip()]
        if last:
            steps_by_rank[mf.name] = last[-1].get("completed_steps", 0)
    assert any(v >= 20 for v in steps_by_rank.values()), steps_by_rank

    # learning signal: actor-published success improves through the hub's
    # persisted stats stream
    from pipelinerl_tpu.streams_binary import FrameReader

    stats_file = tmp_path / "streams_hub" / "stats" / "0" / "0.scf"
    assert stats_file.exists(), f"hub did not persist stats: {launcher_logs}"
    snapshots = list(FrameReader(stats_file).read_available())
    rewards = [s["reward_mean"] for s in snapshots if "reward_mean" in s]
    assert len(rewards) >= 3, rewards
    # the bandit's dense shaping reward (distance of first byte to target)
    # must improve through cross-process weight pushes; exact-match success
    # needs ~40 steps to fire and this run is capped at 24 for test latency
    early = sum(rewards[:2]) / 2
    late = sum(rewards[-2:]) / 2
    assert late > early + 0.04, f"no learning: reward {early:.3f} → {late:.3f} ({rewards})"


def test_worldmap_honors_placement_fractions():
    """world.actor_fraction / finetune_fraction split the host list between
    engine and trainer jobs (the reference's actor:finetune GPU split,
    /root/reference/pipelinerl/world.py:143-192, expressed host-wise)."""
    from pipelinerl_tpu.config import Config
    from pipelinerl_tpu.world import WorldMap

    hosts = [f"10.0.0.{i}" for i in range(1, 9)]
    cfg = Config(
        {
            "world": {
                "hosts": hosts,
                "replicas": 6,
                "trainer_procs": 2,
                "actor_fraction": 6,
                "finetune_fraction": 2,
            },
        }
    )
    wm = WorldMap(cfg)
    engine_hosts = {j.hostname for j in wm.jobs_of("engine")}
    trainer_hosts = {j.hostname for j in wm.jobs_of("trainer")}
    # 6:2 split over 8 hosts → engines on the first 6, trainers on the last 2
    assert engine_hosts == set(hosts[:6])
    assert trainer_hosts == set(hosts[6:])
    assert not engine_hosts & trainer_hosts
