"""Real-chip end-to-end oracle (@pytest.mark.tpu — run ALONE on the TPU
host: ``python -m pytest tests/test_tpu_e2e.py -m tpu``, no parallel CPU
jobs, see STATUS.md tunnel notes).

The full pipeline — engine + actor + preprocessor + trainer time-sharing
one chip, in-flight weight pushes on — must learn the bandit, the TPU
analogue of the reference's ~20-minute guessing convergence
(/root/reference/README.md:189, conf/test.yaml smoke)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _on_tpu() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


@pytest.mark.tpu
def test_bandit_learns_on_tpu(tmp_path):
    if not _on_tpu():
        pytest.skip("needs a real TPU (run alone on the TPU host)")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from pipelinerl_tpu.launch import main; main()",
            f"output_dir={tmp_path}",
            "--config-dir=conf",
            "--config-name=bandit_tpu",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["trainer"]["completed_steps"] >= 10, stats
    assert stats["trainer"]["last_broadcasted_version"] > 0

    from pipelinerl_tpu.streams import SingleStreamSpec, StreamReader

    reader = StreamReader(SingleStreamSpec(str(tmp_path), "stats"), "files")
    snapshots = list(reader.read_available())
    rewards = [s["reward_mean"] for s in snapshots if "reward_mean" in s]
    assert len(rewards) >= 3, rewards
    early = sum(rewards[:2]) / 2
    late = sum(rewards[-2:]) / 2
    assert late > early + 0.1, f"no learning on TPU: {early:.3f} -> {late:.3f}"
