"""VLM end-to-end learning oracle: the full inline pipeline (engine with
vision tower + actor + preprocessor + trainer with frozen-tower spliced
forward) must LEARN the visual bandit — the answer is decodable only from
the image pixels, so success above chance proves the visual tokens carry
through rollouts, packing (pack_visual_sample), and the trainer's mrope
forward. The round-1 VERDICT's done-criterion for the VLM path."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_vlm_bandit_learns(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # Stochastic learning oracle: an A/B over the round-2 and round-3 trees
    # measured run-to-run tails of 0.54-0.96 on IDENTICAL code (async
    # scheduling under CPU contention shifts how stale the early data is),
    # so a single-shot 0.7 gate is flaky at either commit. Two independent
    # runs must clear the gate once — chance (0.5 success) cannot; a policy
    # that reads the pixels does so reliably.
    tails = []
    for attempt in range(2):
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax; jax.config.update('jax_platforms', 'cpu');"
                "from pipelinerl_tpu.launch import main; main()",
                f"output_dir={tmp_path}/run{attempt}",
                "--config-dir=conf",
                "--config-name=vlm_bandit_cpu",
            ],
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
            timeout=1500,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        stats = json.loads(proc.stdout.strip().splitlines()[-1])
        assert stats["trainer"]["completed_steps"] >= 100, stats
        # two balanced classes: text-only policy caps at 0.5; pixels push
        # higher. Gate on the cumulative last-third success — the final
        # publish window can be a few groups and is too noisy to assert on.
        tails.append(stats["actor"]["success_tail_mean"])
        if tails[-1] >= 0.7:
            return
    raise AssertionError(f"VLM bandit never cleared 0.7: tails={tails}")
