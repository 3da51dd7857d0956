"""Inline-pipeline KL regression: a run with ``finetune.rl.kl_coef != 0``
builds a reference-policy engine from the initial weights. That engine must
own COPIES of the param buffers — the TrainerLoop donates the originals on
every optimizer step, so a shared tree made every ``ref_score_fn`` call after
step 1 raise ``Array has been deleted`` (round-1 regression).

Runs the real inline launch (engine + actor + preprocessor + trainer) for
several optimizer steps with the ppo preset's KL penalty enabled.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_inline_kl_survives_optimizer_steps(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
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
            "finetune.rl.policy_loss=ppo",
            "finetune.rl.use_advantages=true",
            "finetune.rl.epsilon_low=0.2",
            "finetune.rl.epsilon_high=0.2",
            "finetune.rl.kl_coef=0.05",
            "finetune.rl.final_kl_coef=0.05",
            "finetune.max_train_steps=4",
            "total_groups=24",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=240,  # healthy run takes ~20 s; the donation bug hangs
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "Array has been deleted" not in proc.stderr
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    # ≥2 optimizer steps ran with the ref engine alive (the donation bug
    # crashed the preprocessor on the first post-update score call)
    assert stats["trainer"]["completed_steps"] >= 2, stats
