"""Reference-policy engine provisioning in processes mode.

Round-2 verdict gap: ``launch_mode=processes`` with ``kl_coef != 0`` silently
scored KL against a zero reference policy because no job ever set
``me.ref_llm_urls``. The WorldMap now provisions a frozen ``ref_engine`` job
(the reference provisions a dedicated ref vLLM,
/root/reference/pipelinerl/launch.py:149, world.py:230-268; scoring at
preprocess.py:86-104) and the launcher hands its URL to the preprocessor.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _world(overrides: dict):
    from pipelinerl_tpu.config import Config
    from pipelinerl_tpu.world import WorldMap

    base = {
        "world": {"hosts": ["127.0.0.1"]},
        "finetune": {"rl": {"kl_coef": 0.05}},
    }
    base.update(overrides)
    return WorldMap(Config(base))


def test_worldmap_provisions_ref_engine_when_kl_nonzero():
    wm = _world({})
    refs = wm.jobs_of("ref_engine")
    assert len(refs) == 1
    assert refs[0].extra.get("frozen") is True
    assert wm.ref_llm_urls == [f"http://127.0.0.1:{refs[0].port}"]
    # the ref engine must NOT be a weight-push / rollout target
    assert wm.ref_llm_urls[0] not in wm.llm_urls


def test_worldmap_no_ref_engine_when_kl_zero():
    wm = _world({"finetune": {"rl": {"kl_coef": 0.0}}})
    assert not wm.jobs_of("ref_engine")
    assert wm.ref_llm_urls == []


def test_worldmap_ref_engine_forced_off():
    wm = _world({"world": {"hosts": ["127.0.0.1"], "ref_engine": False}})
    assert not wm.jobs_of("ref_engine")


def test_validate_config_rejects_kl_without_ref_engine():
    from pipelinerl_tpu.config import compose
    from pipelinerl_tpu.launch import validate_config

    cfg = compose(
        str(REPO / "conf"),
        "bandit_cpu",
        [
            "launch_mode=processes",
            "finetune.rl.kl_coef=0.05",
            "+world.ref_engine=false",
        ],
    )
    with pytest.raises(ValueError, match="zero reference policy"):
        validate_config(cfg)


def test_frozen_server_rejects_weight_update():
    import asyncio

    from pipelinerl_tpu.inference.server import InferenceServer

    class _Tok:
        eos_token_id = 0

    server = InferenceServer.__new__(InferenceServer)
    server.frozen = True

    class _Req:
        content_type = "application/x-msgpack"

    resp = asyncio.run(server.receive_weight_update(_Req()))
    assert resp.status == 403


@pytest.mark.slow
def test_processes_mode_ref_logprobs_reach_trainer(tmp_path):
    """Full processes-mode run with KL enabled: the launcher must spawn a
    frozen ref_engine, the preprocessor must score against it, and NONZERO
    ref_logprobs must appear in the training_data stream. Fails on round-2
    code (no ref_engine job existed → ref_logprobs all zero)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env.pop("XLA_FLAGS", None)
    env.pop("DRY_RUN", None)
    port_base = 26000 + os.getpid() % 2000
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
            f"+world.engine_start_port={port_base}",
            f"+world.ref_engine_port={port_base + 500}",
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
        timeout=600,
    )
    logs = ""
    log_dir = tmp_path / "logs"
    if log_dir.exists():
        for f in sorted(log_dir.glob("*.out")):
            logs += f"\n===== {f.name} =====\n" + f.read_text()[-2000:]
    assert proc.returncode == 0, (proc.stderr[-2000:] or "") + logs

    # the launcher provisioned the ref_engine job
    exp_cfg = (tmp_path / "conf" / "exp_config.yaml").read_text()
    assert "ref_engine" in exp_cfg

    # nonzero ref_logprobs flowed into training_data packs
    saw_nonzero = False
    for part in (tmp_path / "streams" / "training_data").rglob("*.jsonl"):
        for line in part.read_text().splitlines():
            msg = json.loads(line)
            ref = msg.get("ref_logprobs")  # flat list: row 0 of the pack
            if ref and any(abs(v) > 1e-9 for v in ref):
                saw_nonzero = True
                break
        if saw_nonzero:
            break
    assert saw_nonzero, "no nonzero ref_logprobs in any training_data pack"
