import pytest

from pipelinerl_tpu.config import compose
from pipelinerl_tpu.launch import validate_config


def make(overrides=()):
    return compose("conf", "bandit_cpu", overrides=["output_dir=/tmp/x", *overrides])


def test_valid_config_passes():
    validate_config(make())


def test_engine_longer_than_seq_rejected():
    with pytest.raises(ValueError, match="packed trainer batch"):
        validate_config(make(["engine.max_len=100000"]))


def test_single_attempt_rejected():
    with pytest.raises(ValueError, match="leave-one-out"):
        validate_config(make(["attempts=1"]))


def test_max_tokens_exceeding_cache_rejected():
    with pytest.raises(ValueError, match="KV cache"):
        validate_config(make(["llm.parameters.max_tokens=64"]))


def test_bad_policy_rejected():
    with pytest.raises(ValueError, match="policy_loss"):
        validate_config(make(["finetune.rl.policy_loss=dqn"]))


def test_debug_without_replay_rejected():
    with pytest.raises(ValueError, match="streams_from"):
        validate_config(make(["+debug.mode=finetune"]))
