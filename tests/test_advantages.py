import math

import numpy as np
import pytest

from pipelinerl_tpu.train.advantages import (
    group_advantages_all_zero,
    populate_rl_data,
    prepare_rl_fields,
    training_text_to_sample,
)
from pipelinerl_tpu.types import MASKED_TOKEN_ID, TrainingText

EOS = 99


def make_sample(group, rollout, reward, n_prompt=2, n_out=3, step=0, finished=True):
    input_ids = list(range(10, 10 + n_prompt + n_out))
    labels = [MASKED_TOKEN_ID] * n_prompt + input_ids[n_prompt:]
    s = {
        "input_ids": input_ids,
        "labels": labels,
        "reward": reward,
        "logprobs": [-0.5] * n_out,
        "ref_logprobs": [],
        "group_id": group,
        "rollout_index": rollout,
        "step_index": step,
        "finished": finished,
        "finish_reason": "stop" if finished else None,
    }
    return prepare_rl_fields(s)


def test_prepare_rl_fields_pads_logprobs():
    s = make_sample("g", 0, 1.0, n_prompt=2, n_out=3)
    assert s["old_logprobs"][:2] == [0.0, 0.0]
    assert s["old_logprobs"][2:] == [-0.5] * 3
    assert s["rewards"] == [1.0] * 5
    assert s["num_labels"] == [0.0, 0.0, 1.0, 1.0, 1.0]


def test_prepare_rl_fields_rejects_mismatch():
    s = make_sample("g", 0, 1.0)
    s2 = dict(s, logprobs=[-0.5] * 2, labels=s["labels"], input_ids=s["input_ids"])
    with pytest.raises(ValueError):
        prepare_rl_fields(
            {
                "input_ids": s["input_ids"],
                "labels": s["labels"],
                "reward": 0.0,
                "logprobs": [-0.5] * 2,
            }
        )


def test_loo_advantages():
    rewards = [1.0, 0.0, 0.5, 0.5]
    samples = [make_sample("g", i, r) for i, r in enumerate(rewards)]
    populate_rl_data(samples, EOS, divide_advantage_by_std=False)
    # LOO baselines: mean of the others
    expected = [
        1.0 - (0.0 + 0.5 + 0.5) / 3,
        0.0 - (1.0 + 0.5 + 0.5) / 3,
        0.5 - (1.0 + 0.0 + 0.5) / 3,
        0.5 - (1.0 + 0.0 + 0.5) / 3,
    ]
    for s, e in zip(samples, expected):
        assert s["advantages"] == pytest.approx([e] * 5)


def test_loo_advantages_with_std():
    rewards = [1.0, 0.0]
    samples = [make_sample("g", i, r) for i, r in enumerate(rewards)]
    populate_rl_data(samples, EOS, divide_advantage_by_std=True)
    std = np.std(rewards, ddof=1)  # sample std like pandas
    assert samples[0]["advantages"][0] == pytest.approx((1.0 - 0.0) / (std + 1e-4))
    assert samples[1]["advantages"][0] == pytest.approx((0.0 - 1.0) / (std + 1e-4))


def test_single_rollout_group_zero_advantage():
    samples = [make_sample("g", 0, 0.7)]
    populate_rl_data(samples, EOS)
    assert samples[0]["advantages"] == [0.0] * 5
    assert group_advantages_all_zero(samples)


def test_group_tokens_mean_over_rollouts():
    samples = [
        make_sample("g", 0, 1.0, n_out=3),  # 5 tokens
        make_sample("g", 0, 1.0, n_out=3, step=1),  # same rollout, 5 more
        make_sample("g", 1, 0.0, n_out=5),  # 7 tokens
    ]
    populate_rl_data(samples, EOS)
    # rollout 0: 10 tokens, rollout 1: 7 → mean 8.5
    assert samples[0]["group_tokens"][0] == pytest.approx(8.5)
    assert samples[2]["group_tokens"][0] == pytest.approx(8.5)


def test_multi_step_loo_is_per_step():
    # two rollouts, two steps each; steps have different rewards
    samples = [
        make_sample("g", 0, 1.0, step=0),
        make_sample("g", 0, 2.0, step=1),
        make_sample("g", 1, 3.0, step=0),
        make_sample("g", 1, 4.0, step=1),
    ]
    populate_rl_data(samples, EOS)
    assert samples[0]["advantages"][0] == pytest.approx(1.0 - 3.0)
    assert samples[1]["advantages"][0] == pytest.approx(2.0 - 4.0)


def test_overflow_rules():
    finished = make_sample("g", 0, 1.0, finished=True)
    unfinished_no_eos = make_sample("g", 1, 1.0, finished=False)
    unfinished_no_eos["finish_reason"] = None
    length_hit = make_sample("g", 2, 1.0, finished=False)
    length_hit["finish_reason"] = "length"
    with_eos = make_sample("g", 3, 1.0, finished=False)
    with_eos["finish_reason"] = None
    with_eos["input_ids"] = with_eos["input_ids"][:-1] + [EOS]
    samples = [finished, unfinished_no_eos, length_hit, with_eos]
    populate_rl_data(samples, EOS)
    assert finished["overflow"][0] == 0.0
    assert unfinished_no_eos["overflow"][0] == 1.0
    assert length_hit["overflow"][0] == 1.0
    assert with_eos["overflow"][0] == 0.0


def test_training_text_roundtrip():
    tt = TrainingText(
        input_ids=[1, 2, 3, 4],
        labels=[MASKED_TOKEN_ID, MASKED_TOKEN_ID, 3, 4],
        logprobs=[-0.1, -0.2],
        reward=0.5,
        group_id="g1",
        finished=True,
        finish_reason="stop",
    )
    s = training_text_to_sample(tt, model_version=7, rollout_index=2, step_index=1)
    assert s["model_version"] == 7
    assert s["old_logprobs"] == [0.0, 0.0, -0.1, -0.2]
    assert s["rollout_index"] == 2 and s["step_index"] == 1
