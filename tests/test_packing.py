import numpy as np
import pytest

from pipelinerl_tpu.train.advantages import populate_rl_data, prepare_rl_fields
from pipelinerl_tpu.train.packing import greedy_pack, make_sentinel_batch, pack_samples
from pipelinerl_tpu.types import MASKED_TOKEN_ID, TrainerBatch

EOS = 9


def make_sample(n_prompt, n_out, reward=1.0, group="g", rollout=0):
    ids = list(np.arange(n_prompt + n_out) + 1)
    labels = [MASKED_TOKEN_ID] * n_prompt + ids[n_prompt:]
    s = prepare_rl_fields(
        {
            "input_ids": ids,
            "labels": labels,
            "reward": reward,
            "logprobs": [-0.3] * n_out,
            "group_id": group,
            "rollout_index": rollout,
            "step_index": 0,
            "finished": True,
            "model_version": 3,
        }
    )
    return s


def test_pack_layout():
    samples = [make_sample(2, 3), make_sample(1, 2, rollout=1)]
    populate_rl_data(samples, EOS)
    batch = pack_samples(samples, seq_length=16, eos_token_id=EOS)
    assert batch.length == 16
    assert batch.padding == 8
    assert batch.num_sequences == 2
    # positions restart per segment, padding is its own segment
    np.testing.assert_array_equal(
        batch.position_ids[0], [0, 1, 2, 3, 4, 0, 1, 2, 0, 1, 2, 3, 4, 5, 6, 7]
    )
    np.testing.assert_array_equal(
        batch.segment_ids[0], [0] * 5 + [1] * 3 + [2] * 8
    )
    # first token of every segment masked; padding labels masked
    assert batch.labels[0, 0] == MASKED_TOKEN_ID
    assert batch.labels[0, 5] == MASKED_TOKEN_ID
    assert (batch.labels[0, 8:] == MASKED_TOKEN_ID).all()
    # padding num_labels/group_tokens are 1 (no div-by-zero in loss metrics)
    assert (batch.num_labels[0, 8:] == 1.0).all()
    assert (batch.group_tokens[0, 8:] == 1.0).all()
    assert batch.model_version == 3
    np.testing.assert_array_equal(batch.seq_boundaries, [0, 5, 8, 16])


def test_pack_overflow_raises():
    samples = [make_sample(4, 5)]
    with pytest.raises(ValueError):
        pack_samples(samples, seq_length=8, eos_token_id=EOS)


def test_sentinel_batch_no_labels():
    batch = make_sentinel_batch(12, EOS, model_version=5)
    assert batch.sentinel
    assert (batch.labels[0] == MASKED_TOKEN_ID).all()
    assert batch.model_version == 5
    assert batch.length == 12


def test_greedy_pack_respects_capacity():
    samples = [make_sample(2, 3) for _ in range(5)]  # 5 tokens each
    packs = greedy_pack(samples, seq_length=12)
    assert [len(p) for p in packs] == [2, 2, 1]


def test_batch_roundtrip_and_slices():
    samples = [make_sample(2, 3), make_sample(1, 2)]
    populate_rl_data(samples, EOS)
    batch = pack_samples(samples, seq_length=16, eos_token_id=EOS)
    msg = batch.to_msg()
    back = TrainerBatch.from_msg(msg)
    np.testing.assert_array_equal(back.input_ids, batch.input_ids)
    np.testing.assert_array_equal(back.old_logprobs, batch.old_logprobs)
    slices = back.make_slices(4)
    assert len(slices) == 4
    assert all(s.length == 4 for s in slices)
    np.testing.assert_array_equal(
        np.concatenate([s.input_ids[0] for s in slices]), batch.input_ids[0]
    )
    with pytest.raises(ValueError):
        back.make_slices(5)
