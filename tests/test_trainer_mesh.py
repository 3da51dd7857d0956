"""TrainerLoop over a real (dp, cp, tp) mesh on 8 virtual CPU devices."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.config import compose
from pipelinerl_tpu.models.transformer import ModelConfig, init_params
from pipelinerl_tpu.state import TrainerState
from pipelinerl_tpu.streams import (
    SingleStreamSpec,
    StreamReader,
    StreamWriter,
    set_streams_backend,
)
from pipelinerl_tpu.train.advantages import populate_rl_data, prepare_rl_fields
from pipelinerl_tpu.train.packing import pack_samples
from pipelinerl_tpu.train.trainer import TrainerLoop

EOS = 9


def make_batch_msgs(n, seq_length=64, rng=None, vocab=120):
    rng = rng or np.random.default_rng(0)
    msgs = []
    for i in range(n):
        samples = []
        for r in range(2):
            n_prompt, n_out = 2, 5
            ids = rng.integers(1, vocab, n_prompt + n_out).tolist()
            samples.append(
                prepare_rl_fields(
                    {
                        "input_ids": ids,
                        "labels": [-100] * n_prompt + ids[n_prompt:],
                        "reward": float(r),
                        "logprobs": [-0.5] * n_out,
                        "group_id": f"g{i}",
                        "rollout_index": r,
                        "step_index": 0,
                        "finished": True,
                        "model_version": 0,
                    }
                )
            )
        populate_rl_data(samples, EOS)
        msgs.append(pack_samples(samples, seq_length, EOS).to_msg())
    return msgs


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_loop_on_mesh(tmp_path):
    cfg = compose(
        "conf",
        "base",
        overrides=[
            f"output_dir={tmp_path}",
            "finetune.samples_per_step=8",
            "finetune.max_train_steps=2",
            "finetune.seq_length=64",
            "finetune.learning_rate=1e-3",
            "finetune.num_warmup_steps=0",
            "finetune.gradient_checkpointing=false",
            "finetune.param_dtype=float32",
            "finetune.save_checkpoint_steps=0",
            "+parallel.dp=2",
            "+parallel.cp=2",
            "+parallel.tp=2",
        ],
    )
    set_streams_backend("files")
    model_cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), model_cfg)

    pushed = []
    trainer = TrainerLoop(
        cfg,
        params,
        model_cfg,
        str(tmp_path),
        weight_update_cb=lambda p, v: pushed.append(v),
    )
    assert trainer.mesh is not None and trainer.dp == 2

    writer = StreamWriter(
        SingleStreamSpec(exp_path=str(tmp_path), topic="training_data", partition=0)
    )
    # 2 steps × (8 samples / 2 per row) = 8 rows; dp=2 → 4 passes
    for msg in make_batch_msgs(8):
        writer.write(msg)
    writer.close()

    metrics = trainer.run(max_steps=2)
    assert metrics.completed_steps == 2
    assert metrics.samples == 16
    assert pushed, "no weight pushes"
    # params are sharded over the mesh
    leaf = jax.tree.leaves(trainer.params)[0]
    assert len(leaf.sharding.device_set) == 8
    # trainer published TrainingDone
    reader = StreamReader(
        SingleStreamSpec(exp_path=str(tmp_path), topic="weight_update_request")
    )
    kinds = [m["kind"] for m in reader.read_available()]
    assert "training_done" in kinds
