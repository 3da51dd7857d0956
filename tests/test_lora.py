"""LoRA: no-op init, adapter-only training, merged pushes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.config import compose
from pipelinerl_tpu.models.transformer import ModelConfig, forward, init_params
from pipelinerl_tpu.train.lora import (
    LoRAConfig,
    init_lora_params,
    lora_config_from,
    merge_lora,
)


@pytest.fixture(scope="module")
def base():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), cfg)
    return params, cfg


def test_lora_init_is_identity(base):
    params, model_cfg = base
    lcfg = LoRAConfig(enabled=True, r=4, alpha=8, target_modules=("wq", "wv"))
    lora = init_lora_params(jax.random.key(1), params, lcfg)
    merged = merge_lora(params, lora, lcfg)
    ids = jnp.arange(1, 9)[None, :]
    pos = jnp.arange(8)[None, :]
    seg = jnp.zeros((1, 8), jnp.int32)
    a = np.asarray(forward(params, model_cfg, ids, pos, seg))
    b = np.asarray(forward(merged, model_cfg, ids, pos, seg))
    np.testing.assert_allclose(a, b, atol=1e-6)  # B=0 → exact no-op


def test_lora_merge_changes_targets_only(base):
    params, _ = base
    lcfg = LoRAConfig(enabled=True, r=4, alpha=8, target_modules=("wq",))
    lora = init_lora_params(jax.random.key(2), params, lcfg)
    lora["layers"]["wq_B"] = jnp.ones_like(lora["layers"]["wq_B"])
    merged = merge_lora(params, lora, lcfg)
    assert not np.allclose(np.asarray(merged["layers"]["wq"]), np.asarray(params["layers"]["wq"]))
    np.testing.assert_array_equal(
        np.asarray(merged["layers"]["wk"]), np.asarray(params["layers"]["wk"])
    )


def test_lora_config_validation():
    from pipelinerl_tpu.config import Config

    assert not lora_config_from(Config({})).enabled
    cfg = Config({"lora": {"enabled": True, "r": 8, "alpha": 16, "target_modules": ["wq"]}})
    lcfg = lora_config_from(cfg)
    assert lcfg.enabled and lcfg.scaling == 2.0
    with pytest.raises(ValueError):
        lora_config_from(Config({"lora": {"enabled": True, "target_modules": ["nope"]}}))


def test_trainer_trains_only_adapters(base, tmp_path):
    from pipelinerl_tpu.streams import SingleStreamSpec, StreamWriter
    from pipelinerl_tpu.train.trainer import TrainerLoop
    from tests.test_trainer_mesh import make_batch_msgs

    params, model_cfg = base
    frozen_before = jax.tree.map(np.asarray, params)
    cfg = compose(
        "conf",
        "base",
        overrides=[
            f"output_dir={tmp_path}",
            "finetune.samples_per_step=4",
            "finetune.max_train_steps=1",
            "finetune.seq_length=64",
            "finetune.learning_rate=1e-2",
            "finetune.num_warmup_steps=0",
            "finetune.gradient_checkpointing=false",
            "finetune.save_checkpoint_steps=0",
            "+finetune.lora.enabled=true",
            "+finetune.lora.r=4",
            "+finetune.lora.alpha=8",
            '+finetune.lora.target_modules=["wq","wv"]',
        ],
    )
    pushed = []
    trainer = TrainerLoop(
        cfg, params, model_cfg, str(tmp_path),
        weight_update_cb=lambda p, v: pushed.append((p, v)),
    )
    assert "wq_A" in trainer.params["layers"]

    writer = StreamWriter(
        SingleStreamSpec(exp_path=str(tmp_path), topic="training_data", partition=0)
    )
    for msg in make_batch_msgs(2, rng=np.random.default_rng(1), vocab=60):
        writer.write(msg)
    writer.close()
    metrics = trainer.run(max_steps=1)
    assert metrics.completed_steps == 1

    # adapters moved…
    b_norm = float(jnp.abs(trainer.params["layers"]["wq_B"]).sum())
    assert b_norm > 0
    # …the frozen base did not…
    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), b), trainer.frozen_params, frozen_before
    )
    assert all(jax.tree.leaves(same))
    # …and pushes carry MERGED full weights (base structure, not adapters)
    merged, _ = pushed[-1]
    assert "wq" in merged["layers"] and "wq_A" not in merged["layers"]
