"""Trainable vision tower (finetune.train_vision_tower): gradients flow into
the tower, the optimizer moves it, weight pushes carry it, the engine applies
it in-flight, and the HF export round-trips it — the reference trains the
full Qwen2.5-VL end-to-end through DeepSpeed (launch.py:63-69), closing the
frozen-tower gap noted in round 1 STATUS."""

import numpy as np
import pytest
from pipelinerl_tpu.config import compose

import jax
import jax.numpy as jnp

from pipelinerl_tpu.models.transformer import ModelConfig, init_params
from pipelinerl_tpu.models.vision import VisionConfig, init_vision_params
from pipelinerl_tpu.train.packing import pack_visual_sample
from pipelinerl_tpu.train.advantages import prepare_rl_fields
from pipelinerl_tpu.types import MASKED_TOKEN_ID

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
IMG = 60
EOS = 59


def _toy():
    model_cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        dtype=jnp.float32,
        mrope_section=(2, 1, 1),
        image_token_id=IMG,
    )
    vcfg = VisionConfig(
        hidden_size=16,
        intermediate_size=32,
        num_heads=2,
        depth=2,
        out_hidden_size=32,
        patch_size=2,
        temporal_patch_size=1,
        spatial_merge_size=2,
        window_size=8,
        fullatt_block_indexes=(1,),
        dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), model_cfg)
    vparams = init_vision_params(jax.random.key(1), vcfg)
    return params, model_cfg, vparams, vcfg


def _visual_batch(vcfg, seq_length=48, seed=3):
    rng = np.random.default_rng(seed)
    grid = (1, 4, 4)  # 16 patches → 4 merged tokens
    n_merged = 4
    pixels = rng.normal(size=(16, vcfg.patch_dim)).astype(np.float32)
    prompt = [1, 2] + [IMG] * n_merged + [3]
    out = [5, 6, 7, EOS]
    ids = prompt + out
    labels = [MASKED_TOKEN_ID] * len(prompt) + out
    sample = prepare_rl_fields(
        {
            "input_ids": ids,
            "labels": labels,
            "reward": 1.0,
            "logprobs": [-0.5] * len(out),
            "group_id": "g",
            "rollout_index": 0,
            "step_index": 0,
            "finished": True,
            "model_version": 0,
            "visual_features": {
                "pixel_values": pixels,
                "image_grid_thw": np.asarray([grid], np.int64),
            },
        }
    )
    # prepare_rl_fields zeroes advantages (they normally come from the
    # group-level LOO computation); a single-sample test sets them directly
    sample["advantages"] = [1.0] * len(ids)
    return pack_visual_sample(sample, seq_length, EOS, IMG, vcfg.spatial_merge_size)


def _trainer(tmp_path, params, model_cfg, vparams, vcfg, train_tower=True):
    from pipelinerl_tpu.train.trainer import TrainerLoop

    cfg = compose(
        REPO / "conf",
        "base",
        overrides=[
            f"output_dir={tmp_path}",
            "finetune.samples_per_step=1",
            "finetune.max_train_steps=2",
            "finetune.seq_length=48",
            "finetune.learning_rate=1e-2",
            "finetune.num_warmup_steps=0",
            "finetune.gradient_checkpointing=false",
            "finetune.save_checkpoint_steps=0",
            f"+finetune.train_vision_tower={str(train_tower).lower()}",
        ],
    )
    pushed = []
    trainer = TrainerLoop(
        cfg,
        params,
        model_cfg,
        str(tmp_path),
        weight_update_cb=lambda p, v: pushed.append((p, v)),
        vision_params=vparams,
        vision_cfg=vcfg,
    )
    return trainer, pushed


def test_tower_trains_and_pushes(tmp_path):
    params, model_cfg, vparams, vcfg = _toy()
    tower_before = jax.tree.map(np.asarray, vparams)
    trainer, pushed = _trainer(tmp_path, params, model_cfg, vparams, vcfg)
    assert trainer.train_vision and "vision_tower" in trainer.params

    batch = _visual_batch(vcfg)
    metrics = trainer.train_pass(batch)
    assert np.isfinite(metrics["loss"])
    grads = trainer._grad_accum
    gnorm = float(
        sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["vision_tower"]))
    )
    assert gnorm > 0, "no gradient reached the vision tower"

    trainer.optimizer_step()
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        trainer.params["vision_tower"],
        tower_before,
    )
    assert max(jax.tree.leaves(moved)) > 0, "optimizer did not move the tower"

    # weight push carries the tower; the engine applies it in-flight
    from pipelinerl_tpu.streams import SingleStreamSpec, StreamWriter

    writer = StreamWriter(
        SingleStreamSpec(exp_path=str(tmp_path), topic="weight_update_request")
    )
    trainer.maybe_push_weights(writer, force=True)
    writer.close()
    assert pushed and "vision_tower" in pushed[0][0]

    from pipelinerl_tpu.inference import EngineConfig, InferenceEngine

    engine = InferenceEngine(
        {k: v for k, v in params.items() if k != "vision_tower"},
        model_cfg,
        EngineConfig(max_slots=2, max_len=64, prefill_buckets=(32,), cache_dtype=jnp.float32),
        eos_token_id=EOS,
        vision_params=vparams,
        vision_cfg=vcfg,
    )
    old_tower_leaf = np.asarray(jax.tree.leaves(engine.vision_params)[0])
    engine.update_params(pushed[0][0], version=7)
    engine.step()
    assert engine.version == 7
    assert "vision_tower" not in engine.params
    new_tower_leaf = np.asarray(jax.tree.leaves(engine.vision_params)[0])
    assert np.abs(new_tower_leaf - old_tower_leaf).max() > 0


def test_frozen_tower_gets_no_grads(tmp_path):
    params, model_cfg, vparams, vcfg = _toy()
    trainer, _ = _trainer(tmp_path, params, model_cfg, vparams, vcfg, train_tower=False)
    assert not trainer.train_vision
    batch = _visual_batch(vcfg)
    metrics = trainer.train_pass(batch)
    assert np.isfinite(metrics["loss"])
    assert "vision_tower" not in trainer._grad_accum


def test_hf_export_roundtrips_trained_tower(tmp_path):
    from pipelinerl_tpu.models.hf_loader import load_hf_vision
    from pipelinerl_tpu.train.checkpoints import export_hf

    params, model_cfg, vparams, vcfg = _toy()
    tree = dict(params)
    tree["vision_tower"] = vparams
    out = export_hf(tmp_path, tree, model_cfg, vision_cfg=vcfg)
    re_vparams, re_vcfg = load_hf_vision(out, dtype=jnp.float32)
    assert re_vcfg.depth == vcfg.depth and re_vcfg.window_size == vcfg.window_size
    flat_a = jax.tree.leaves(vparams)
    flat_b = jax.tree.leaves(re_vparams)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_tower_rejects_lora_and_mesh(tmp_path):
    params, model_cfg, vparams, vcfg = _toy()
    from pipelinerl_tpu.train.trainer import TrainerLoop

    cfg = compose(
        REPO / "conf",
        "base",
        overrides=[
            f"output_dir={tmp_path}",
            "finetune.samples_per_step=1",
            "+finetune.train_vision_tower=true",
            "+finetune.lora.enabled=true",
            "+finetune.lora.r=2",
        ],
    )
    with pytest.raises(ValueError, match="LoRA"):
        TrainerLoop(
            cfg, params, model_cfg, str(tmp_path),
            vision_params=vparams, vision_cfg=vcfg,
        )
