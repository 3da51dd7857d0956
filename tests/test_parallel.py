"""Sharded train step over the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.models.transformer import ModelConfig, init_params
from pipelinerl_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    param_partition_specs,
    shard_batch,
    shard_params,
)
from pipelinerl_tpu.train.rl_loss import RLLossConfig
import optax


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_devices=8, tp=2, cp=2)


def _tiny_batch(dp, L, rng):
    from pipelinerl_tpu.train.packing import pack_samples

    rows = []
    for _ in range(dp):
        n_prompt, n_out = 2, 6
        ids = rng.integers(1, 120, n_prompt + n_out).tolist()
        sample = {
            "input_ids": ids,
            "labels": [-100] * n_prompt + ids[n_prompt:],
            "rewards": [1.0] * len(ids),
            "advantages": [0.5] * len(ids),
            "ref_logprobs": [0.0] * len(ids),
            "old_logprobs": [0.0] * n_prompt + [-1.0] * n_out,
            "group_tokens": [float(len(ids))] * len(ids),
            "num_labels": [float(n_out)] * len(ids),
            "overflow": [0.0] * len(ids),
            "model_version": 0,
        }
        rows.append(pack_samples([sample], L, eos_token_id=0))
    return {
        name: np.concatenate([getattr(r, name) for r in rows], axis=0)
        for name in rows[0].arrays()
    }


@pytest.mark.parametrize("policy", ["reinforce", "gspo"])
def test_sharded_step_matches_single_device(mesh8, policy):
    """The dp2×cp2×tp2 sharded step must produce the same loss as the
    unsharded computation."""
    model_cfg = ModelConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), model_cfg)
    optimizer = optax.adamw(1e-3)
    loss_cfg = RLLossConfig(policy_loss=policy, batch_size=2, max_segments=4)
    step_fn = make_sharded_train_step(
        model_cfg, loss_cfg, optimizer, max_step=10, remat=False
    )
    batch = _tiny_batch(dp=2, L=32, rng=np.random.default_rng(0))

    # unsharded ground truth
    from pipelinerl_tpu.train.rl_loss import rl_loss

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    expected, _ = rl_loss(
        params, model_cfg, loss_cfg, jbatch, jnp.zeros(()), 10, jnp.asarray(0.0),
        remat=False,
    )

    # device_put may alias the source buffers on CPU, and step_fn donates its
    # inputs — snapshot to numpy before sharding for the post-step comparison
    params_before = jax.tree.map(np.asarray, params)
    sharded_params = shard_params(params, mesh8)
    opt_state = jax.jit(optimizer.init)(sharded_params)
    with mesh8:
        sbatch = shard_batch(batch, mesh8)
        new_params, _, loss, metrics = step_fn(
            sharded_params, opt_state, sbatch, jnp.zeros(()), jnp.asarray(0.0)
        )
    assert float(loss) == pytest.approx(float(expected), rel=2e-4)
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually changed
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).sum()), new_params, params_before
        ),
    )
    assert delta > 0


def test_param_specs_cover_all_leaves():
    model_cfg = ModelConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32, num_layers=1,
        num_heads=2, num_kv_heads=1, attention_bias=True, qk_norm=True,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), model_cfg)
    specs = param_partition_specs(params)
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: hasattr(x, "index") or x is None)
    assert len(flat_p) == len(flat_s)
