"""Actor-critic value head: advantages from V(s), value loss, gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.models.transformer import (
    ModelConfig,
    init_params,
    init_value_head,
)
from pipelinerl_tpu.train.rl_loss import RLLossConfig, rl_loss
from tests.test_rl_loss import make_packed_batch


@pytest.fixture(scope="module")
def ac_model():
    cfg = ModelConfig(
        vocab_size=16, hidden_size=16, intermediate_size=32, num_layers=1,
        num_heads=2, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), cfg)
    params["value_head"] = init_value_head(jax.random.key(1), cfg)
    return params, cfg


def test_value_head_loss_and_metrics(ac_model):
    params, model_cfg = ac_model
    batch = make_packed_batch(seq_length=16, rewards=(1.0, 0.0))
    cfg = RLLossConfig(policy_loss="ppo", batch_size=2, value_loss_coef=0.5)
    loss, metrics = rl_loss(
        params, model_cfg, cfg, batch, jnp.zeros(()), 10, jnp.asarray(0.0), remat=False
    )
    assert np.isfinite(float(loss))
    assert "value_loss" in metrics and "value_mean" in metrics
    assert float(metrics["value_loss"]) > 0


def test_value_head_gets_gradient(ac_model):
    params, model_cfg = ac_model
    batch = make_packed_batch(seq_length=16, rewards=(1.0, 0.0))
    cfg = RLLossConfig(policy_loss="ppo", batch_size=2, value_loss_coef=0.5)

    def loss_fn(p):
        loss, _ = rl_loss(
            p, model_cfg, cfg, batch, jnp.zeros(()), 10, jnp.asarray(0.0), remat=False
        )
        return loss

    grads = jax.grad(loss_fn)(params)
    g = float(jnp.abs(grads["value_head"]["w"]).sum())
    assert g > 0, "value head received no gradient"


def test_value_loss_coef_zero_trains_without_value_grad(ac_model):
    params, model_cfg = ac_model
    batch = make_packed_batch(seq_length=16, rewards=(1.0, 0.0))
    cfg = RLLossConfig(policy_loss="ppo", batch_size=2, value_loss_coef=0.0)

    def loss_fn(p):
        loss, _ = rl_loss(
            p, model_cfg, cfg, batch, jnp.zeros(()), 10, jnp.asarray(0.0), remat=False
        )
        return loss

    grads = jax.grad(loss_fn)(params)
    # advantages detached in the policy term and coef 0 → value head untouched
    g = float(jnp.abs(grads["value_head"]["w"]).sum())
    assert g == pytest.approx(0.0, abs=1e-9)
