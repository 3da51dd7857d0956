"""The sharded train step: loss + gradient + optimizer update as ONE jitted
program over the (dp, cp, tp) mesh.

The reference splits this across DeepSpeed engine hooks, accelerate
wrappers, and ring-flash-attn monkey-patches (finetune_loop.py:306-428,
507-517); under GSPMD it is a single pjit program — batch rows sharded over
dp, the packed sequence dim over cp (attention masking is segment-id based,
so CP needs no ring rewrite: XLA inserts the collectives), params/optimizer
state sharded FSDP×TP.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models.transformer import ModelConfig
from ..train.rl_loss import RLLossConfig, rl_loss


def make_sharded_train_step(
    model_cfg: ModelConfig,
    loss_cfg: RLLossConfig,
    optimizer: optax.GradientTransformation,
    max_step: int,
    remat: bool = True,
) -> Callable:
    """→ step(params, opt_state, batch, step, sentinel) →
    (params, opt_state, loss, metrics). Shardings flow in from the argument
    placements (shard_params / shard_batch); XLA propagates them through the
    whole program."""

    def step_fn(params, opt_state, batch, step, sentinel):
        def loss_fn(p):
            return rl_loss(
                p, model_cfg, loss_cfg, batch, step, max_step, sentinel, remat=remat
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt_state, loss, metrics

    return jax.jit(step_fn, donate_argnums=(0, 1))
