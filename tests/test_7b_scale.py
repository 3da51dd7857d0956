"""7B-scale reality checks without 7B hardware (VERDICT round-2 missing #8).

The BASELINE target is a 7B GRPO run on v5e-16. Nothing here executes a 7B
gradient step (CI has 2 CPU cores); instead we prove the two things that
make the target real:

- the FSDP sharding plan puts < 12 GB of live training state on each of 8
  devices (params + adamw moments + grads, exact byte math from the actual
  rule table the trainer shards with, parallel/sharding.py);
- the trainer's grad-pass program at the exact 7B shape LOWERS against an
  8-device mesh with those shardings (jax.eval_shape + jit.lower — catches
  shape/sharding bugs without paying execution).

The engine-side 7B smoke (weights on the real chip, decode tok/s @ bs8)
lives in bench.py::bench_7b_smoke and is recorded in BENCH_r03.json.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pipelinerl_tpu.models.transformer import ModelConfig, init_params
from pipelinerl_tpu.parallel.sharding import batch_sharding, param_partition_specs


def _cfg7b():
    return ModelConfig(
        vocab_size=152_064,
        hidden_size=3584,
        intermediate_size=18944,
        num_layers=28,
        num_heads=28,
        num_kv_heads=4,
        head_dim=128,
        rope_theta=1_000_000.0,
        attention_bias=True,
        dtype=jnp.bfloat16,
    )


def _shape_tree(cfg):
    return jax.eval_shape(lambda k: init_params(k, cfg), jax.random.key(0))


def _flatten(shapes, specs):
    flat_shapes = jax.tree.leaves(shapes)
    flat_specs = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat_shapes) == len(flat_specs)
    return list(zip(flat_shapes, flat_specs))


def test_7b_fsdp_state_fits_v5e16():
    """Exact byte accounting of the sharded training state on a dp=8 FSDP
    mesh: bf16 params + fp32 adamw m/v + bf16 grads, each sharded by the
    trainer's actual rule table. Must leave activation headroom under the
    16 GB v5e HBM (remat keeps activations at O(L·D) per layer)."""
    axis = {"dp": 8, "tp": 1, "pp": 1}
    cfg = _cfg7b()
    pairs = _flatten(_shape_tree(cfg), param_partition_specs(_shape_tree(cfg)))

    def sharded_bytes(shape_dtype, spec):
        n = int(np.prod(shape_dtype.shape)) or 1
        divide = 1
        for name in spec:
            if name is not None:
                divide *= axis[name]
        return n * shape_dtype.dtype.itemsize / divide

    param_b = sum(sharded_bytes(s, sp) for s, sp in pairs)
    dense_b = sum(int(np.prod(s.shape)) * s.dtype.itemsize for s, _ in pairs)
    n_params = sum(int(np.prod(s.shape)) for s, _ in pairs)
    assert n_params > 7.0e9, f"model is {n_params / 1e9:.2f}B — not 7B-shaped"
    # the rule table must actually shard the big matrices
    assert param_b / dense_b < 0.2, (
        f"only {dense_b / param_b:.1f}x reduction from FSDP sharding"
    )
    # params (bf16) + grads (bf16) + adamw m and v (fp32 → 2x bf16 bytes)
    total = param_b * (1 + 1 + 2 * 2)
    assert total < 12e9, (
        f"7B FSDP training state {total / 1e9:.1f} GB/chip leaves no "
        "activation headroom on 16 GB v5e"
    )


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_7b_grad_pass_lowers_on_fsdp_mesh():
    """The trainer's rl_loss grad program at the exact 7B shape lowers
    against a dp=8 mesh with the production shardings — proves the program
    builds (dims, layouts, GSPMD annotations) without executing it."""
    from pipelinerl_tpu.parallel import make_mesh
    from pipelinerl_tpu.train.rl_loss import RLLossConfig, rl_loss

    cfg = _cfg7b()
    mesh = make_mesh(n_devices=8)
    shapes = _shape_tree(cfg)
    specs = param_partition_specs(shapes)
    param_shardings = jax.tree.map(
        lambda sp: NamedSharding(mesh, sp), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    L = 4096
    loss_cfg = RLLossConfig(policy_loss="gspo", batch_size=8, max_segments=64)
    batch_shapes = {
        "input_ids": jax.ShapeDtypeStruct((8, L), jnp.int32),
        "labels": jax.ShapeDtypeStruct((8, L), jnp.int32),
        "position_ids": jax.ShapeDtypeStruct((8, L), jnp.int32),
        "segment_ids": jax.ShapeDtypeStruct((8, L), jnp.int32),
        **{
            name: jax.ShapeDtypeStruct((8, L), jnp.float32)
            for name in (
                "rewards", "advantages", "ref_logprobs", "old_logprobs",
                "group_tokens", "num_labels", "overflow",
            )
        },
    }
    batch_shardings = {
        k: v for k, v in batch_sharding(mesh).items() if k in batch_shapes
    }

    def grad_pass(params, batch):
        def loss_fn(p):
            return rl_loss(
                p, cfg, loss_cfg, batch, jnp.zeros(()), 100, jnp.zeros(()),
                remat=True, attn_impl="blockwise",
            )

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads

    lowered = jax.jit(
        grad_pass,
        in_shardings=(param_shardings, batch_shardings),
    ).lower(shapes, batch_shapes)
    text = lowered.as_text()
    assert "sharding" in text
