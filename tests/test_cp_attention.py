"""Long-context CP: blockwise flash kernel parity and shard_map context
parallelism at L=4096 (VERDICT round-1 item #3 — the XLA path's [L, L]
scores made 32k training infeasible; reference trains 32k with
seq_parallel=8 ring attention, finetune_loop.py:507-517)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pipelinerl_tpu.ops.attention import mha_packed
from pipelinerl_tpu.ops.blockwise_attention import (
    mha_packed_blockwise,
    mha_packed_blockwise_simple,
)


def _rand_packed(rng, B, L, H, K, Dh, n_segs=5):
    q = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, K, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, K, Dh)), jnp.float32)
    seg = jnp.asarray(np.sort(rng.integers(0, n_segs, (B, L)), axis=1), jnp.int32)
    pos = jnp.zeros((B, L), jnp.int32)
    return q, k, v, seg, pos


def test_blockwise_matches_xla_fwd_and_grad():
    rng = np.random.default_rng(0)
    q, k, v, seg, pos = _rand_packed(rng, 2, 256, 4, 2, 16)
    ref = mha_packed(q, k, v, seg, pos)
    out = mha_packed_blockwise_simple(q, k, v, seg, block_kv=64)
    np.testing.assert_allclose(out, ref, atol=2e-5)

    w = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
    g_ref = jax.grad(
        lambda q, k, v: (mha_packed(q, k, v, seg, pos) * w).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    g_blk = jax.grad(
        lambda q, k, v: (mha_packed_blockwise_simple(q, k, v, seg, block_kv=64) * w).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_ref, g_blk):
        np.testing.assert_allclose(b, a, atol=2e-5)


def test_blockwise_q_offset_shards_agree():
    rng = np.random.default_rng(1)
    q, k, v, seg, pos = _rand_packed(rng, 1, 128, 4, 2, 16)
    ref = mha_packed(q, k, v, seg, pos)
    halves = [
        mha_packed_blockwise(
            q[:, o : o + 64], k, v, seg[:, o : o + 64], seg, o, None, 32
        )
        for o in (0, 64)
    ]
    np.testing.assert_allclose(jnp.concatenate(halves, axis=1), ref, atol=2e-5)


def test_blockwise_odd_length_single_block():
    # Lkv not divisible by block_kv falls back to a compatible block
    rng = np.random.default_rng(2)
    q, k, v, seg, pos = _rand_packed(rng, 1, 96, 2, 1, 8)
    ref = mha_packed(q, k, v, seg, pos)
    out = mha_packed_blockwise_simple(q, k, v, seg, block_kv=64)
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cp_attention_4k_parity():
    """Attention over a 4096-token packed row, sharded (dp=2, cp=2, tp=2):
    forward and gradients match the single-device XLA path."""
    from pipelinerl_tpu.parallel import make_mesh
    from pipelinerl_tpu.parallel.cp_attention import make_cp_attention

    rng = np.random.default_rng(3)
    B, L, H, K, Dh = 2, 4096, 4, 2, 16
    q, k, v, seg, pos = _rand_packed(rng, B, L, H, K, Dh, n_segs=7)
    w = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    ref = mha_packed(q, k, v, seg, pos)
    g_ref = jax.grad(
        lambda q, k, v: (mha_packed(q, k, v, seg, pos) * w).sum(), argnums=(0, 1, 2)
    )(q, k, v)

    mesh = make_mesh(n_devices=8, tp=2, cp=2)
    cp_attn = make_cp_attention(mesh, num_kv_heads=K, block_kv=512)
    shardings = (
        NamedSharding(mesh, P("dp", "cp", "tp", None)),
        NamedSharding(mesh, P("dp", "cp", "tp", None)),
        NamedSharding(mesh, P("dp", "cp", "tp", None)),
        NamedSharding(mesh, P("dp", "cp")),
    )
    qs, ks, vs, segs = map(jax.device_put, (q, k, v, seg), shardings)

    out = jax.jit(cp_attn)(qs, ks, vs, segs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    g_cp = jax.jit(
        jax.grad(lambda q, k, v: (cp_attn(q, k, v, segs) * w).sum(), argnums=(0, 1, 2))
    )(qs, ks, vs)
    for a, b in zip(g_ref, g_cp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cp_rl_loss_4k_parity():
    """Full rl_loss at L=4096: loss and param grads of the sharded CP path
    match the single-device XLA path (the VERDICT done-criterion)."""
    from pipelinerl_tpu.models.transformer import ModelConfig, init_params
    from pipelinerl_tpu.parallel import make_mesh, shard_batch, shard_params
    from pipelinerl_tpu.parallel.cp_attention import make_cp_attention
    from pipelinerl_tpu.train.advantages import populate_rl_data, prepare_rl_fields
    from pipelinerl_tpu.train.packing import pack_samples
    from pipelinerl_tpu.train.rl_loss import RLLossConfig, rl_loss

    EOS = 9
    rng = np.random.default_rng(4)
    model_cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), model_cfg)

    samples = []
    for r in range(4):
        n_prompt, n_out = 16, 800
        ids = rng.integers(1, 120, n_prompt + n_out).tolist()
        samples.append(
            prepare_rl_fields(
                {
                    "input_ids": ids,
                    "labels": [-100] * n_prompt + ids[n_prompt:],
                    "reward": float(r % 2),
                    "logprobs": [-0.5] * n_out,
                    "group_id": "g0",
                    "rollout_index": r,
                    "step_index": 0,
                    "finished": True,
                    "model_version": 0,
                }
            )
        )
    populate_rl_data(samples, EOS)
    batch = {
        k: jnp.asarray(v)
        for k, v in pack_samples(samples, 4096, EOS).arrays().items()
    }
    loss_cfg = RLLossConfig(policy_loss="ppo", kl_coef=0.0, batch_size=4)

    def make_loss(attn_impl):
        def fn(p, b):
            loss, _ = rl_loss(
                p, model_cfg, loss_cfg, b, 0, 10, False,
                remat=False, attn_impl=attn_impl,
            )
            return loss
        return fn

    loss_ref, g_ref = jax.value_and_grad(make_loss("xla"))(params, batch)

    # packed rows are [1, L]: dp=1, shard the 4096 tokens over cp=4
    mesh = make_mesh(n_devices=8, tp=2, cp=4)
    cp_attn = make_cp_attention(mesh, num_kv_heads=2, block_kv=512)
    params_s = shard_params(params, mesh)
    batch_s = shard_batch(batch, mesh)
    loss_cp, g_cp = jax.jit(jax.value_and_grad(make_loss(cp_attn)))(params_s, batch_s)

    np.testing.assert_allclose(float(loss_cp), float(loss_ref), rtol=2e-5, atol=2e-6)
    flat_ref = jax.tree.leaves(g_ref)
    flat_cp = jax.tree.leaves(g_cp)
    for a, b in zip(flat_ref, flat_cp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cp_attention_16k_parity():
    """Reference-scale long context (tir trains 32k rows with seq_parallel=8,
    /root/reference/pipelinerl/conf/tir.yaml): attention over a 16384-token
    packed row sharded cp=8 matches the single-device blockwise kernel
    (itself XLA-parity-proven above) in forward AND gradients. The XLA
    reference is infeasible at this L ([16k, 16k] scores); parity is
    transitive through the blockwise kernel."""
    from pipelinerl_tpu.parallel import make_mesh
    from pipelinerl_tpu.parallel.cp_attention import make_cp_attention

    rng = np.random.default_rng(5)
    B, L, H, K, Dh = 1, 16384, 4, 2, 32
    q, k, v, seg, _ = _rand_packed(rng, B, L, H, K, Dh, n_segs=9)
    w = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    ref = mha_packed_blockwise_simple(q, k, v, seg, block_kv=1024)
    g_ref = jax.grad(
        lambda q, k, v: (
            mha_packed_blockwise_simple(q, k, v, seg, block_kv=1024) * w
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)

    mesh = make_mesh(n_devices=8, cp=8)
    cp_attn = make_cp_attention(mesh, num_kv_heads=K, block_kv=1024)
    shardings = (
        NamedSharding(mesh, P("dp", "cp", None, None)),
        NamedSharding(mesh, P("dp", "cp", None, None)),
        NamedSharding(mesh, P("dp", "cp", None, None)),
        NamedSharding(mesh, P("dp", "cp")),
    )
    qs, ks, vs, segs = map(jax.device_put, (q, k, v, seg), shardings)

    out = jax.jit(cp_attn)(qs, ks, vs, segs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    g_cp = jax.jit(
        jax.grad(lambda q, k, v: (cp_attn(q, k, v, segs) * w).sum(), argnums=(0, 1, 2))
    )(qs, ks, vs)
    for a, b in zip(g_ref, g_cp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cp_rl_loss_32k_trains():
    """The flagship long-context shape: a full rl_loss gradient pass over a
    32768-token packed row with cp=8 (conf/tir.yaml; reference seq_parallel=8
    @ 32000) compiles and yields finite loss/grads. The unsharded XLA path
    cannot even materialize this (32k x 32k scores)."""
    from pipelinerl_tpu.models.transformer import ModelConfig, init_params
    from pipelinerl_tpu.parallel import make_mesh, shard_batch, shard_params
    from pipelinerl_tpu.parallel.cp_attention import make_cp_attention
    from pipelinerl_tpu.train.advantages import populate_rl_data, prepare_rl_fields
    from pipelinerl_tpu.train.packing import pack_samples
    from pipelinerl_tpu.train.rl_loss import RLLossConfig, rl_loss

    EOS = 9
    rng = np.random.default_rng(6)
    model_cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), model_cfg)

    samples = []
    for r in range(4):
        n_prompt, n_out = 64, 8000
        ids = rng.integers(1, 120, n_prompt + n_out).tolist()
        samples.append(
            prepare_rl_fields(
                {
                    "input_ids": ids,
                    "labels": [-100] * n_prompt + ids[n_prompt:],
                    "reward": float(r % 2),
                    "logprobs": [-0.5] * n_out,
                    "group_id": "g0",
                    "rollout_index": r,
                    "step_index": 0,
                    "finished": True,
                    "model_version": 0,
                }
            )
        )
    populate_rl_data(samples, EOS)
    batch = {
        k: jnp.asarray(v)
        for k, v in pack_samples(samples, 32768, EOS).arrays().items()
    }
    assert batch["input_ids"].shape[1] == 32768

    mesh = make_mesh(n_devices=8, cp=8)
    cp_attn = make_cp_attention(mesh, num_kv_heads=2, block_kv=1024)
    loss_cfg = RLLossConfig(policy_loss="gspo", kl_coef=0.0, batch_size=4)

    def fn(p, b):
        loss, metrics = rl_loss(
            p, model_cfg, loss_cfg, b, 0, 10, False, remat=True,
            attn_impl=cp_attn,
        )
        return loss

    params_s = shard_params(params, mesh)
    batch_s = shard_batch(batch, mesh)
    loss, grads = jax.jit(jax.value_and_grad(fn))(params_s, batch_s)
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_cp_gqa_impl_parity():
    """make_cp_attention(impl="gqa") — the Pallas kernel inside shard_map
    (interpret mode) must match the unsharded XLA reference, grads
    included, with the traced axis_index q_offset."""
    import pipelinerl_tpu.ops.gqa_attention as gqa
    from pipelinerl_tpu.ops.attention import mha_packed
    from pipelinerl_tpu.parallel import make_mesh
    from pipelinerl_tpu.parallel.cp_attention import make_cp_attention

    gqa.INTERPRET = True
    try:
        mesh = make_mesh(n_devices=8, cp=4, tp=2)
        B, L, H, K, Dh = 1, 512, 4, 2, 64
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, L, K, Dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, L, K, Dh)), jnp.float32)
        seg = jnp.asarray((np.arange(L) // (L // 4)).astype(np.int32))[None]
        pos = jnp.asarray((np.arange(L) % (L // 4)).astype(np.int32))[None]
        attn = make_cp_attention(mesh, num_kv_heads=K, impl="gqa")
        out = attn(q, k, v, seg)
        ref = mha_packed(q, k, v, seg, pos)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3
        )
        g1 = jax.grad(lambda q, k, v: jnp.sum(attn(q, k, v, seg) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda q, k, v: jnp.sum(mha_packed(q, k, v, seg, pos) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3
            )
    finally:
        gqa.INTERPRET = False
