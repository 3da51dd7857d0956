"""GQA-folded Pallas training attention vs the XLA reference (interpret
mode on CPU): forward parity, gradient parity, segment masking, q_offset
(context-parallel shard placement), and ragged final blocks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pipelinerl_tpu.ops.gqa_attention as gqa
from pipelinerl_tpu.ops.attention import mha_packed
from pipelinerl_tpu.ops.blockwise_attention import mha_packed_blockwise


@pytest.fixture(autouse=True)
def _interpret():
    gqa.INTERPRET = True
    yield
    gqa.INTERPRET = False


def make_inputs(rng, L=256, H=4, K=2, Dh=64, n_segs=3, B=1):
    q = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, K, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, K, Dh)), jnp.float32)
    seg = np.zeros((B, L), np.int32)
    pos = np.zeros((B, L), np.int32)
    for b in range(B):
        bounds = sorted(rng.choice(np.arange(1, L), size=n_segs - 1, replace=False))
        prev = 0
        for i, e in enumerate(list(bounds) + [L]):
            seg[b, prev:e] = i
            pos[b, prev:e] = np.arange(e - prev)
            prev = e
    return q, k, v, jnp.asarray(seg), jnp.asarray(pos)


def test_forward_matches_xla():
    rng = np.random.default_rng(0)
    q, k, v, seg, pos = make_inputs(rng, L=256)
    ref = mha_packed(q, k, v, seg, pos)
    out = gqa.mha_packed_gqa(q, k, v, seg, seg, 0, block_q=64, block_kv=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_forward_matches_xla_gqa7():
    """The production head geometry: G=7 q heads per kv head, Dh=64."""
    rng = np.random.default_rng(1)
    q, k, v, seg, pos = make_inputs(rng, L=256, H=14, K=2)
    ref = mha_packed(q, k, v, seg, pos)
    out = gqa.mha_packed_gqa(q, k, v, seg, seg, 0, block_q=64, block_kv=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_forward_batch2():
    rng = np.random.default_rng(2)
    q, k, v, seg, pos = make_inputs(rng, L=128, B=2, n_segs=2)
    ref = mha_packed(q, k, v, seg, pos)
    out = gqa.mha_packed_gqa(q, k, v, seg, seg, 0, block_q=64, block_kv=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_grads_match_xla():
    rng = np.random.default_rng(3)
    q, k, v, seg, pos = make_inputs(rng, L=128, H=6, K=2, n_segs=2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_packed(q, k, v, seg, pos) ** 2)

    def loss_gqa(q, k, v):
        return jnp.sum(
            gqa.mha_packed_gqa(q, k, v, seg, seg, 0, block_q=64, block_kv=128) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_new = jax.grad(loss_gqa, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("q k v".split(), g_new, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3,
            err_msg=f"d{name} mismatch",
        )


def test_q_offset_matches_full():
    """A cp-style query shard with q_offset must reproduce the matching rows
    of the full computation (flat-index causality against the full KV)."""
    rng = np.random.default_rng(4)
    q, k, v, seg, pos = make_inputs(rng, L=256, n_segs=2)
    full = gqa.mha_packed_gqa(q, k, v, seg, seg, 0, block_q=64, block_kv=128)
    lo, hi = 128, 256
    shard = gqa.mha_packed_gqa(
        q[:, lo:hi], k, v, seg[:, lo:hi], seg, lo, block_q=64, block_kv=128
    )
    np.testing.assert_allclose(
        np.asarray(shard), np.asarray(full[:, lo:hi]), atol=2e-3, rtol=2e-3
    )


def test_matches_blockwise_bf16():
    """bf16 inputs: both kernels accumulate fp32; outputs agree to bf16."""
    rng = np.random.default_rng(5)
    q, k, v, seg, pos = make_inputs(rng, L=256, H=14, K=2)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = mha_packed_blockwise(q, k, v, seg, seg, 0)
    out = gqa.mha_packed_gqa(q, k, v, seg, seg, 0, block_q=64, block_kv=128)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_odd_block_divisor_fallback():
    """Lengths where the block sizes cannot divide cleanly fall back to the
    pure-JAX blockwise path (same semantics)."""
    rng = np.random.default_rng(6)
    q, k, v, seg, pos = make_inputs(rng, L=96, n_segs=2)
    ref = mha_packed(q, k, v, seg, pos)
    out = gqa.mha_packed_gqa(q, k, v, seg, seg, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)
