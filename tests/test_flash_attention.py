"""Flash (splash Pallas) attention vs the XLA reference, interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.ops.attention import mha_packed
from pipelinerl_tpu.ops.flash_attention import mha_packed_flash


def make_inputs(rng, L=256, H=4, K=2, Dh=64, n_segs=3):
    q = jnp.asarray(rng.normal(size=(1, L, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, L, K, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, L, K, Dh)), jnp.float32)
    bounds = sorted(rng.choice(np.arange(1, L), size=n_segs - 1, replace=False))
    seg = np.zeros(L, np.int32)
    pos = np.zeros(L, np.int32)
    prev = 0
    for i, b in enumerate(list(bounds) + [L]):
        seg[prev:b] = i
        pos[prev:b] = np.arange(b - prev)
        prev = b
    return q, k, v, jnp.asarray(seg)[None], jnp.asarray(pos)[None]


def test_flash_matches_xla_packed():
    rng = np.random.default_rng(0)
    q, k, v, seg, pos = make_inputs(rng)
    ref = mha_packed(q, k, v, seg, pos)
    out = mha_packed_flash(q, k, v, seg, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_flash_grads_match_xla():
    rng = np.random.default_rng(1)
    q, k, v, seg, pos = make_inputs(rng, L=128, n_segs=2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_packed(q, k, v, seg, pos) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(mha_packed_flash(q, k, v, seg, pos, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3)


def test_flash_forward_in_model():
    from pipelinerl_tpu.models.transformer import ModelConfig, forward, init_params

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), cfg)
    L = 128
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 64, (1, L)), jnp.int32)
    pos = jnp.arange(L)[None]
    seg = jnp.zeros((1, L), jnp.int32)

    ref = forward(params, cfg, ids, pos, seg, attn_impl="xla")
    # interpret-mode flash inside the full model
    import pipelinerl_tpu.ops.flash_attention as fa

    orig = fa.mha_packed_flash
    fa.mha_packed_flash = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        out = forward(params, cfg, ids, pos, seg, attn_impl="flash")
    finally:
        fa.mha_packed_flash = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3)


def test_kernel_cache_reused_across_traces():
    """Regression: the cached splash kernel must survive reuse in a DIFFERENT
    trace (fwd jit then grad jit at the same shape) without tracer leaks."""
    rng = np.random.default_rng(3)
    q, k, v, seg, pos = make_inputs(rng, L=128, n_segs=2)

    fwd = jax.jit(lambda q, k, v: mha_packed_flash(q, k, v, seg, pos, interpret=True))
    _ = fwd(q, k, v)

    grad = jax.jit(
        jax.grad(lambda q: jnp.sum(mha_packed_flash(q, k, v, seg, pos, interpret=True) ** 2))
    )
    g = grad(q)
    assert np.isfinite(np.asarray(g)).all()
