"""Pallas ragged decode-attention kernel vs the XLA staged reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.ops.attention import decode_attention_staged
from pipelinerl_tpu.ops.decode_attention import decode_attention_staged_ragged


def _mk(seed, S, T, K, G, Dh, W):
    rng = np.random.default_rng(seed)
    H = K * G
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    return dict(
        q=mk(S, H, Dh),
        k_new=mk(S, K, Dh),
        v_new=mk(S, K, Dh),
        k_cache=mk(S, T, K, Dh),
        v_cache=mk(S, T, K, Dh),
        k_staged=mk(W, S, K, Dh),
        v_staged=mk(W, S, K, Dh),
    )


@pytest.mark.parametrize("step", [0, 3])
@pytest.mark.parametrize(
    "lens", [[0, 1, 5, 17], [17, 17, 17, 17], [0, 0, 0, 0]]
)
def test_ragged_matches_xla_reference(step, lens):
    S, T, K, G, Dh, W = 4, 17, 2, 3, 8, 4
    a = _mk(0, S, T, K, G, Dh, W)
    base_lens = jnp.asarray(lens, jnp.int32)
    out_ref = decode_attention_staged(
        a["q"], a["k_new"], a["v_new"], a["k_cache"], a["v_cache"],
        base_lens, a["k_staged"], a["v_staged"], jnp.asarray(step),
    )
    out_pl = decode_attention_staged_ragged(
        a["q"], a["k_new"], a["v_new"], a["k_cache"], a["v_cache"],
        base_lens, a["k_staged"], a["v_staged"], jnp.asarray(step),
    )
    # kernel computes QK/PV on bf16 operands (f32 accumulate)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), rtol=0.05, atol=0.05
    )


def test_ragged_multi_block_lengths():
    # T spanning several 128-blocks with very different slot lengths
    S, T, K, G, Dh, W = 3, 300, 2, 2, 16, 8
    a = _mk(1, S, T, K, G, Dh, W)
    base_lens = jnp.asarray([1, 130, 299], jnp.int32)
    step = jnp.asarray(5)
    out_ref = decode_attention_staged(
        a["q"], a["k_new"], a["v_new"], a["k_cache"], a["v_cache"],
        base_lens, a["k_staged"], a["v_staged"], step,
    )
    out_pl = decode_attention_staged_ragged(
        a["q"], a["k_new"], a["v_new"], a["k_cache"], a["v_cache"],
        base_lens, a["k_staged"], a["v_staged"], step,
    )
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), rtol=0.05, atol=0.05
    )


def test_ragged_under_jit_and_scan():
    """The engine invokes the kernel inside scan-over-layers inside jit."""
    S, T, K, G, Dh, W = 2, 40, 2, 2, 8, 4
    L = 3
    rng = np.random.default_rng(2)
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    q = mk(S, K * G, Dh)
    kc, vc = mk(L, S, T, K, Dh), mk(L, S, T, K, Dh)
    ks, vs = mk(L, W, S, K, Dh), mk(L, W, S, K, Dh)
    kn, vn = mk(L, S, K, Dh), mk(L, S, K, Dh)
    lens = jnp.asarray([7, 33], jnp.int32)

    def scan_fn(q, kc, vc, ks, vs, kn, vn):
        def body(h, inputs):
            kcl, vcl, ksl, vsl, knl, vnl = inputs
            o = decode_attention_staged_ragged(
                h, knl, vnl, kcl, vcl, lens, ksl, vsl, jnp.asarray(2)
            )
            return o, o

        return jax.lax.scan(body, q, (kc, vc, ks, vs, kn, vn))[1]

    outs = jax.jit(scan_fn)(q, kc, vc, ks, vs, kn, vn)
    for l in range(L):
        ref = decode_attention_staged(
            q if l == 0 else np.asarray(outs[l - 1]),
            kn[l], vn[l], kc[l], vc[l], lens, ks[l], vs[l], jnp.asarray(2),
        )
        np.testing.assert_allclose(
            np.asarray(outs[l]), np.asarray(ref), rtol=0.05, atol=0.05
        )
