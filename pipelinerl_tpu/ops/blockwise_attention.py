"""Blockwise (flash-style) packed attention with a custom VJP — pure JAX.

O(Lq x block_kv) live memory instead of the [L, L] score materialization of
``ops.attention.mha_packed``, differentiable, and — unlike the Pallas splash
kernel (``ops/flash_attention.py``) — composable with ``shard_map``, which
makes it the building block for context-parallel long-context training
(reference: ring-flash-attn monkey-patching over NCCL subgroups,
/root/reference/pipelinerl/finetune_loop.py:507-517, rl/utils.py:106-208).

Semantics match ``mha_packed``: causality by FLAT GLOBAL token index within
the packed row, and-ed with same-segment membership. ``q_offset`` places a
local query shard at its global index so a cp-sharded call masks exactly
like the unsharded one.

The context-parallel wrapper lives in ``parallel/cp_attention.py``: Q stays
sharded along the sequence axis, K/V are all-gathered over the cp axis
(cheap under GQA — kv heads are few), and each device runs this kernel over
its 1/cp of the rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _pick_block(length: int, block: int) -> int:
    block = min(block, length)
    while length % block:
        block -= 1
    return block


def _scores(qs, k_blk, scale):
    # qs [B, Lq, K, G, Dh] x k_blk [B, M, K, Dh] -> [B, K, G, Lq, M] fp32
    return jnp.einsum(
        "blkgd,bmkd->bkglm", qs, k_blk, preferred_element_type=jnp.float32
    ) * scale


def _mask(qseg, kseg_blk, qidx, kidx_blk):
    # [B, Lq, M] bool: same segment and kv at or before the query token
    same = qseg[:, :, None] == kseg_blk[:, None, :]
    causal = qidx[:, None] >= kidx_blk[None, :]
    return same & causal[None]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8)
)
def mha_packed_blockwise(
    q: jnp.ndarray,  # [B, Lq, H, Dh]
    k: jnp.ndarray,  # [B, Lkv, K, Dh]
    v: jnp.ndarray,  # [B, Lkv, K, Dh]
    q_segment_ids: jnp.ndarray,  # [B, Lq]
    kv_segment_ids: jnp.ndarray,  # [B, Lkv]
    q_offset: jnp.ndarray | int,  # global index of q[:, 0]
    scale: float | None = None,
    block_kv: int = 1024,
    block_q: int = 512,
) -> jnp.ndarray:
    out, _ = _fwd(
        q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, block_kv, block_q
    )
    return out


def _fwd(q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, block_kv, block_q):
    B, Lq, H, Dh = q.shape
    Lkv, K = k.shape[1], k.shape[2]
    assert H % K == 0, f"query heads {H} not a multiple of kv heads {K}"
    G = H // K
    scale = scale if scale is not None else Dh**-0.5
    M = _pick_block(Lkv, block_kv)
    n_blocks = Lkv // M

    qh = q.reshape(B, Lq, K, G, Dh)
    qidx = q_offset + jnp.arange(Lq)
    kidx = jnp.arange(Lkv)

    k_b = k.reshape(B, n_blocks, M, K, Dh).transpose(1, 0, 2, 3, 4)
    v_b = v.reshape(B, n_blocks, M, K, Dh).transpose(1, 0, 2, 3, 4)
    kseg_b = kv_segment_ids.reshape(B, n_blocks, M).transpose(1, 0, 2)
    kidx_b = kidx.reshape(n_blocks, M)

    def body(carry, xs):
        acc, m, l = carry  # [B,K,G,Lq,Dh], [B,K,G,Lq], [B,K,G,Lq]
        k_blk, v_blk, kseg_blk, kidx_blk = xs
        s = _scores(qh, k_blk, scale)  # [B,K,G,Lq,M]
        msk = _mask(q_segment_ids, kseg_blk, qidx, kidx_blk)  # [B,Lq,M]
        s = jnp.where(msk[:, None, None], s, _NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.where(msk[:, None, None], jnp.exp(s - m_new[..., None]), 0.0)
        l = l * corr + p.sum(axis=-1)
        pv = jnp.einsum(
            "bkglm,bmkd->bkgld", p, v_blk, preferred_element_type=jnp.float32
        )
        acc = acc * corr[..., None] + pv
        return (acc, m_new, l), None

    # carries seeded from q so they carry q's varying-axes type under
    # shard_map (scan requires carry-in/carry-out VMA types to match)
    zero = (qh.reshape(-1)[0] * 0).astype(jnp.float32)
    acc0 = jnp.zeros((B, K, G, Lq, Dh), jnp.float32) + zero
    m0 = jnp.full((B, K, G, Lq), _NEG_INF, jnp.float32) + zero
    l0 = jnp.zeros((B, K, G, Lq), jnp.float32) + zero
    (acc, m, l), _ = jax.lax.scan(body, (acc0, m0, l0), (k_b, v_b, kseg_b, kidx_b))
    l_safe = jnp.maximum(l, 1e-30)
    out = (acc / l_safe[..., None]).transpose(0, 3, 1, 2, 4).reshape(B, Lq, H, Dh)
    lse = m + jnp.log(l_safe)  # [B,K,G,Lq]
    out = out.astype(q.dtype)
    return out, (q, k, v, q_segment_ids, kv_segment_ids, q_offset, out, lse)


def _bwd(scale, block_kv, block_q, res, do):
    q, k, v, q_segment_ids, kv_segment_ids, q_offset, out, lse = res
    B, Lq, H, Dh = q.shape
    Lkv, K = k.shape[1], k.shape[2]
    G = H // K
    scale = scale if scale is not None else Dh**-0.5
    M = _pick_block(Lkv, block_kv)
    n_blocks = Lkv // M

    qh = q.reshape(B, Lq, K, G, Dh)
    doh = do.reshape(B, Lq, K, G, Dh).astype(jnp.float32)
    outh = out.reshape(B, Lq, K, G, Dh).astype(jnp.float32)
    # delta_i = sum_d do_i * out_i  [B,K,G,Lq]
    delta = jnp.einsum("blkgd,blkgd->bkgl", doh, outh)
    qidx = q_offset + jnp.arange(Lq)
    kidx = jnp.arange(Lkv)

    k_b = k.reshape(B, n_blocks, M, K, Dh).transpose(1, 0, 2, 3, 4)
    v_b = v.reshape(B, n_blocks, M, K, Dh).transpose(1, 0, 2, 3, 4)
    kseg_b = kv_segment_ids.reshape(B, n_blocks, M).transpose(1, 0, 2)
    kidx_b = kidx.reshape(n_blocks, M)

    def body(dq_acc, xs):
        k_blk, v_blk, kseg_blk, kidx_blk = xs
        s = _scores(qh, k_blk, scale)
        msk = _mask(q_segment_ids, kseg_blk, qidx, kidx_blk)
        s = jnp.where(msk[:, None, None], s, _NEG_INF)
        p = jnp.exp(s - lse[..., None])  # masked entries underflow to 0
        # dv_j = sum_i p_ij do_i
        dv_blk = jnp.einsum(
            "bkglm,blkgd->bmkd", p, doh, preferred_element_type=jnp.float32
        )
        dp = jnp.einsum(
            "blkgd,bmkd->bkglm", doh, v_blk, preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[..., None])  # [B,K,G,Lq,M]
        dq_blk = jnp.einsum(
            "bkglm,bmkd->blkgd", ds, k_blk, preferred_element_type=jnp.float32
        )
        dk_blk = jnp.einsum(
            "bkglm,blkgd->bmkd", ds, qh, preferred_element_type=jnp.float32
        )
        return dq_acc + dq_blk, (dk_blk, dv_blk)

    zero = (qh.reshape(-1)[0] * 0).astype(jnp.float32)
    dq0 = jnp.zeros((B, Lq, K, G, Dh), jnp.float32) + zero
    dq, (dk_b, dv_b) = jax.lax.scan(body, dq0, (k_b, v_b, kseg_b, kidx_b))
    dq = (dq * scale).reshape(B, Lq, H, Dh).astype(q.dtype)
    dk = (
        (dk_b.transpose(1, 0, 2, 3, 4) * scale)
        .reshape(B, Lkv, K, Dh)
        .astype(k.dtype)
    )
    dv = dv_b.transpose(1, 0, 2, 3, 4).reshape(B, Lkv, K, Dh).astype(v.dtype)
    return dq, dk, dv, None, None, None


def _fwd_rule(q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, block_kv, block_q):
    out, res = _fwd(
        q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, block_kv, block_q
    )
    return out, res


mha_packed_blockwise.defvjp(_fwd_rule, _bwd)


def mha_packed_blockwise_simple(
    q: jnp.ndarray,  # [B, L, H, Dh]
    k: jnp.ndarray,  # [B, L, K, Dh]
    v: jnp.ndarray,  # [B, L, K, Dh]
    segment_ids: jnp.ndarray,  # [B, L]
    position_ids: jnp.ndarray | None = None,  # unused (flat-index causality)
    scale: float | None = None,
    block_kv: int = 1024,
) -> jnp.ndarray:
    """Drop-in for ``mha_packed`` (q and kv cover the same packed row)."""
    return mha_packed_blockwise(
        q, k, v, segment_ids, segment_ids, 0, scale, block_kv
    )
