"""Blockwise (flash-style) packed attention with a custom VJP — pure JAX.

O(block_q x block_kv) live tiles instead of the [L, L] score materialization
of ``ops.attention.mha_packed``, differentiable, and — unlike the Pallas
splash kernel (``ops/flash_attention.py``) — composable with ``shard_map``,
which makes it the building block for context-parallel long-context training
(reference: ring-flash-attn monkey-patching over NCCL subgroups,
/root/reference/pipelinerl/finetune_loop.py:507-517, rl/utils.py:106-208).

Semantics match ``mha_packed``: causality by FLAT GLOBAL token index within
the packed row, and-ed with same-segment membership. ``q_offset`` places a
local query shard at its global index so a cp-sharded call masks exactly
like the unsharded one.

Performance notes (v5e, 0.5B trainer step, scripts/probe_train_attn.py):
the round-2 version kept the FULL query length in every score tile
([K, G, Lq, M] fp32 = 235 MB at L=4096), far over the ~16 MB VMEM budget,
so XLA spilled every elementwise pass to HBM — 483 ms/step at L=4096.
This version (a) tiles queries too (outer scan over q blocks, tiles sized
for VMEM residency) and (b) feeds every MXU contraction with the operand's
native bf16 (fp32 accumulate via preferred_element_type — the standard
flash-attention recipe; exp/softmax state stays fp32): 265 ms/step at
L=4096 (29.7% MFU vs 13.8% for the XLA [L, L] path). A causal whole-block
skip exists behind ``skip_blocks`` but measured net-negative (see its
docstring).

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
    # qs [B, Bq, K, G, Dh] x k_blk [B, M, K, Dh] -> [B, K, G, Bq, M] fp32
    return jnp.einsum(
        "blkgd,bmkd->bkglm", qs, k_blk, preferred_element_type=jnp.float32
    ) * scale


def _mask(qseg, kseg_blk, qidx, kidx_blk):
    # [B, Bq, M] bool: same segment and kv at or before the query token
    same = qseg[:, :, None] == kseg_blk[:, None, :]
    causal = qidx[:, None] >= kidx_blk[None, :]
    return same & causal[None]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9)
)
def mha_packed_blockwise(
    q: jnp.ndarray,  # [B, Lq, H, Dh]
    k: jnp.ndarray,  # [B, Lkv, K, Dh]
    v: jnp.ndarray,  # [B, Lkv, K, Dh]
    q_segment_ids: jnp.ndarray,  # [B, Lq]
    kv_segment_ids: jnp.ndarray,  # [B, Lkv]
    q_offset: jnp.ndarray | int,  # global index of q[:, 0]
    scale: float | None = None,
    block_kv: int = 512,
    block_q: int = 256,
    skip_blocks: bool = False,
) -> jnp.ndarray:
    """``skip_blocks`` gates a causal whole-block ``lax.cond`` skip.
    Measured OFF-by-default (v5e, 0.5B trainer step): the per-block cond
    dispatch breaks XLA's scan pipelining and cost +50% at L=2048 (190 ms
    vs 125 ms) — far more than the skipped half of the block pairs saves at
    trainer lengths. It also load-imbalances contiguous context-parallel
    shards (rank cp-1 skips nothing while the cp collectives are barriers),
    which trips the CPU backend's 40 s collective rendezvous hard-limit in
    tests. Left available for experiments at very long single-device L."""
    out, _ = _fwd(
        q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, block_kv,
        block_q, skip_blocks,
    )
    return out


def _split_q(x, n_q, Bq):
    # [B, Lq, ...] -> [n_q, B, Bq, ...]
    B = x.shape[0]
    return x.reshape(B, n_q, Bq, *x.shape[2:]).swapaxes(0, 1)


def _split_kv(x, n_kv, M):
    B = x.shape[0]
    return x.reshape(B, n_kv, M, *x.shape[2:]).swapaxes(0, 1)


_N_BANDS = 8


def _bands(n_q: int, Bq: int, n_kv: int, M: int, q_offset: int):
    """Split the q blocks into up to _N_BANDS contiguous bands; each band's
    kv iteration covers only the prefix its LAST q block can causally see.
    Causality makes ~half of all (q block, kv block) pairs fully masked at
    long L; banding skips most of them (576/1024 pairs at 16k with 8 bands
    vs 528 ideal) while keeping the original two-level scan structure — a
    flat scan over exact triangular pairs measured barely faster because
    per-step dynamic gathers lose the q-block-invariant load hoisting, and
    a per-pair ``lax.cond`` (skip_blocks) breaks scan pipelining entirely."""
    # ~4 q blocks per band: fragmenting short-L scans into many tiny bands
    # measured a 30% REGRESSION at 4k (343 vs 261 ms step) for no FLOP win
    n_bands = max(1, min(_N_BANDS, n_q // 4))
    bounds = [round(i * n_q / n_bands) for i in range(n_bands + 1)]
    out = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if lo == hi:
            continue
        last_q_idx = q_offset + hi * Bq - 1
        kv_len = min(n_kv, max(1, last_q_idx // M + 1))
        out.append((lo, hi, kv_len))
    return out


def _fwd(q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, block_kv, block_q, skip_blocks):
    B, Lq, H, Dh = q.shape
    Lkv, K = k.shape[1], k.shape[2]
    assert H % K == 0, f"query heads {H} not a multiple of kv heads {K}"
    G = H // K
    scale = scale if scale is not None else Dh**-0.5
    M = _pick_block(Lkv, block_kv)
    n_kv = Lkv // M
    Bq = _pick_block(Lq, block_q)
    n_q = Lq // Bq

    qh_b = _split_q(q.reshape(B, Lq, K, G, Dh), n_q, Bq)  # [n_q, B, Bq, K, G, Dh]
    qseg_b = _split_q(q_segment_ids, n_q, Bq)  # [n_q, B, Bq]
    qidx = q_offset + jnp.arange(Lq)
    qidx_b = qidx.reshape(n_q, Bq)

    k_b = _split_kv(k, n_kv, M)  # [n_kv, B, M, K, Dh]
    v_b = _split_kv(v, n_kv, M)
    kseg_b = _split_kv(kv_segment_ids, n_kv, M)  # [n_kv, B, M]
    kidx_b = jnp.arange(Lkv).reshape(n_kv, M)

    static_offset = isinstance(q_offset, int) and not isinstance(q_offset, bool)
    bands = (
        _bands(n_q, Bq, n_kv, M, int(q_offset)) if static_offset
        else [(0, n_q, n_kv)]
    )

    # carries seeded from q so they carry q's varying-axes type under
    # shard_map (scan requires carry-in/carry-out VMA types to match)
    zero = (qh_b.reshape(-1)[0] * 0).astype(jnp.float32)

    def make_q_block(ks):
        k_s, v_s, kseg_s, kidx_s = ks

        def q_block(_, xs):
            qs, qseg, qidx_blk = xs  # [B, Bq, K, G, Dh], [B, Bq], [Bq]
            q_max = qidx_blk[-1]

            def body(carry, ys):
                k_blk, v_blk, kseg_blk, kidx_blk = ys

                def compute(c):
                    acc, m, l = c
                    s = _scores(qs, k_blk, scale)  # [B, K, G, Bq, M]
                    msk = _mask(qseg, kseg_blk, qidx_blk, kidx_blk)
                    s = jnp.where(msk[:, None, None], s, _NEG_INF)
                    m_new = jnp.maximum(m, s.max(axis=-1))
                    corr = jnp.exp(m - m_new)
                    p = jnp.where(msk[:, None, None], jnp.exp(s - m_new[..., None]), 0.0)
                    l_new = l * corr + p.sum(axis=-1)
                    pv = jnp.einsum(
                        "bkglm,bmkd->bkgld",
                        p.astype(v_blk.dtype),
                        v_blk,
                        preferred_element_type=jnp.float32,
                    )
                    return acc * corr[..., None] + pv, m_new, l_new

                if not skip_blocks:
                    return compute(carry), None
                # entire KV block in the future of this q block -> fully masked
                return jax.lax.cond(q_max >= kidx_blk[0], compute, lambda c: c, carry), None

            acc0 = jnp.zeros((B, K, G, Bq, Dh), jnp.float32) + zero
            m0 = jnp.full((B, K, G, Bq), _NEG_INF, jnp.float32) + zero
            l0 = jnp.zeros((B, K, G, Bq), jnp.float32) + zero
            (acc, m, l), _ = jax.lax.scan(body, (acc0, m0, l0), (k_s, v_s, kseg_s, kidx_s))
            l_safe = jnp.maximum(l, 1e-30)
            out_i = (acc / l_safe[..., None]).transpose(0, 3, 1, 2, 4)  # [B, Bq, K, G, Dh]
            lse_i = m + jnp.log(l_safe)  # [B, K, G, Bq]
            return None, (out_i.astype(q.dtype), lse_i)

        return q_block

    outs, lses = [], []
    for lo, hi, kv_len in bands:
        ks = (k_b[:kv_len], v_b[:kv_len], kseg_b[:kv_len], kidx_b[:kv_len])
        _, (out_i, lse_i) = jax.lax.scan(
            make_q_block(ks), None, (qh_b[lo:hi], qseg_b[lo:hi], qidx_b[lo:hi])
        )
        outs.append(out_i)
        lses.append(lse_i)
    out_b = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    lse_b = lses[0] if len(lses) == 1 else jnp.concatenate(lses, axis=0)
    out = out_b.swapaxes(0, 1).reshape(B, Lq, H, Dh)
    lse = lse_b.transpose(1, 2, 3, 0, 4).reshape(B, K, G, Lq)
    return out, (q, k, v, q_segment_ids, kv_segment_ids, q_offset, out, lse)


def _bwd(scale, block_kv, block_q, skip_blocks, res, do):
    q, k, v, q_segment_ids, kv_segment_ids, q_offset, out, lse = res
    B, Lq, H, Dh = q.shape
    Lkv, K = k.shape[1], k.shape[2]
    G = H // K
    scale = scale if scale is not None else Dh**-0.5
    M = _pick_block(Lkv, block_kv)
    n_kv = Lkv // M
    Bq = _pick_block(Lq, block_q)
    n_q = Lq // Bq

    qh_b = _split_q(q.reshape(B, Lq, K, G, Dh), n_q, Bq)
    doh_b = _split_q(do.reshape(B, Lq, K, G, Dh), n_q, Bq)
    outh_b = _split_q(out.reshape(B, Lq, K, G, Dh), n_q, Bq)
    qseg_b = _split_q(q_segment_ids, n_q, Bq)
    lse_b = _split_q(
        lse.transpose(0, 3, 1, 2), n_q, Bq
    ).transpose(0, 1, 3, 4, 2)  # [n_q, B, K, G, Bq]
    qidx = q_offset + jnp.arange(Lq)
    qidx_b = qidx.reshape(n_q, Bq)

    k_b = _split_kv(k, n_kv, M)
    v_b = _split_kv(v, n_kv, M)
    kseg_b = _split_kv(kv_segment_ids, n_kv, M)
    kidx_b = jnp.arange(Lkv).reshape(n_kv, M)

    static_offset = isinstance(q_offset, int) and not isinstance(q_offset, bool)
    bands = (
        _bands(n_q, Bq, n_kv, M, int(q_offset)) if static_offset
        else [(0, n_q, n_kv)]
    )

    zero = (qh_b.reshape(-1)[0] * 0).astype(jnp.float32)

    def make_q_block(ks, kv_len):
        k_s, v_s, kseg_s, kidx_s = ks

        def q_block(carry, xs):
            dk_acc, dv_acc = carry  # [kv_len, B, M, K, Dh] fp32 each
            qs, doh, outh, lse_i, qseg, qidx_blk = xs
            q_max = qidx_blk[-1]
            # delta_i = sum_d do_i * out_i  [B, K, G, Bq]
            delta = jnp.einsum(
                "blkgd,blkgd->bkgl",
                doh.astype(jnp.float32),
                outh.astype(jnp.float32),
            )

            def body(dq_acc, ys):
                k_blk, v_blk, kseg_blk, kidx_blk = ys

                def compute(dq_c):
                    s = _scores(qs, k_blk, scale)
                    msk = _mask(qseg, kseg_blk, qidx_blk, kidx_blk)
                    s = jnp.where(msk[:, None, None], s, _NEG_INF)
                    p = jnp.exp(s - lse_i[..., None])  # masked entries underflow to 0
                    p_lo = p.astype(v_blk.dtype)
                    # dv_j = sum_i p_ij do_i
                    dv_blk = jnp.einsum(
                        "bkglm,blkgd->bmkd", p_lo, doh, preferred_element_type=jnp.float32
                    )
                    dp = jnp.einsum(
                        "blkgd,bmkd->bkglm", doh, v_blk, preferred_element_type=jnp.float32
                    )
                    ds = p * (dp - delta[..., None])  # [B, K, G, Bq, M] fp32
                    ds_lo = ds.astype(k_blk.dtype)
                    dq_blk = jnp.einsum(
                        "bkglm,bmkd->blkgd", ds_lo, k_blk, preferred_element_type=jnp.float32
                    )
                    dk_blk = jnp.einsum(
                        "bkglm,blkgd->bmkd", ds_lo, qs, preferred_element_type=jnp.float32
                    )
                    return dq_c + dq_blk, (dk_blk, dv_blk)

                def skip(dq_c):
                    return dq_c, (
                        jnp.zeros((B, M, K, Dh), jnp.float32) + zero,
                        jnp.zeros((B, M, K, Dh), jnp.float32) + zero,
                    )

                if not skip_blocks:
                    return compute(dq_acc)
                return jax.lax.cond(q_max >= kidx_blk[0], compute, skip, dq_acc)

            dq0 = jnp.zeros((B, Bq, K, G, Dh), jnp.float32) + zero
            dq_i, (dk_i, dv_i) = jax.lax.scan(body, dq0, (k_s, v_s, kseg_s, kidx_s))
            return (dk_acc + dk_i, dv_acc + dv_i), dq_i

        return q_block

    dq_parts = []
    dk_full = jnp.zeros((n_kv, B, M, K, Dh), jnp.float32) + zero
    dv_full = jnp.zeros((n_kv, B, M, K, Dh), jnp.float32) + zero
    for lo, hi, kv_len in bands:
        ks = (k_b[:kv_len], v_b[:kv_len], kseg_b[:kv_len], kidx_b[:kv_len])
        dk0 = jnp.zeros((kv_len, B, M, K, Dh), jnp.float32) + zero
        dv0 = jnp.zeros((kv_len, B, M, K, Dh), jnp.float32) + zero
        (dk_i, dv_i), dq_i = jax.lax.scan(
            make_q_block(ks, kv_len),
            (dk0, dv0),
            (qh_b[lo:hi], doh_b[lo:hi], outh_b[lo:hi], lse_b[lo:hi],
             qseg_b[lo:hi], qidx_b[lo:hi]),
        )
        dq_parts.append(dq_i)
        if kv_len == n_kv:
            dk_full = dk_full + dk_i
            dv_full = dv_full + dv_i
        else:
            dk_full = dk_full.at[:kv_len].add(dk_i)
            dv_full = dv_full.at[:kv_len].add(dv_i)
    dq_b = dq_parts[0] if len(dq_parts) == 1 else jnp.concatenate(dq_parts, axis=0)
    dq = (dq_b.swapaxes(0, 1).reshape(B, Lq, H, Dh) * scale).astype(q.dtype)
    dk = (dk_full.swapaxes(0, 1).reshape(B, Lkv, K, Dh) * scale).astype(k.dtype)
    dv = dv_full.swapaxes(0, 1).reshape(B, Lkv, K, Dh).astype(v.dtype)
    return dq, dk, dv, None, None, None


def _fwd_rule(
    q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, block_kv, block_q,
    skip_blocks,
):
    out, res = _fwd(
        q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, block_kv,
        block_q, skip_blocks,
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
    block_kv: int | None = None,
) -> jnp.ndarray:
    """Drop-in for ``mha_packed`` (q and kv cover the same packed row).
    Long rows take larger tiles: bq=512/bkv=1024 measured 52.2 vs 56.5 ms
    f+b at L=16k (fewer scan iterations amortize the per-block VPU work)."""
    L = q.shape[1]
    if block_kv is None:
        block_kv = 1024 if L >= 8192 else 512
    block_q = 512 if L >= 8192 else 256
    return mha_packed_blockwise(
        q, k, v, segment_ids, segment_ids, 0, scale, block_kv, block_q
    )
