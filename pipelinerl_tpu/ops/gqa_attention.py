"""GQA-folded Pallas flash attention for packed-sequence TRAINING.

The round-4 16k profile (scripts/probe_16k.py) isolated the trainer's
attention cost: with the pure-JAX blockwise kernel each (q block, kv block)
pair costs ~54 us, dominated not by the small Dh=64 GQA matmuls (~2 us each)
but by XLA-level VPU/layout work — the [K, G, Bq, M] fp32 score/exp
intermediates exceed VMEM and spill to HBM between elementwise passes.

This kernel is the named fix: a hand-written Pallas grid that
- folds the G = H/K query heads of one kv head into the MATMUL ROWS
  ([Bq*G, Dh] x [Dh, M] — one big MXU contraction instead of G small ones),
- keeps the entire flash update (mask, exp, running max/sum, P·V) resident
  in VMEM — zero HBM traffic for intermediates,
- skips fully-masked (future) kv blocks with cheap predication (no
  lax.cond pipeline break — the round-3 finding against skip_blocks),
- carries the standard running-softmax state in fp32 scratch across the kv
  grid dimension (innermost, sequential on a TPU core).

Semantics match ``ops.blockwise_attention.mha_packed_blockwise``: causality
by flat global token index within the packed row AND same-segment
membership; ``q_offset`` places a context-parallel query shard. The custom
VJP recomputes P from (q, k, lse) flash-style: a dq kernel (q-block major)
and a dkv kernel (kv-block major), both GQA-folded.

Reference role: flash-attn 2 + ring-flash-attn supply this op to the
reference trainer (/root/reference/pipelinerl/finetune_loop.py:507-517);
here it is a first-class TPU kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# set True in tests to run the Pallas kernels in interpreter mode on CPU
INTERPRET = False


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    qoff_ref,  # SMEM [1] int32: global index of q[:, 0]
    q_ref,  # [1, G, Bq, Dh] (head-major rows: contiguous [G*Bq, Dh] fold)
    k_ref,  # [1, M, Dh]
    v_ref,  # [1, M, Dh]
    qseg_ref,  # [1, 1, Bq]
    kseg_ref,  # [1, 1, M]
    out_ref,  # [1, G, Bq, Dh]
    lse_ref,  # [1, G, Bq]
    acc_ref,  # VMEM scratch [G*Bq, Dh] fp32
    m_ref,  # VMEM scratch [G*Bq, 128] fp32 (lane-replicated running max)
    l_ref,  # VMEM scratch [G*Bq, 128] fp32 (lane-replicated running sum)
    *,
    scale: float,
    bq: int,
    g: int,
    m_blk: int,
    n_kv: int,
):
    kv_id = pl.program_id(2)
    q_id = pl.program_id(1)
    qoff = qoff_ref[0]
    rows = bq * g

    q_lo = qoff + q_id * bq  # global index of this q block's first token
    q_hi = q_lo + bq - 1
    kv_lo = kv_id * m_blk
    # the last kv block this q block can causally see (predication bound)
    last_kv = jnp.minimum(
        jnp.maximum(q_hi, 0) // m_blk, n_kv - 1
    )

    @pl.when(kv_id == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # packed rows keep segment ids sorted, so a (q, kv) block pair whose
    # id ranges do not overlap is FULLY masked — the dominant case in a
    # packed 16k row (8 x 2k segments leave ~1/8 of the causal blocks
    # live). The reference's flash-attn varlen path never computes these;
    # Pallas predication skips them without the lax.cond pipeline stall
    # that made skipping net-negative in the XLA blockwise kernel.
    seg_overlap = jnp.logical_and(
        jnp.min(qseg_ref[0, 0]) <= jnp.max(kseg_ref[0, 0]),
        jnp.max(qseg_ref[0, 0]) >= jnp.min(kseg_ref[0, 0]),
    )

    @pl.when(jnp.logical_and(
        jnp.logical_and(kv_lo <= q_hi, kv_id <= last_kv), seg_overlap
    ))
    def _compute():
        qf = q_ref[0].reshape(rows, q_ref.shape[-1])  # [G*Bq, Dh] (head-major)
        k_t = k_ref[0]  # [M, Dh]
        s = jax.lax.dot_general(
            qf, k_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [rows, M]

        # mask [Bq, M] -> repeat into rows (pos-major, head-minor)
        qpos = q_lo + jax.lax.broadcasted_iota(jnp.int32, (bq, m_blk), 0)
        kpos = kv_lo + jax.lax.broadcasted_iota(jnp.int32, (bq, m_blk), 1)
        seg_ok = qseg_ref[0, 0][:, None] == kseg_ref[0, 0][None, :]
        mask2 = jnp.logical_and(qpos >= kpos, seg_ok)  # [Bq, M]
        # head-major rows tile the [Bq, M] mask G times along sublanes
        mask = pltpu.repeat(mask2, g, axis=0) if g > 1 else mask2  # [G*Bq, M]

        s = jnp.where(mask, s, _NEG_INF)
        m_prev = m_ref[:, :1]  # [rows, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [rows, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # clamp so fully-masked rows (m = -1e30) still give exp(-big) = 0
        # without overflowing the subtraction
        m_safe = jnp.maximum(m_new, -1e29)
        p = jnp.exp(s - m_safe)
        p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m_prev - m_safe)  # 0 on the first contributing block
        l_new = l_ref[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, Dh]
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kv_id == n_kv - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        out = (acc_ref[:] / l).astype(out_ref.dtype)
        out_ref[0] = out.reshape(g, bq, out_ref.shape[-1])
        m_fin = m_ref[:, :1]
        lse = jnp.where(m_fin > _NEG_INF * 0.5, m_fin + jnp.log(l), _NEG_INF)
        lse_ref[0] = lse.reshape(g, bq)


def _fwd_call(q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, bq, m_blk):
    """q [B, Lq, K, G, Dh]; k, v [B, Lkv, K, Dh] → out [B, Lq, K, G, Dh],
    lse [B, Lq, K, G] (natural log-sum-exp of scaled scores)."""
    B, Lq, K, G, Dh = q.shape
    Lkv = k.shape[1]
    n_q = _cdiv(Lq, bq)
    n_kv = _cdiv(Lkv, m_blk)
    grid = (B * K, n_q, n_kv)

    # fold (B, K) into one leading grid axis; q head-major so the kernel's
    # [G*Bq, Dh] row fold is a contiguous reshape (no in-VMEM transpose)
    qf = q.transpose(0, 2, 3, 1, 4).reshape(B * K, G, Lq, Dh)
    kf = k.transpose(0, 2, 1, 3).reshape(B * K, Lkv, Dh)
    vf = v.transpose(0, 2, 1, 3).reshape(B * K, Lkv, Dh)
    qseg = jnp.repeat(q_segment_ids, K, axis=0)[:, None, :]  # [B*K, 1, Lq]
    kseg = jnp.repeat(kv_segment_ids, K, axis=0)[:, None, :]
    qoff = jnp.asarray([q_offset], jnp.int32) if not isinstance(
        q_offset, jnp.ndarray
    ) else q_offset.reshape(1).astype(jnp.int32)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, bq=bq, g=G, m_blk=m_blk, n_kv=n_kv
    )
    out_f, lse_f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, G, bq, Dh), lambda bk, i, j, *_: (bk, 0, i, 0)),
                pl.BlockSpec((1, m_blk, Dh), lambda bk, i, j, *_: (bk, j, 0)),
                pl.BlockSpec((1, m_blk, Dh), lambda bk, i, j, *_: (bk, j, 0)),
                pl.BlockSpec((1, 1, bq), lambda bk, i, j, *_: (bk, 0, i)),
                pl.BlockSpec((1, 1, m_blk), lambda bk, i, j, *_: (bk, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, G, bq, Dh), lambda bk, i, j, *_: (bk, 0, i, 0)),
                pl.BlockSpec((1, G, bq), lambda bk, i, j, *_: (bk, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq * G, Dh), jnp.float32),
                pltpu.VMEM((bq * G, 128), jnp.float32),
                pltpu.VMEM((bq * G, 128), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * K, G, Lq, Dh), q.dtype),
            jax.ShapeDtypeStruct((B * K, G, Lq), jnp.float32),
        ],
        interpret=INTERPRET,
    )(qoff, qf, kf, vf, qseg, kseg)
    out = out_f.reshape(B, K, G, Lq, Dh).transpose(0, 3, 1, 2, 4)
    lse = lse_f.reshape(B, K, G, Lq)
    return out, lse



def _rows_column(ref3, g: int):
    """Load a [1, G, bq] block as a [G*bq, 1] fp32 column (head-major rows).
    Mosaic rejects the direct 3-D lane->sublane reshape; per-head [1, bq] ->
    [bq, 1] transposes + a sublane concat lower cleanly."""
    x = ref3[0]  # [G, bq]
    cols = [jnp.swapaxes(x[i:i + 1, :], 0, 1) for i in range(g)]
    return cols[0] if g == 1 else jnp.concatenate(cols, axis=0)


# ---------------------------------------------------------------------------
# backward: dq kernel (q-block major, kv innermost)
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    qoff_ref,  # SMEM [1]
    q_ref,  # [1, G, Bq, Dh]
    k_ref,  # [1, M, Dh]
    v_ref,  # [1, M, Dh]
    do_ref,  # [1, G, Bq, Dh]
    lse_ref,  # [1, G, Bq] fp32
    delta_ref,  # [1, G, Bq] fp32  (rowsum(do * out))
    qseg_ref,  # [1, 1, Bq]
    kseg_ref,  # [1, 1, M]
    dq_ref,  # out [1, G, Bq, Dh]
    dq_acc,  # VMEM scratch [G*Bq, Dh] fp32
    *,
    scale: float,
    bq: int,
    g: int,
    m_blk: int,
    n_kv: int,
):
    kv_id = pl.program_id(2)
    q_id = pl.program_id(1)
    qoff = qoff_ref[0]
    rows = bq * g
    q_lo = qoff + q_id * bq
    q_hi = q_lo + bq - 1
    kv_lo = kv_id * m_blk

    @pl.when(kv_id == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    seg_overlap = jnp.logical_and(
        jnp.min(qseg_ref[0, 0]) <= jnp.max(kseg_ref[0, 0]),
        jnp.max(qseg_ref[0, 0]) >= jnp.min(kseg_ref[0, 0]),
    )

    @pl.when(jnp.logical_and(kv_lo <= q_hi, seg_overlap))
    def _compute():
        dh = q_ref.shape[-1]
        qf = q_ref[0].reshape(rows, dh)
        dof = do_ref[0].reshape(rows, dh)
        k_t = k_ref[0]
        v_t = v_ref[0]
        s = jax.lax.dot_general(
            qf, k_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [rows, M]
        qpos = q_lo + jax.lax.broadcasted_iota(jnp.int32, (bq, m_blk), 0)
        kpos = kv_lo + jax.lax.broadcasted_iota(jnp.int32, (bq, m_blk), 1)
        seg_ok = qseg_ref[0, 0][:, None] == kseg_ref[0, 0][None, :]
        mask2 = jnp.logical_and(qpos >= kpos, seg_ok)
        mask = pltpu.repeat(mask2, g, axis=0) if g > 1 else mask2
        lse_rows = _rows_column(lse_ref, g)  # [rows, 1]
        delta_rows = _rows_column(delta_ref, g)
        p = jnp.where(mask, jnp.exp(s - lse_rows), 0.0)  # [rows, M]
        dp = jax.lax.dot_general(
            dof, v_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, M]
        ds = p * (dp - delta_rows)
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k_t.dtype), k_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_id == n_kv - 1)
    def _finalize():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype).reshape(
            g, bq, dq_ref.shape[-1]
        )


# ---------------------------------------------------------------------------
# backward: dk/dv kernel (kv-block major, q innermost)
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    qoff_ref,  # SMEM [1]
    q_ref,  # [1, G, Bq, Dh]
    k_ref,  # [1, M, Dh]
    v_ref,  # [1, M, Dh]
    do_ref,  # [1, G, Bq, Dh]
    lse_ref,  # [1, G, Bq] fp32
    delta_ref,  # [1, G, Bq] fp32
    qseg_ref,  # [1, 1, Bq]
    kseg_ref,  # [1, 1, M]
    dk_ref,  # out [1, M, Dh]
    dv_ref,  # out [1, M, Dh]
    dk_acc,  # VMEM scratch [M, Dh] fp32
    dv_acc,  # VMEM scratch [M, Dh] fp32
    *,
    scale: float,
    bq: int,
    g: int,
    m_blk: int,
    n_q: int,
):
    q_id = pl.program_id(2)
    kv_id = pl.program_id(1)
    qoff = qoff_ref[0]
    rows = bq * g
    q_lo = qoff + q_id * bq
    q_hi = q_lo + bq - 1
    kv_lo = kv_id * m_blk

    @pl.when(q_id == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    seg_overlap = jnp.logical_and(
        jnp.min(qseg_ref[0, 0]) <= jnp.max(kseg_ref[0, 0]),
        jnp.max(qseg_ref[0, 0]) >= jnp.min(kseg_ref[0, 0]),
    )

    @pl.when(jnp.logical_and(q_hi >= kv_lo, seg_overlap))
    def _compute():
        dh = q_ref.shape[-1]
        qf = q_ref[0].reshape(rows, dh)
        dof = do_ref[0].reshape(rows, dh)
        k_t = k_ref[0]
        v_t = v_ref[0]
        s = jax.lax.dot_general(
            qf, k_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        qpos = q_lo + jax.lax.broadcasted_iota(jnp.int32, (bq, m_blk), 0)
        kpos = kv_lo + jax.lax.broadcasted_iota(jnp.int32, (bq, m_blk), 1)
        seg_ok = qseg_ref[0, 0][:, None] == kseg_ref[0, 0][None, :]
        mask2 = jnp.logical_and(qpos >= kpos, seg_ok)
        mask = pltpu.repeat(mask2, g, axis=0) if g > 1 else mask2
        lse_rows = _rows_column(lse_ref, g)
        delta_rows = _rows_column(delta_ref, g)
        p = jnp.where(mask, jnp.exp(s - lse_rows), 0.0)
        # dv_j = sum_i p_ij do_i : contract over rows
        dv_acc[:] += jax.lax.dot_general(
            p.astype(dof.dtype), dof, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            dof, v_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_rows)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(qf.dtype), qf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(q_id == n_q - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_call(
    q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, bq, m_blk,
    out, lse, do,
):
    B, Lq, K, G, Dh = q.shape
    Lkv = k.shape[1]
    n_q = _cdiv(Lq, bq)
    n_kv = _cdiv(Lkv, m_blk)

    qf = q.transpose(0, 2, 3, 1, 4).reshape(B * K, G, Lq, Dh)
    dof = do.transpose(0, 2, 3, 1, 4).reshape(B * K, G, Lq, Dh)
    kf = k.transpose(0, 2, 1, 3).reshape(B * K, Lkv, Dh)
    vf = v.transpose(0, 2, 1, 3).reshape(B * K, Lkv, Dh)
    qseg = jnp.repeat(q_segment_ids, K, axis=0)[:, None, :]  # [B*K, 1, Lq]
    kseg = jnp.repeat(kv_segment_ids, K, axis=0)[:, None, :]
    # delta_i = sum_d do_i * out_i, in the kernels' [B*K, G, Lq] layout
    delta = jnp.einsum(
        "blkgd,blkgd->bkgl", do.astype(jnp.float32), out.astype(jnp.float32)
    ).reshape(B * K, G, Lq)
    lse_f = lse.reshape(B * K, G, Lq)
    qoff = jnp.asarray([q_offset], jnp.int32) if not isinstance(
        q_offset, jnp.ndarray
    ) else q_offset.reshape(1).astype(jnp.int32)

    common_in = [qf, kf, vf, dof, lse_f, delta, qseg, kseg]
    in_specs = [
        pl.BlockSpec((1, G, bq, Dh), lambda bk, i, j, *_: (bk, 0, i, 0)),
        pl.BlockSpec((1, m_blk, Dh), lambda bk, i, j, *_: (bk, j, 0)),
        pl.BlockSpec((1, m_blk, Dh), lambda bk, i, j, *_: (bk, j, 0)),
        pl.BlockSpec((1, G, bq, Dh), lambda bk, i, j, *_: (bk, 0, i, 0)),
        pl.BlockSpec((1, G, bq), lambda bk, i, j, *_: (bk, 0, i)),
        pl.BlockSpec((1, G, bq), lambda bk, i, j, *_: (bk, 0, i)),
        pl.BlockSpec((1, 1, bq), lambda bk, i, j, *_: (bk, 0, i)),
        pl.BlockSpec((1, 1, m_blk), lambda bk, i, j, *_: (bk, 0, j)),
    ]
    dq_f = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, bq=bq, g=G, m_blk=m_blk, n_kv=n_kv
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * K, n_q, n_kv),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, G, bq, Dh), lambda bk, i, j, *_: (bk, 0, i, 0)),
            scratch_shapes=[pltpu.VMEM((bq * G, Dh), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        out_shape=jax.ShapeDtypeStruct((B * K, G, Lq, Dh), q.dtype),
        interpret=INTERPRET,
    )(qoff, *common_in)

    # kv-major grid: swap the (i, j) roles in the index maps
    in_specs_kv = [
        pl.BlockSpec((1, G, bq, Dh), lambda bk, j, i, *_: (bk, 0, i, 0)),
        pl.BlockSpec((1, m_blk, Dh), lambda bk, j, i, *_: (bk, j, 0)),
        pl.BlockSpec((1, m_blk, Dh), lambda bk, j, i, *_: (bk, j, 0)),
        pl.BlockSpec((1, G, bq, Dh), lambda bk, j, i, *_: (bk, 0, i, 0)),
        pl.BlockSpec((1, G, bq), lambda bk, j, i, *_: (bk, 0, i)),
        pl.BlockSpec((1, G, bq), lambda bk, j, i, *_: (bk, 0, i)),
        pl.BlockSpec((1, 1, bq), lambda bk, j, i, *_: (bk, 0, i)),
        pl.BlockSpec((1, 1, m_blk), lambda bk, j, i, *_: (bk, 0, j)),
    ]
    dk_f, dv_f = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, bq=bq, g=G, m_blk=m_blk, n_q=n_q
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * K, n_kv, n_q),
            in_specs=in_specs_kv,
            out_specs=[
                pl.BlockSpec((1, m_blk, Dh), lambda bk, j, i, *_: (bk, j, 0)),
                pl.BlockSpec((1, m_blk, Dh), lambda bk, j, i, *_: (bk, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((m_blk, Dh), jnp.float32),
                pltpu.VMEM((m_blk, Dh), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * K, Lkv, Dh), k.dtype),
            jax.ShapeDtypeStruct((B * K, Lkv, Dh), v.dtype),
        ],
        interpret=INTERPRET,
    )(qoff, *common_in)

    dq = dq_f.reshape(B, K, G, Lq, Dh).transpose(0, 3, 1, 2, 4)
    dk = dk_f.reshape(B, K, Lkv, Dh).transpose(0, 2, 1, 3)
    dv = dv_f.reshape(B, K, Lkv, Dh).transpose(0, 2, 1, 3)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


# q_offset is a REGULAR (non-diff-by-returning-None) argument, not a
# nondiff_argnum: under shard_map the context-parallel wrapper passes a
# traced axis_index-derived offset, which custom_vjp forbids in
# nondiff_argnums (same layout as mha_packed_blockwise)
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _gqa_attention(q5, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, bq, m_blk):
    out, _ = _fwd_call(
        q5, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, bq, m_blk
    )
    return out


def _gqa_fwd_rule(q5, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, bq, m_blk):
    out, lse = _fwd_call(
        q5, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, bq, m_blk
    )
    return out, (q5, k, v, q_segment_ids, kv_segment_ids, q_offset, out, lse)


def _gqa_bwd_rule(scale, bq, m_blk, res, do):
    q5, k, v, q_segment_ids, kv_segment_ids, q_offset, out, lse = res
    dq, dk, dv = _bwd_call(
        q5, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, bq, m_blk,
        out, lse, do,
    )
    return dq, dk, dv, None, None, None


_gqa_attention.defvjp(_gqa_fwd_rule, _gqa_bwd_rule)


def mha_packed_gqa(
    q: jnp.ndarray,  # [B, Lq, H, Dh]
    k: jnp.ndarray,  # [B, Lkv, K, Dh]
    v: jnp.ndarray,  # [B, Lkv, K, Dh]
    q_segment_ids: jnp.ndarray,  # [B, Lq]
    kv_segment_ids: jnp.ndarray,  # [B, Lkv]
    q_offset: int = 0,
    scale: float | None = None,
    block_q: int = 256,
    block_kv: int = 512,
) -> jnp.ndarray:
    """GQA-folded Pallas packed attention (drop-in for
    ``mha_packed_blockwise``'s signature minus the tuning knobs)."""
    B, Lq, H, Dh = q.shape
    K = k.shape[2]
    assert H % K == 0, f"query heads {H} not a multiple of kv heads {K}"
    G = H // K
    scale = scale if scale is not None else Dh**-0.5
    bq = block_q
    while Lq % bq:
        bq //= 2
    m_blk = block_kv
    while k.shape[1] % m_blk:
        m_blk //= 2
    if bq < 8 or m_blk < 128:
        # degenerate shapes: fall back to the pure-JAX blockwise kernel
        from .blockwise_attention import mha_packed_blockwise

        return mha_packed_blockwise(
            q, k, v, q_segment_ids, kv_segment_ids, q_offset, scale
        )
    q5 = q.reshape(B, Lq, K, G, Dh)
    out = _gqa_attention(
        q5, k, v, q_segment_ids, kv_segment_ids, q_offset, scale, bq, m_blk
    )
    return out.reshape(B, Lq, H, Dh)


def mha_packed_gqa_simple(
    q: jnp.ndarray,  # [B, L, H, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,  # [B, L]
    position_ids: jnp.ndarray | None = None,  # unused (flat-index causality)
    scale: float | None = None,
) -> jnp.ndarray:
    """Drop-in for ``mha_packed`` (q and kv cover the same packed row)."""
    return mha_packed_gqa(q, k, v, segment_ids, segment_ids, 0, scale)
