"""Prototype: fori-loop GQA forward with scalar-prefetched kv bounds and
double-buffered DMA. Compares numerics + speed vs the v1 grid kernel."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pipelinerl_tpu.ops.blockwise_attention import mha_packed_blockwise
from pipelinerl_tpu.ops.gqa_attention import mha_packed_gqa
from pipelinerl_tpu.utils import enable_compilation_cache

enable_compilation_cache()

_NEG_INF = -1e30


def _fwd2_kernel(
    kv_start_ref,  # SMEM [BK, n_q]
    kv_stop_ref,  # SMEM [BK, n_q]
    qoff_ref,  # SMEM [1]
    q_ref,  # [1, G, Bq, Dh]
    k_hbm,  # ANY [BK, n_kv, M, Dh]
    v_hbm,  # ANY [BK, n_kv, M, Dh]
    qseg_ref,  # [1, 1, Bq]
    kseg_hbm,  # ANY [BK, n_kv, 1, M]
    out_ref,  # [1, G, Bq, Dh]
    lse_ref,  # [1, G, Bq]
    kbuf, vbuf, sbuf,  # VMEM (2, m, Dh), (2, m, Dh), (2, 1, m)
    ksem, vsem, ssem,  # DMA sems (2,)
    *,
    scale: float,
    bq: int,
    g: int,
    m_blk: int,
):
    bk = pl.program_id(0)
    i = pl.program_id(1)
    qoff = qoff_ref[0]
    rows = bq * g
    dh = q_ref.shape[-1]
    q_lo = qoff + i * bq

    lo = kv_start_ref[bk, i]
    hi = kv_stop_ref[bk, i]

    # k/v/kseg are pre-reshaped to whole-block granularity ([BK, n_kv, m,
    # Dh] etc.): DMAing a full block avoids partial-slice alignment limits
    # on the 64-lane Dh dimension
    def k_dma(slot, j):
        return pltpu.make_async_copy(k_hbm.at[bk, j], kbuf.at[slot], ksem.at[slot])

    def v_dma(slot, j):
        return pltpu.make_async_copy(v_hbm.at[bk, j], vbuf.at[slot], vsem.at[slot])

    def s_dma(slot, j):
        return pltpu.make_async_copy(kseg_hbm.at[bk, j], sbuf.at[slot], ssem.at[slot])

    @pl.when(lo < hi)
    def _start():
        k_dma(0, lo).start()
        v_dma(0, lo).start()
        s_dma(0, lo).start()

    qf = q_ref[0].reshape(rows, dh)
    qseg = qseg_ref[0, 0]

    def body(j, carry):
        acc, m_prev, l_prev = carry
        slot = jax.lax.rem(j - lo, 2)

        @pl.when(j + 1 < hi)
        def _prefetch():
            nxt = jax.lax.rem(j - lo + 1, 2)
            k_dma(nxt, j + 1).start()
            v_dma(nxt, j + 1).start()
            s_dma(nxt, j + 1).start()

        k_dma(slot, j).wait()
        v_dma(slot, j).wait()
        s_dma(slot, j).wait()
        k_t = kbuf[slot][:, :dh]  # drop DMA padding columns
        v_t = vbuf[slot][:, :dh]
        kseg = sbuf[slot, 0]

        kv_lo = j * m_blk
        s = jax.lax.dot_general(
            qf, k_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        qpos = q_lo + jax.lax.broadcasted_iota(jnp.int32, (bq, m_blk), 0)
        kpos = kv_lo + jax.lax.broadcasted_iota(jnp.int32, (bq, m_blk), 1)
        seg_ok = qseg[:, None] == kseg[None, :]
        mask2 = jnp.logical_and(qpos >= kpos, seg_ok)
        mask = pltpu.repeat(mask2, g, axis=0) if g > 1 else mask2

        s = jnp.where(mask, s, _NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.maximum(m_new, -1e29)
        p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
        corr = jnp.exp(m_prev - m_safe)
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_t.dtype), v_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc * corr + pv, m_new, l_new

    acc0 = jnp.zeros((rows, dh), jnp.float32)
    m0 = jnp.full((rows, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(lo, hi, body, (acc0, m0, l0))
    l = jnp.maximum(l_fin, 1e-30)
    out_ref[0] = (acc / l).astype(out_ref.dtype).reshape(g, bq, dh)
    lse = jnp.where(m_fin > _NEG_INF * 0.5, m_fin + jnp.log(l), _NEG_INF)
    lse_ref[0] = lse.reshape(g, bq)


def block_bounds(q_segment_ids, kv_segment_ids, q_offset, Lq, Lkv, bq, m_blk):
    """Per (row, q block): [kv_start, kv_stop) of blocks that overlap the q
    block's segments and its causal prefix. Segment ids sorted per row."""
    B = q_segment_ids.shape[0]
    n_q = Lq // bq
    n_kv = Lkv // m_blk
    qs = q_segment_ids.reshape(B, n_q, bq)
    ks = kv_segment_ids.reshape(B, n_kv, m_blk)
    q_min, q_max = qs.min(-1), qs.max(-1)  # [B, n_q]
    k_min, k_max = ks.min(-1), ks.max(-1)  # [B, n_kv]
    # first kv block with k_max >= q_min
    start = jnp.sum(
        (k_max[:, None, :] < q_min[:, :, None]).astype(jnp.int32), axis=-1
    )  # [B, n_q]
    # last kv block with k_min <= q_max  (count of blocks satisfying)
    seg_stop = jnp.sum(
        (k_min[:, None, :] <= q_max[:, :, None]).astype(jnp.int32), axis=-1
    )
    q_hi = q_offset + (jnp.arange(n_q) + 1) * bq - 1  # [n_q]
    causal_stop = jnp.minimum(q_hi[None, :] // m_blk + 1, n_kv)
    stop = jnp.minimum(seg_stop, causal_stop)
    start = jnp.minimum(start, stop)
    return start.astype(jnp.int32), stop.astype(jnp.int32)


def fwd2(q, k, v, q_segment_ids, kv_segment_ids, q_offset=0, scale=None,
         bq=256, m_blk=512):
    B, Lq, H, Dh = q.shape
    Lkv, K = k.shape[1], k.shape[2]
    G = H // K
    scale = scale if scale is not None else Dh**-0.5
    n_q = Lq // bq
    q5 = q.reshape(B, Lq, K, G, Dh)
    qf = q5.transpose(0, 2, 3, 1, 4).reshape(B * K, G, Lq, Dh)
    n_kv = Lkv // m_blk
    # pad Dh to the 128-lane tile so whole blocks can be DMA'd; zero columns
    # add nothing to the QK^T contraction and produce zero PV columns
    dh_pad = max(128, Dh)
    kf = k.transpose(0, 2, 1, 3).reshape(B * K, n_kv, m_blk, Dh)
    vf = v.transpose(0, 2, 1, 3).reshape(B * K, n_kv, m_blk, Dh)
    if dh_pad != Dh:
        pad = [(0, 0), (0, 0), (0, 0), (0, dh_pad - Dh)]
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    qseg = jnp.repeat(q_segment_ids, K, axis=0)[:, None, :]
    kseg = jnp.repeat(kv_segment_ids, K, axis=0).reshape(B * K, n_kv, 1, m_blk)
    start, stop = block_bounds(
        q_segment_ids, kv_segment_ids, q_offset, Lq, Lkv, bq, m_blk
    )
    start = jnp.repeat(start, K, axis=0)  # [BK, n_q]
    stop = jnp.repeat(stop, K, axis=0)
    qoff = jnp.asarray([q_offset], jnp.int32)

    kernel = functools.partial(
        _fwd2_kernel, scale=scale, bq=bq, g=G, m_blk=m_blk
    )
    out_f, lse_f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B * K, n_q),
            in_specs=[
                pl.BlockSpec((1, G, bq, Dh), lambda bk, i, *_: (bk, 0, i, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, 1, bq), lambda bk, i, *_: (bk, 0, i)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, G, bq, Dh), lambda bk, i, *_: (bk, 0, i, 0)),
                pl.BlockSpec((1, G, bq), lambda bk, i, *_: (bk, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, m_blk, dh_pad), k.dtype),
                pltpu.VMEM((2, m_blk, dh_pad), v.dtype),
                pltpu.VMEM((2, 1, m_blk), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * K, G, Lq, Dh), q.dtype),
            jax.ShapeDtypeStruct((B * K, G, Lq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(start, stop, qoff, qf, kf, vf, qseg, kseg)
    out = out_f.reshape(B, K, G, Lq, Dh).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, Lq, H, Dh), lse_f


def main():
    H, K, Dh = 14, 2, 64
    for L in (4096, 16384):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, L, H, Dh)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, L, K, Dh)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, L, K, Dh)), jnp.bfloat16)
        seg = jnp.asarray((np.arange(L) // (L // 8)).astype(np.int32))[None]

        f_v1 = jax.jit(lambda q, k, v: mha_packed_gqa(q, k, v, seg, seg, 0))
        f_v2 = jax.jit(lambda q, k, v: fwd2(q, k, v, seg, seg)[0])

        a = f_v1(q, k, v); jax.block_until_ready(a)
        try:
            b = f_v2(q, k, v); jax.block_until_ready(b)
        except Exception as e:
            print(f"L={L} v2 FAILED: {type(e).__name__}: {str(e)[:400]}")
            continue
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"L={L} max |v1 - v2| = {err:.4f}", flush=True)

        for name, f in (("v1-grid", f_v1), ("v2-loop", f_v2)):
            best = float("inf")
            for _ in range(6):
                t0 = time.monotonic()
                r = f(q, k, v)
                jax.block_until_ready(r)
                best = min(best, time.monotonic() - t0)
            print(f"L={L} {name} fwd: {1000 * best:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
