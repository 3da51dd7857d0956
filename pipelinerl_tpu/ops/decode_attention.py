"""Pallas ragged decode attention over a frozen per-slot KV cache.

The XLA staged decode attention (ops/attention.decode_attention_staged)
costs ~1.9 ms/step at batch 64 on v5e for a 0.5B model: fp32 conversion of
the whole cache, materialized [S,K,G,T] score tensors, and full-T reads for
every slot regardless of its actual length. This kernel streams the cache in
its native [S, T, K*Dh] bf16 layout, keeps a flash-style online softmax in
VMEM scratch, and *skips* T-blocks beyond each slot's length (the block
index map clamps trailing blocks to the last valid one, so Mosaic re-uses
the fetched block and the grid step does no DMA or compute).

Replaces the paged-attention role of vLLM's CUDA kernels in the reference
(SURVEY.md §2.4: vLLM paged attention); slot-contiguous KV with window
staging plays the role of the page table.

Same contract as ``decode_attention_staged``: frozen cache + this window's
staged band + the current token's self K/V, GQA, softmax over
[cache(:len) | band(:step) | self].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    lens_ref,  # [S] int32
    step_ref,  # [1] int32
    # inputs
    q_ref,  # [1, H, Dh] — this slot's queries (pre-scaled outside)
    kc_ref,  # [1, Tb, KDh] — cache block
    vc_ref,  # [1, Tb, KDh]
    ks_ref,  # [W, KDh] — staged band (slot folded into lanes outside)
    vs_ref,  # [W, KDh]
    kn_ref,  # [1, 1, KDh] — current token
    vn_ref,  # [1, 1, KDh]
    # output
    o_ref,  # [1, H, Dh] f32
    # scratch — per-head state laid out [K, G] so per-kv-head slicing stays
    # on sublanes (lane slicing at non-128 offsets is fragile in Mosaic)
    m_scr,  # [K, G] f32 — running max
    l_scr,  # [K, G] f32 — running denominator
    acc_scr,  # [H, Dh] f32 — running numerator (sublane-sliced per k)
    *,
    num_kv_heads: int,
    block_t: int,
):
    s = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1) - 1  # last grid step handles band + self
    length = lens_ref[s]
    step = step_ref[0]

    H = q_ref.shape[1]
    Dh = q_ref.shape[2]
    K = num_kv_heads
    G = H // K

    @pl.when(t == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def update(k_rows, v_rows, valid):
        """Online-softmax update with R = k_rows.shape[0] new positions.
        k_rows/v_rows: [R, K*Dh] bf16; valid: [R] bool."""
        R = k_rows.shape[0]
        q = q_ref[0]  # [H, Dh] bf16 (pre-scaled)
        # zero V's invalid rows: beyond-length block tail is uninitialized
        # padding, and p=0 × garbage(NaN/inf) would poison the PV matmul
        v_rows = jnp.where(valid[:, None], v_rows, 0)
        for k in range(K):
            qk = q[k * G : (k + 1) * G, :]  # [G, Dh]
            kk = k_rows[:, k * Dh : (k + 1) * Dh]  # [R, Dh]
            vk = v_rows[:, k * Dh : (k + 1) * Dh]
            # [R, G] f32 scores
            sc = jax.lax.dot_general(
                kk, qk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sc = jnp.where(valid[:, None], sc, _NEG_INF)
            m_prev = m_scr[k, :]  # [G]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=0))
            alpha = jnp.exp(m_prev - m_new)  # [G]
            p = jnp.where(valid[:, None], jnp.exp(sc - m_new[None, :]), 0.0)
            l_scr[k, :] = l_scr[k, :] * alpha + jnp.sum(p, axis=0)
            # [G, Dh] = p^T @ v
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[k * G : (k + 1) * G, :] = (
                acc_scr[k * G : (k + 1) * G, :] * alpha[:, None] + pv
            )
            m_scr[k, :] = m_new

    @pl.when((t < nt) & (t * block_t < length))
    def _():
        pos = t * block_t + jax.lax.broadcasted_iota(jnp.int32, (block_t, 1), 0)[:, 0]
        update(kc_ref[0], vc_ref[0], pos < length)

    @pl.when(t == nt)
    def _():
        W = ks_ref.shape[0]
        k_band = jnp.concatenate([ks_ref[:, :], kn_ref[0]], axis=0)
        v_band = jnp.concatenate([vs_ref[:, :], vn_ref[0]], axis=0)
        widx = jax.lax.broadcasted_iota(jnp.int32, (W + 1, 1), 0)[:, 0]
        valid = (widx < step) | (widx == W)  # band rows < step, plus self
        update(k_band, v_band, valid)
        for k in range(K):
            o_ref[0, k * G : (k + 1) * G, :] = (
                acc_scr[k * G : (k + 1) * G, :] / l_scr[k, :][:, None]
            )


@functools.lru_cache(maxsize=16)
def _build_call(S, T, W, H, K, Dh, interpret):
    KDh = K * Dh
    block_t = min(512, -(-T // 128) * 128)
    nt = -(-T // block_t)

    def clamp_cache(s, t, lens, stp):
        last = jnp.maximum(pl.cdiv(lens[s], block_t) - 1, 0)
        return (s, jnp.minimum(t, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, nt + 1),
        in_specs=[
            pl.BlockSpec((1, H, Dh), lambda s, t, lens, stp: (s, 0, 0)),
            pl.BlockSpec((1, block_t, KDh), clamp_cache),
            pl.BlockSpec((1, block_t, KDh), clamp_cache),
            pl.BlockSpec((W, KDh), lambda s, t, lens, stp: (0, s)),
            pl.BlockSpec((W, KDh), lambda s, t, lens, stp: (0, s)),
            pl.BlockSpec((1, 1, KDh), lambda s, t, lens, stp: (s, 0, 0)),
            pl.BlockSpec((1, 1, KDh), lambda s, t, lens, stp: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Dh), lambda s, t, lens, stp: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((K, H // K), jnp.float32),
            pltpu.VMEM((K, H // K), jnp.float32),
            pltpu.VMEM((H, Dh), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, num_kv_heads=K, block_t=block_t)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, H, Dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )


def decode_attention_staged_ragged(
    q: jnp.ndarray,  # [S, H, Dh]
    k_new: jnp.ndarray,  # [S, K, Dh]
    v_new: jnp.ndarray,  # [S, K, Dh]
    k_cache: jnp.ndarray,  # [S, T, K, Dh] — frozen during the window
    v_cache: jnp.ndarray,
    base_lens: jnp.ndarray,  # [S]
    k_staged: jnp.ndarray,  # [W, S, K, Dh]
    v_staged: jnp.ndarray,  # [W, S, K, Dh]
    step: jnp.ndarray,  # scalar
    scale: float | None = None,
) -> jnp.ndarray:
    """Drop-in Pallas replacement for decode_attention_staged."""
    S, H, Dh = q.shape
    T, K = k_cache.shape[1], k_cache.shape[2]
    W = k_staged.shape[0]
    scale = scale if scale is not None else Dh**-0.5
    dt = jnp.bfloat16

    qs = (q.astype(jnp.float32) * scale).astype(dt)
    kc = k_cache.reshape(S, T, K * Dh).astype(dt)
    vc = v_cache.reshape(S, T, K * Dh).astype(dt)
    # band: fold slot into lanes → [W, S*KDh]; per-slot block = 128 lanes
    ks = k_staged.reshape(W, S * K * Dh).astype(dt)
    vs = v_staged.reshape(W, S * K * Dh).astype(dt)
    kn = k_new.reshape(S, 1, K * Dh).astype(dt)
    vn = v_new.reshape(S, 1, K * Dh).astype(dt)

    interpret = jax.default_backend() != "tpu"
    call = _build_call(S, T, W, H, K, Dh, interpret)
    out = call(
        base_lens.astype(jnp.int32),
        jnp.asarray(step, jnp.int32).reshape(1),
        qs, kc, vc, ks, vs, kn, vn,
    )
    return out.astype(q.dtype)
