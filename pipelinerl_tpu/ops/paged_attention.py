"""Paged decode attention over a shared KV block pool.

The slab engine cache reserves ``S × max_len`` KV regardless of occupancy;
a block pool allocates KV in fixed ``block_size`` pages so HBM holds only
tokens that exist, letting far more slots fit for long-tail lengths — the
role vLLM's paged attention plays for the reference (SURVEY.md §2.4,
vllm1.py). TPU-idiomatic layout:

- pool: ``[N_blocks, block_size, K*Dh]`` per layer (bf16), shared by all slots;
- block table: ``[S, MAX_BLOCKS]`` int32 of physical block ids (host-managed,
  see inference/block_pool.BlockPool); entries past a slot's length are
  arbitrary — the kernel clamps them to the slot's first block and masks.

Two implementations with one contract:
- ``paged_decode_attention`` — Pallas kernel: grid (slot, logical block),
  block table rides scalar prefetch so each grid step DMAs exactly one
  physical page; flash-style online softmax in VMEM; beyond-length pages are
  clamped to a repeated page (no extra DMA) and fully masked.
- ``paged_decode_attention_xla`` — pure-XLA reference (gather + masked
  softmax) for CPU tests and non-TPU backends.

Both fold the current window's staged band + the step's own K/V exactly like
ops/decode_attention (softmax over [pages(:len) | band(:step) | self]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import _kernel

_NEG_INF = -1e30


@functools.lru_cache(maxsize=16)
def _build_paged_call(S, NB, MAXB, BT, W, H, K, Dh, interpret):
    """Grid (slot, logical_block+1); the last grid step folds band+self.
    Reuses the ragged kernel body — only the cache index maps differ: the
    physical page comes from the prefetched block table."""
    KDh = K * Dh

    def page_map(s, t, lens, stp, table):
        # logical block t of slot s → physical page; beyond-length logical
        # blocks clamp to the slot's last valid logical block so Mosaic
        # reuses the already-fetched page (no DMA, fully masked in-kernel)
        last = jnp.maximum(pl.cdiv(lens[s], BT) - 1, 0)
        t_eff = jnp.minimum(t, last)
        return (jnp.clip(table[s, t_eff], 0, NB - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # lens, step, block_table
        grid=(S, MAXB + 1),
        in_specs=[
            pl.BlockSpec((1, H, Dh), lambda s, t, lens, stp, tab: (s, 0, 0)),
            pl.BlockSpec((1, BT, KDh), page_map),
            pl.BlockSpec((1, BT, KDh), page_map),
            pl.BlockSpec((W, KDh), lambda s, t, lens, stp, tab: (0, s)),
            pl.BlockSpec((W, KDh), lambda s, t, lens, stp, tab: (0, s)),
            pl.BlockSpec((1, 1, KDh), lambda s, t, lens, stp, tab: (s, 0, 0)),
            pl.BlockSpec((1, 1, KDh), lambda s, t, lens, stp, tab: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Dh), lambda s, t, lens, stp, tab: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((K, H // K), jnp.float32),
            pltpu.VMEM((K, H // K), jnp.float32),
            pltpu.VMEM((H, Dh), jnp.float32),
        ],
    )
    def kernel(lens_ref, step_ref, table_ref, *rest, **kw):
        # the block table is consumed by the index maps only; the ragged
        # kernel body is reused unchanged (same masking/online softmax)
        _kernel(lens_ref, step_ref, *rest, num_kv_heads=K, block_t=BT, **kw)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, H, Dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )


def paged_decode_attention(
    q: jnp.ndarray,  # [S, H, Dh]
    k_new: jnp.ndarray,  # [S, K, Dh] — this step's K/V
    v_new: jnp.ndarray,
    k_pool: jnp.ndarray,  # [NB, BT, K, Dh] — one layer's page pool (frozen)
    v_pool: jnp.ndarray,
    block_table: jnp.ndarray,  # [S, MAX_BLOCKS] int32 physical page ids
    lens: jnp.ndarray,  # [S] — tokens already in the pool per slot
    k_staged: jnp.ndarray,  # [W, S, K, Dh] — this window's band
    v_staged: jnp.ndarray,
    step: jnp.ndarray,  # scalar — current step within the window
    scale: float | None = None,
) -> jnp.ndarray:
    S, H, Dh = q.shape
    NB, BT, K = k_pool.shape[0], k_pool.shape[1], k_pool.shape[2]
    MAXB = block_table.shape[1]
    W = k_staged.shape[0]
    scale = scale if scale is not None else Dh**-0.5
    dt = jnp.bfloat16

    qs = (q.astype(jnp.float32) * scale).astype(dt)
    kp = k_pool.reshape(NB, BT, K * Dh).astype(dt)
    vp = v_pool.reshape(NB, BT, K * Dh).astype(dt)
    ks = k_staged.reshape(W, S * K * Dh).astype(dt)
    vs = v_staged.reshape(W, S * K * Dh).astype(dt)
    kn = k_new.reshape(S, 1, K * Dh).astype(dt)
    vn = v_new.reshape(S, 1, K * Dh).astype(dt)

    interpret = jax.default_backend() != "tpu"
    call = _build_paged_call(S, NB, MAXB, BT, W, H, K, Dh, interpret)
    out = call(
        lens.astype(jnp.int32),
        jnp.asarray(step, jnp.int32).reshape(1),
        block_table.astype(jnp.int32),
        qs, kp, vp, ks, vs, kn, vn,
    )
    return out.astype(q.dtype)


def paged_decode_attention_xla(
    q: jnp.ndarray,  # [S, H, Dh]
    k_new: jnp.ndarray,  # [S, K, Dh]
    v_new: jnp.ndarray,
    k_pool: jnp.ndarray,  # [NB, BT, K, Dh]
    v_pool: jnp.ndarray,
    block_table: jnp.ndarray,  # [S, MAX_BLOCKS]
    lens: jnp.ndarray,  # [S]
    k_staged: jnp.ndarray,  # [W, S, K, Dh]
    v_staged: jnp.ndarray,
    step: jnp.ndarray,
    scale: float | None = None,
) -> jnp.ndarray:
    """Reference implementation: gather each slot's pages to a contiguous
    [S, MAXB*BT] view and run masked softmax attention in fp32."""
    S, H, Dh = q.shape
    BT, K = k_pool.shape[1], k_pool.shape[2]
    MAXB = block_table.shape[1]
    W = k_staged.shape[0]
    G = H // K
    scale = scale if scale is not None else Dh**-0.5
    T = MAXB * BT

    table = jnp.clip(block_table, 0, k_pool.shape[0] - 1)
    # [S, MAXB, BT, K, Dh] → [S, T, K, Dh]
    kc = jnp.take(k_pool, table, axis=0).reshape(S, T, K, Dh).astype(jnp.float32)
    vc = jnp.take(v_pool, table, axis=0).reshape(S, T, K, Dh).astype(jnp.float32)

    qh = q.reshape(S, K, G, Dh).astype(jnp.float32) * scale
    scores = jnp.einsum("skgd,stkd->skgt", qh, kc)
    valid = jnp.arange(T)[None, :] < lens[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, _NEG_INF)

    # band [W] + self
    kb = k_staged.transpose(1, 0, 2, 3).astype(jnp.float32)  # [S, W, K, Dh]
    vb = v_staged.transpose(1, 0, 2, 3).astype(jnp.float32)
    s_band = jnp.einsum("skgd,swkd->skgw", qh, kb)
    band_valid = jnp.arange(W)[None, :] < jnp.asarray(step)[None]
    s_band = jnp.where(band_valid[:, None, None, :], s_band, _NEG_INF)
    s_self = jnp.einsum("skgd,skd->skg", qh, k_new.astype(jnp.float32))

    all_scores = jnp.concatenate(
        [scores, s_band, s_self[..., None]], axis=-1
    )  # [S, K, G, T+W+1]
    probs = jax.nn.softmax(all_scores, axis=-1)
    out = (
        jnp.einsum("skgt,stkd->skgd", probs[..., :T], vc)
        + jnp.einsum("skgw,swkd->skgd", probs[..., T : T + W], vb)
        + probs[..., T + W :] * v_new[:, :, None, :].astype(jnp.float32)
    )
    return out.reshape(S, H, Dh).astype(q.dtype)


def paged_append(
    pool: jnp.ndarray,  # [NB, BT, K, Dh]
    rows: jnp.ndarray,  # [S, R, K, Dh] — new K or V rows per slot
    block_table: jnp.ndarray,  # [S, MAX_BLOCKS]
    lens: jnp.ndarray,  # [S] — current lengths (append position)
    count: jnp.ndarray | None = None,  # [S] rows actually valid (≤ R)
) -> jnp.ndarray:
    """Scatter each slot's new rows into its pages at positions
    ``lens[s] + r``. R is small (a decode window or a prefill tail), so the
    scatter is one index computation + a single jnp scatter-add-free write.
    Rows past ``count[s]`` (or table overflow) are dropped."""
    NB, BT = pool.shape[0], pool.shape[1]
    S, R = rows.shape[0], rows.shape[1]
    MAXB = block_table.shape[1]
    pos = lens[:, None] + jnp.arange(R)[None, :]  # [S, R] absolute positions
    logical = pos // BT  # [S, R]
    offset = pos % BT
    in_range = logical < MAXB
    if count is not None:
        in_range = in_range & (jnp.arange(R)[None, :] < count[:, None])
    physical = jnp.take_along_axis(
        jnp.clip(block_table, 0, NB - 1),
        jnp.clip(logical, 0, MAXB - 1),
        axis=1,
    )  # [S, R]
    # out-of-range rows target page NB (one past the end) → dropped by the
    # scatter's FILL_OR_DROP mode
    physical = jnp.where(in_range, physical, NB)
    flat_idx = physical * BT + offset  # [S, R] into [NB*BT]
    flat_pool = pool.reshape(NB * BT, *pool.shape[2:])
    flat_pool = flat_pool.at[flat_idx.reshape(-1)].set(
        rows.reshape(S * R, *rows.shape[2:]).astype(pool.dtype),
        mode="drop",
    )
    return flat_pool.reshape(pool.shape)
