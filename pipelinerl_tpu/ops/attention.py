"""Attention ops: packed segment-masked causal attention (training/prefill)
and slot-batched decode attention against a KV cache.

These are the XLA reference implementations; the Pallas flash/splash kernels
in ``flash_attention.py`` / ``decode_attention.py`` are drop-in replacements
for the TPU hot path. Packed-sequence masking via segment ids replaces the
reference's flash-attn varlen path (/root/reference uses flash-attn 2 varlen +
ring-flash-attn; see SURVEY.md §2.4).

Shapes follow the "pack everything into one row" convention: a training
micro-batch is [B=1, L] with ``segment_ids`` marking sequence membership and
``position_ids`` restarting per sequence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large finite negative; -inf breaks softmax rows that are fully masked


def packed_attention_mask(
    segment_ids: jnp.ndarray,  # [B, L] int
    position_ids: jnp.ndarray,  # [B, L] int
) -> jnp.ndarray:
    """Boolean [B, 1, L, L] mask: token i may attend to token j iff they are in
    the same segment and j is at i's position or earlier. Token index order is
    causal within a pack, so comparing flat indices is equivalent to comparing
    restarting positions — we use flat indices to be robust to position_ids
    that do not restart (single unpacked sequences)."""
    B, L = segment_ids.shape
    same_segment = segment_ids[:, :, None] == segment_ids[:, None, :]
    idx = jnp.arange(L)
    causal = (idx[:, None] >= idx[None, :])[None, :, :]
    return (same_segment & causal)[:, None, :, :]


def mha_packed(
    q: jnp.ndarray,  # [B, L, H, Dh]
    k: jnp.ndarray,  # [B, L, K, Dh]
    v: jnp.ndarray,  # [B, L, K, Dh]
    segment_ids: jnp.ndarray,  # [B, L]
    position_ids: jnp.ndarray,  # [B, L]
    scale: float | None = None,
) -> jnp.ndarray:
    """Segment-masked causal attention over a packed row. GQA: H must be a
    multiple of K; kv heads are broadcast. Returns [B, L, H, Dh]."""
    B, L, H, Dh = q.shape
    K = k.shape[2]
    assert H % K == 0, f"query heads {H} not a multiple of kv heads {K}"
    groups = H // K
    scale = scale if scale is not None else Dh**-0.5

    # [B, K, G, L, Dh] query layout so each kv head serves its group.
    qh = q.reshape(B, L, K, groups, Dh).transpose(0, 2, 3, 1, 4)
    kh = k.transpose(0, 2, 1, 3)  # [B, K, L, Dh]
    vh = v.transpose(0, 2, 1, 3)

    scores = jnp.einsum(
        "bkgqd,bkvd->bkgqv", qh.astype(jnp.float32) * scale, kh.astype(jnp.float32)
    )
    mask = packed_attention_mask(segment_ids, position_ids)  # [B, 1, L, L]
    scores = jnp.where(mask[:, :, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgqv,bkvd->bkgqd", probs, vh.astype(jnp.float32))
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, L, H, Dh)
    return out.astype(q.dtype)


def decode_attention_staged(
    q: jnp.ndarray,  # [S, H, Dh] — one new query token per slot
    k_new: jnp.ndarray,  # [S, K, Dh] — the new token's key
    v_new: jnp.ndarray,  # [S, K, Dh]
    k_cache: jnp.ndarray,  # [S, T, K, Dh] — FROZEN during the decode window
    v_cache: jnp.ndarray,  # [S, T, K, Dh]
    base_lens: jnp.ndarray,  # [S] — cached tokens at window start (frozen)
    k_staged: jnp.ndarray,  # [W, S, K, Dh] — this window's earlier tokens
    v_staged: jnp.ndarray,  # [W, S, K, Dh]
    step: jnp.ndarray,  # scalar int — index within the window; rows < step valid
    scale: float | None = None,
) -> jnp.ndarray:
    """Decode attention over frozen cache + in-window staged band + self.

    The decode window never scatters into the big cache: new K/V go to a
    small [S, W, K, Dh] staging buffer at a *uniform* step index (a
    contiguous dynamic_update_slice, not a scatter), and the engine merges
    the band into the cache once per window. This removed a 1.37 ms/step
    XLA scatter on v5e (see scripts/probe_window.py).
    Returns [S, H, Dh]."""
    S, H, Dh = q.shape
    T, K = k_cache.shape[1], k_cache.shape[2]
    W = k_staged.shape[0]
    groups = H // K
    scale = scale if scale is not None else Dh**-0.5

    # matmuls run in the CACHE's native dtype with fp32 accumulation: on TPU
    # the MXU consumes bf16 directly, so the [S, T, K, Dh] cache streams at
    # native width instead of being materialized as fp32 (which doubled the
    # dominant HBM traffic of every decode step — measured 3.9 → 2.6 ms/step
    # at S=64 on v5e); fp32 caches (tests) are bit-identical to the old path
    ct = k_cache.dtype
    qh = (q.astype(jnp.float32) * scale).astype(ct).reshape(S, K, groups, Dh)
    scores_c = jnp.einsum(
        "skgd,stkd->skgt", qh, k_cache, preferred_element_type=jnp.float32
    )
    valid_c = jnp.arange(T)[None, :] < base_lens[:, None]  # [S, T]
    scores_c = jnp.where(valid_c[:, None, None, :], scores_c, _NEG_INF)

    scores_w = jnp.einsum(
        "skgd,wskd->skgw", qh, k_staged.astype(ct), preferred_element_type=jnp.float32
    )
    valid_w = (jnp.arange(W) < step)[None, None, None, :]  # same for every slot
    scores_w = jnp.where(valid_w, scores_w, _NEG_INF)

    score_self = jnp.einsum(
        "skgd,skd->skg", qh, k_new.astype(ct), preferred_element_type=jnp.float32
    )

    all_scores = jnp.concatenate(
        [scores_c, scores_w, score_self[..., None]], axis=-1
    )
    probs = jax.nn.softmax(all_scores, axis=-1)
    pc = probs.astype(ct)
    out = (
        jnp.einsum(
            "skgt,stkd->skgd", pc[..., :T], v_cache, preferred_element_type=jnp.float32
        )
        + jnp.einsum(
            "skgw,wskd->skgd",
            pc[..., T : T + W],
            v_staged.astype(ct),
            preferred_element_type=jnp.float32,
        )
        + probs[..., T + W :] * v_new[:, :, None, :].astype(jnp.float32)
    )
    return out.reshape(S, H, Dh).astype(q.dtype)


def decode_attention(
    q: jnp.ndarray,  # [S, H, Dh] — one new query token per slot
    k_new: jnp.ndarray,  # [S, K, Dh] — the new token's key
    v_new: jnp.ndarray,  # [S, K, Dh]
    k_cache: jnp.ndarray,  # [S, T, K, Dh] — previously cached keys
    v_cache: jnp.ndarray,  # [S, T, K, Dh]
    cache_lens: jnp.ndarray,  # [S] int — number of ALREADY-cached tokens per slot
    scale: float | None = None,
) -> jnp.ndarray:
    """Attention of one query per slot over its cached prefix plus itself.

    The new token's (k, v) participate without being written to the cache
    first, so the layer scan stays scatter-free; the engine writes the stacked
    per-layer (k_new, v_new) into the cache once per decode step.
    Returns [S, H, Dh].
    """
    S, H, Dh = q.shape
    T, K = k_cache.shape[1], k_cache.shape[2]
    groups = H // K
    scale = scale if scale is not None else Dh**-0.5

    qh = q.reshape(S, K, groups, Dh).astype(jnp.float32) * scale
    scores = jnp.einsum("skgd,stkd->skgt", qh, k_cache.astype(jnp.float32))
    valid = jnp.arange(T)[None, :] < cache_lens[:, None]  # [S, T]
    scores = jnp.where(valid[:, None, None, :], scores, _NEG_INF)
    score_self = jnp.einsum("skgd,skd->skg", qh, k_new.astype(jnp.float32))

    all_scores = jnp.concatenate([scores, score_self[..., None]], axis=-1)
    probs = jax.nn.softmax(all_scores, axis=-1)
    out = jnp.einsum(
        "skgt,stkd->skgd", probs[..., :T], v_cache.astype(jnp.float32)
    ) + probs[..., T:] * v_new[:, :, None, :].astype(jnp.float32)
    return out.reshape(S, H, Dh).astype(q.dtype)
