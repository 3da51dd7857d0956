"""Paged KV: block-pool allocator invariants and paged decode attention
parity against the contiguous staged reference (ops/attention) — the
foundation for the vLLM-paged-attention role (SURVEY.md §2.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.inference.block_pool import BlockPool, OutOfBlocks
from pipelinerl_tpu.ops.paged_attention import (
    paged_append,
    paged_decode_attention,
    paged_decode_attention_xla,
)

S, H, K, Dh = 4, 4, 2, 8
BT = 16  # page size (tokens)
NB = 24
MAXB = 5
W = 4


def _pool_setup(rng, lens):
    """Random pool + tables covering ``lens`` tokens per slot; returns the
    equivalent contiguous [S, T, K, Dh] caches for the reference."""
    pool = BlockPool(n_blocks=NB, block_size=BT, max_blocks_per_slot=MAXB, n_slots=S)
    k_pool = rng.normal(size=(NB, BT, K, Dh)).astype(np.float32)
    v_pool = rng.normal(size=(NB, BT, K, Dh)).astype(np.float32)
    T = MAXB * BT
    k_contig = np.zeros((S, T, K, Dh), np.float32)
    v_contig = np.zeros((S, T, K, Dh), np.float32)
    for s in range(S):
        ids = pool.allocate(s, int(lens[s]))
        for j, b in enumerate(ids):
            lo = j * BT
            hi = min(lo + BT, T)
            k_contig[s, lo:hi] = k_pool[b, : hi - lo]
            v_contig[s, lo:hi] = v_pool[b, : hi - lo]
    return pool, k_pool, v_pool, k_contig, v_contig


def _reference(q, k_new, v_new, k_contig, v_contig, lens, k_staged, v_staged, step):
    """Masked fp32 softmax over [cache(:len) | band(:step) | self]."""
    T = k_contig.shape[1]
    G = H // K
    qh = q.reshape(S, K, G, Dh).astype(np.float64) * Dh**-0.5
    kc = k_contig.astype(np.float64)
    sc = np.einsum("skgd,stkd->skgt", qh, kc)
    valid = np.arange(T)[None, :] < lens[:, None]
    sc = np.where(valid[:, None, None, :], sc, -1e30)
    sb = np.einsum("skgd,swkd->skgw", qh, k_staged.transpose(1, 0, 2, 3).astype(np.float64))
    bvalid = np.arange(W)[None, :] < step
    sb = np.where(bvalid[:, None, None, :], sb, -1e30)
    ss = np.einsum("skgd,skd->skg", qh, k_new.astype(np.float64))
    allsc = np.concatenate([sc, sb, ss[..., None]], axis=-1)
    p = np.exp(allsc - allsc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = (
        np.einsum("skgt,stkd->skgd", p[..., :T], v_contig.astype(np.float64))
        + np.einsum(
            "skgw,swkd->skgd", p[..., T : T + W],
            v_staged.transpose(1, 0, 2, 3).astype(np.float64),
        )
        + p[..., T + W :] * v_new[:, :, None, :].astype(np.float64)
    )
    return out.reshape(S, H, Dh)


@pytest.mark.parametrize("impl", [paged_decode_attention_xla, paged_decode_attention])
def test_paged_attention_matches_contiguous(impl, rng):
    lens = np.asarray([3, BT, 2 * BT + 5, MAXB * BT - 1], np.int32)
    pool, k_pool, v_pool, k_contig, v_contig = _pool_setup(rng, lens)
    q = rng.normal(size=(S, H, Dh)).astype(np.float32)
    k_new = rng.normal(size=(S, K, Dh)).astype(np.float32)
    v_new = rng.normal(size=(S, K, Dh)).astype(np.float32)
    k_staged = rng.normal(size=(W, S, K, Dh)).astype(np.float32)
    v_staged = rng.normal(size=(W, S, K, Dh)).astype(np.float32)
    step = 2

    out = impl(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_pool), jnp.asarray(v_pool),
        jnp.asarray(pool.table), jnp.asarray(lens),
        jnp.asarray(k_staged), jnp.asarray(v_staged), jnp.asarray(step),
    )
    want = _reference(q, k_new, v_new, k_contig, v_contig, lens, k_staged, v_staged, step)
    # bf16 K/V inside the kernel → relaxed tolerance
    tol = 0.05 if impl is paged_decode_attention else 2e-3
    np.testing.assert_allclose(np.asarray(out), want, atol=tol, rtol=tol)


def test_paged_append_spans_pages(rng):
    lens = np.asarray([BT - 2, 5, 0, BT], np.int32)
    pool, k_pool, _, _, _ = _pool_setup(rng, np.maximum(lens, 1))
    # extend tables to cover the appended rows
    R = 4
    for s in range(S):
        pool.extend(s, int(lens[s]) + R)
    rows = rng.normal(size=(S, R, K, Dh)).astype(np.float32)
    new_pool = paged_append(
        jnp.asarray(k_pool), jnp.asarray(rows),
        jnp.asarray(pool.table), jnp.asarray(lens),
    )
    new_pool = np.asarray(new_pool)
    for s in range(S):
        for r in range(R):
            posn = int(lens[s]) + r
            b = pool.table[s, posn // BT]
            np.testing.assert_allclose(new_pool[b, posn % BT], rows[s, r], rtol=1e-6)
    # untouched rows stay intact (spot check: first slot's first row)
    b0 = pool.table[0, 0]
    np.testing.assert_allclose(new_pool[b0, 0], k_pool[b0, 0])


def test_block_pool_fork_and_release():
    pool = BlockPool(n_blocks=10, block_size=8, max_blocks_per_slot=4, n_slots=4)
    pool.allocate(0, 20)  # 3 pages (2 full + partial)
    free_before = pool.free_blocks
    tail, shared_tokens = pool.fork(0, 1, 20)
    assert shared_tokens == 16 and tail.size == 1
    assert pool.free_blocks == free_before - 1
    # shared pages have refcount 2, the tails refcount 1
    assert pool.refs[pool.table[0, 0]] == 2
    assert pool.refs[pool.table[0, 2]] == 1  # src partial tail not shared
    assert pool.refs[tail[0]] == 1
    pool.check_invariants()
    # release the source: shared pages survive for the fork
    pool.release(0)
    assert pool.refs[pool.table[1, 0]] == 1
    pool.check_invariants()
    pool.release(1)
    assert pool.free_blocks == 10
    pool.check_invariants()


def test_block_pool_exact_boundary_fork():
    pool = BlockPool(n_blocks=6, block_size=8, max_blocks_per_slot=3, n_slots=3)
    pool.allocate(0, 16)  # exactly 2 full pages
    tail, shared = pool.fork(0, 1, 16)
    assert shared == 16 and tail.size == 0  # nothing to copy
    pool.check_invariants()


def test_block_pool_oom_and_reuse():
    pool = BlockPool(n_blocks=4, block_size=8, max_blocks_per_slot=4, n_slots=4)
    pool.allocate(0, 24)  # 3 pages
    assert not pool.can_allocate(16)
    with pytest.raises(OutOfBlocks):
        pool.allocate(1, 16)
    pool.release(0)
    assert pool.can_allocate(32)
    pool.allocate(1, 32)
    with pytest.raises(OutOfBlocks):
        pool.extend(1, 33)  # exceeds max pages per slot
    pool.check_invariants()


def test_extend_within_page_allocates_nothing():
    pool = BlockPool(n_blocks=4, block_size=8, max_blocks_per_slot=4, n_slots=2)
    pool.allocate(0, 3)
    assert pool.extend(0, 7).size == 0  # same page
    assert pool.extend(0, 9).size == 1  # crosses into a second page
    pool.check_invariants()
