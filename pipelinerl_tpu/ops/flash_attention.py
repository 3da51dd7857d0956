"""Flash attention for packed rows — TPU Pallas (splash) with segment ids.

Replaces the reference's flash-attn-2 varlen path (SURVEY.md §2.4:
flash-attn CUDA + ring-flash-attn monkey-patching) with the TPU-native
splash-attention Pallas kernel from JAX: block-sparse causal structure, GQA
(q [H, L, D] vs kv [K, L, D]), segment-id masking for packed sequences, and
a fused custom-VJP backward — O(L) memory instead of the [L, L] score
materialization of the XLA reference implementation (ops/attention.py).

Contract matches ``ops.attention.mha_packed``: causality is flat-index
within the packed row, and-ed with same-segment.

Note: inside a GSPMD-partitioned program a Pallas call is not automatically
partitioned — use this path when the attention operands are unsharded along
(L, heads) (single-chip trainer, engine prefill, or under shard_map);
otherwise keep the XLA path which GSPMD shards freely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as _sk,
)
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_mask as _sm,
)


@functools.lru_cache(maxsize=16)
def _get_kernel(num_heads: int, q_len: int, kv_len: int, interpret: bool):
    mask = _sm.MultiHeadMask(
        [_sm.CausalMask((q_len, kv_len)) for _ in range(num_heads)]
    )
    block = min(512, q_len, kv_len)
    block_sizes = _sk.BlockSizes.get_default()
    block_sizes = _sk.BlockSizes(
        block_q=min(block_sizes.block_q, block),
        block_kv_compute=min(block_sizes.block_kv_compute, block),
        block_kv=min(block_sizes.block_kv, block),
        block_q_dkv=min(block_sizes.block_q_dkv or block, block),
        block_kv_dkv=min(block_sizes.block_kv_dkv or block, block),
        block_kv_dkv_compute=min(block_sizes.block_kv_dkv_compute or block, block),
        block_q_dq=min(block_sizes.block_q_dq or block, block),
        block_kv_dq=min(block_sizes.block_kv_dq or block, block),
    )
    return _sk.make_splash_mha(
        mask,
        head_shards=1,
        q_seq_shards=1,
        block_sizes=block_sizes,
        interpret=interpret,
    )


def mha_packed_flash(
    q: jnp.ndarray,  # [B, L, H, Dh]
    k: jnp.ndarray,  # [B, L, K, Dh]
    v: jnp.ndarray,  # [B, L, K, Dh]
    segment_ids: jnp.ndarray,  # [B, L]
    position_ids: jnp.ndarray | None = None,  # unused (flat-index causality)
    scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    B, L, H, Dh = q.shape
    scale = scale if scale is not None else Dh**-0.5
    # The kernel object (mask-info arrays included) must be built OUTSIDE any
    # active trace: it is cached and reused across jit/grad traces, and
    # arrays captured as tracers would leak (UnexpectedTracerError).
    with jax.ensure_compile_time_eval():
        kernel = _get_kernel(H, L, L, interpret)

    def one_row(qb, kb, vb, segb):
        seg = _sk.SegmentIds(q=segb, kv=segb)
        out = kernel(
            (qb * scale).transpose(1, 0, 2),  # [H, L, Dh]
            kb.transpose(1, 0, 2),  # [K, L, Dh]
            vb.transpose(1, 0, 2),
            segment_ids=seg,
        )
        return out.transpose(1, 0, 2)  # [L, H, Dh]

    if B == 1:
        return one_row(q[0], k[0], v[0], segment_ids[0])[None]
    return jnp.stack([one_row(q[i], k[i], v[i], segment_ids[i]) for i in range(B)])
