"""Context-parallel attention: shard the packed sequence over the cp mesh
axis with O(L/cp) attention memory per device.

This is the TPU-native replacement for the reference's ring-flash-attn
(/root/reference/pipelinerl/finetune_loop.py:507-517: NCCL subgroups +
monkey-patched HF attention). Design: Q stays sharded along cp; K/V and kv
segment ids are all-gathered over cp (under GQA the kv heads are few, so the
gathered K/V is a small transient — e.g. 32k tokens x 2 kv heads x 64 dims
in bf16 is 16 MB/layer); each device then runs the blockwise flash kernel
(``ops/blockwise_attention.py``) over its rows with a global-index causal
mask (``q_offset = cp_rank * L/cp``). The all-gather rides ICI; attention
FLOPs and score memory are 1/cp per device. An explicit collective-permute
ring would hide the gather behind compute but saves no memory here and costs
cp partial launches — the gathered-KV form lets XLA overlap it instead.

Use via ``make_cp_attention(mesh)`` and pass the result as ``attn_impl`` to
``models.transformer.forward`` (it accepts a callable). Head-axis handling:
q/k/v arrive with heads sharded over tp by GSPMD; the shard_map keeps that
sharding when the kv heads divide tp (each device then holds whole GQA
groups), otherwise it gathers heads (tp stays correct, just less sharded —
the reference has no tp on the trainer at all).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.blockwise_attention import mha_packed_blockwise


def make_cp_attention(
    mesh: Mesh,
    *,
    num_kv_heads: int,
    dp_axis: str = "dp",
    cp_axis: str = "cp",
    tp_axis: str = "tp",
    block_kv: int = 1024,
    impl: str = "blockwise",
):
    """Returns attn(q, k, v, segment_ids, position_ids) -> [B, L, H, Dh]
    matching the ``mha_packed`` contract, computed context-parallel over
    ``cp_axis``.

    ``impl="gqa"`` runs the GQA-folded Pallas kernel inside the shard_map
    (ops/gqa_attention.py — 2x over blockwise at 16k single-chip from
    segment-disjoint block skipping; shard_map parity is test-covered in
    interpret mode, tests/test_cp_attention.py). It stays OPT-IN
    (finetune.cp_attn_impl) until a multi-chip TPU run validates
    Mosaic-under-shard_map on real hardware — the default blockwise path
    is proven at cp=8/32k."""
    tp = mesh.shape.get(tp_axis, 1)
    head_axis = tp_axis if (tp > 1 and num_kv_heads % tp == 0) else None
    q_spec = P(dp_axis, cp_axis, head_axis, None)
    kv_spec = P(dp_axis, cp_axis, head_axis, None)
    seg_spec = P(dp_axis, cp_axis)

    def local(qb, kb, vb, segb):
        kg = jax.lax.all_gather(kb, cp_axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(vb, cp_axis, axis=1, tiled=True)
        segg = jax.lax.all_gather(segb, cp_axis, axis=1, tiled=True)
        q_offset = jax.lax.axis_index(cp_axis) * qb.shape[1]
        if impl == "gqa":
            from ..ops.gqa_attention import mha_packed_gqa

            return mha_packed_gqa(qb, kg, vg, segb, segg, q_offset)
        return mha_packed_blockwise(
            qb, kg, vg, segb, segg, q_offset, None, block_kv
        )

    extra = {}
    if impl == "gqa":
        # the Pallas call's out_shape carries no varying-mesh-axes info;
        # skip the vma check (outputs vary over cp/tp exactly like q)
        extra["check_vma"] = False
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, seg_spec),
        out_specs=q_spec,
        **extra,
    )

    def attn(q, k, v, segment_ids, position_ids=None, scale=None):
        del position_ids, scale  # flat-index causality; default scale
        return sharded(q, k, v, segment_ids)

    return attn
