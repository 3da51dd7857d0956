"""Sharding rules: FSDP(dp) × TP(tp) param layout, (dp, cp) batch layout.

One rule table replaces both of the reference's sharding backends
(DeepSpeed ZeRO-3 and torch FSDP, SURVEY.md §2.4) — GSPMD materializes the
gather/reduce-scatter collectives from these annotations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import RL_DATA_COLUMNS

# PartitionSpec per param leaf. Layer params carry a leading stacked-layer
# dim, sharded over "pp" (pipeline stages; size-1 axis = no-op). FSDP shards
# one big dim over "dp"; TP shards the head/ffn output dims over "tp".
_LAYER_SPECS = {
    "ln1": P("pp", None),
    "ln2": P("pp", None),
    "wq": P("pp", "dp", "tp"),
    "wk": P("pp", "dp", "tp"),
    "wv": P("pp", "dp", "tp"),
    "wo": P("pp", "tp", "dp"),
    "wgate": P("pp", "dp", "tp"),
    "wup": P("pp", "dp", "tp"),
    "wdown": P("pp", "tp", "dp"),
    "bq": P("pp", "tp"),
    "bk": P("pp", "tp"),
    "bv": P("pp", "tp"),
    "q_norm": P("pp", None),
    "k_norm": P("pp", None),
}

_TOP_SPECS = {
    "embed": P("dp", "tp"),
    "final_norm": P(None),
    "lm_head": P("dp", "tp"),
}

_VALUE_HEAD_SPECS = {"w": P("dp", None), "b": P(None)}


def param_partition_specs(params: dict) -> dict:
    """Pytree of PartitionSpec matching the params structure."""
    specs: dict = {}
    for name, value in params.items():
        if name == "layers":
            specs["layers"] = {k: _LAYER_SPECS[k] for k in value}
        elif name == "value_head":
            specs["value_head"] = dict(_VALUE_HEAD_SPECS)
        else:
            specs[name] = _TOP_SPECS[name]
    return specs


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_partition_specs(params)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, (jnp.ndarray, jax.Array)),
    )


def batch_sharding(mesh: Mesh) -> dict:
    """Batch rows shard over dp, the packed sequence dim over cp — the
    reference's contiguous context-parallel slices (types.py:145-180) as a
    sharding annotation."""
    spec = P("dp", "cp")
    fields = ("input_ids", "labels", "position_ids", "segment_ids") + RL_DATA_COLUMNS
    return {name: NamedSharding(mesh, spec) for name in fields}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    shardings = batch_sharding(mesh)
    if jax.process_count() > 1:
        # multi-host: every process holds ITS OWN dp-partition of the batch
        # (its training_data stream partition, reference preprocess.py:356-367)
        # and contributes it as the local shards of the global array
        return {
            name: jax.make_array_from_process_local_data(
                shardings[name], jnp.asarray(value)
            )
            for name, value in batch.items()
        }
    return {
        name: jax.device_put(jnp.asarray(value), shardings[name])
        for name, value in batch.items()
    }
