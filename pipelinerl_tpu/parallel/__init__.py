"""Mesh construction and sharding for multi-chip training/inference."""

from .mesh import infer_mesh_shape, make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding,
    param_partition_specs,
    shard_batch,
    shard_params,
)
from .train_step import make_sharded_train_step  # noqa: F401
