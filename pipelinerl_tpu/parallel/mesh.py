"""Device-mesh construction with the framework's axis convention.

Axes (SURVEY.md §2.5 mapped to TPU):
- ``dp``  : data parallelism; params/optimizer state fully sharded over it
            (the ZeRO-3 / FSDP analogue — reference DeepSpeed stage 3,
            conf/deepspeed/deepspeed_stage3_bf16.json);
- ``cp``  : context parallelism — the packed sequence dim is sharded here
            (the reference's ring-flash-attn seq_parallel,
            finetune_loop.py:507-517);
- ``tp``  : tensor parallelism — head/ffn dims sharded (the reference's
            vLLM tensor-parallel-size, conf/base.yaml:70);
- ``pp``  : pipeline parallelism — the STACKED LAYER dim of the scan-over-
            layers params (and the KV cache) is sharded here, spreading
            weights and cache across stages; GSPMD moves the activations
            stage-to-stage inside the layer scan (the reference's vLLM
            pipeline-parallel-size, conf/base.yaml:71 — never enabled there;
            trainer-side PP does not exist in the reference).

All collectives are inserted by GSPMD from the sharding annotations —
no hand-written NCCL-style groups.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "cp", "tp", "pp")


def infer_mesh_shape(
    n_devices: int, tp: int | None = None, cp: int | None = None,
    pp: int | None = None,
) -> tuple[int, int, int, int]:
    """Choose (dp, cp, tp, pp) for n_devices. Explicit tp/cp/pp are honored;
    the rest goes to dp."""
    tp = tp or 1
    cp = cp or 1
    pp = pp or 1
    if n_devices % (tp * cp * pp) != 0:
        raise ValueError(
            f"{n_devices} devices not divisible by tp*cp*pp={tp * cp * pp}"
        )
    return (n_devices // (tp * cp * pp), cp, tp, pp)


def make_mesh(
    n_devices: int | None = None,
    tp: int = 1,
    cp: int = 1,
    pp: int = 1,
    devices: list | None = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    shape = infer_mesh_shape(len(devices), tp=tp, cp=cp, pp=pp)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)
