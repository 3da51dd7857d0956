"""Multi-host initialization (jax.distributed) and DCN-aware meshes.

Reference analogue: accelerate/DeepSpeed multi-node rendezvous + hostfiles
(reference launch.py:317-366, world.py:44-49). On TPU pods the runtime
handles rendezvous: each host process calls ``jax.distributed.initialize``
and sees the global device set; the mesh maps dp over DCN (hosts) and
cp/tp over ICI (within-host chips) so the heavy collectives ride ICI
(jax-ml.github.io/scaling-book recipe).

Untested on real multi-host in this environment (single tunneled chip) —
exercised via the virtual CPU mesh path in tests; the initialize call is
environment-driven and inert on single host.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import AXES

logger = logging.getLogger(__name__)


def maybe_initialize_distributed(cfg=None) -> bool:
    """Initialize jax.distributed when a multi-host environment is declared
    (env vars or cfg.multihost). Returns True when running multi-host."""
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = os.environ.get("JAX_NUM_PROCESSES")
    process_id = os.environ.get("JAX_PROCESS_ID")
    if cfg is not None:
        mh = cfg.get("multihost") if hasattr(cfg, "get") else None
        if mh:
            coordinator = coordinator or mh.get("coordinator_address")
            num_processes = num_processes or mh.get("num_processes")
            process_id = process_id or mh.get("process_id")
    if not coordinator and not num_processes:
        # TPU pod runtimes auto-discover; initialize() is safe to call with
        # no args there, but on single-host it would fail — skip.
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes) if num_processes else None,
        process_id=int(process_id) if process_id else None,
    )
    logger.info(
        "jax.distributed initialized: process %s/%s, %d local / %d global devices",
        process_id,
        num_processes,
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def make_multihost_mesh(tp: int = 1, cp: int = 1) -> Mesh:
    """Global (dp, cp, tp) mesh with cp×tp confined to each host's chips
    (ICI) and dp spanning hosts (DCN)."""
    local = jax.local_device_count()
    if local % (tp * cp) != 0:
        raise ValueError(
            f"tp*cp={tp * cp} must divide local device count {local} "
            "(cp/tp collectives must ride ICI, not DCN)"
        )
    n = jax.device_count()
    dp = n // (tp * cp)
    devices = np.asarray(jax.devices()).reshape(dp, cp, tp, 1)
    return Mesh(devices, AXES)
