"""In-flight weight transfer between trainer and inference processes.

The reference broadcasts each parameter over a dedicated NCCL group while
vLLM is briefly paused (/root/reference/pipelinerl/finetune_loop.py:234-292,
vllm1.py:155-182). The TPU-native design has three tiers:

- same process / same mesh: pointer swap (``engine.update_params``) — no
  bytes move; the engine never pauses (launch.py inline mode);
- same host, different process: this module — the trainer serializes its
  (host-local, de-sharded) param arrays into one msgpack body and POSTs it
  to each engine's ``/receive_weight_update``; the engine deserializes
  straight onto the device and pointer-swaps between decode windows;
- multi-host trainer mesh: rank 0 first gathers params to a replicated
  sharding (one ICI/DCN all-gather materialized by GSPMD via device_put),
  then ships its addressable copy as above.

No checkpoint files are written on the push path (the round-1 design wrote
a full HF checkpoint per update; at 7B that is tens of seconds of disk IO
per optimizer step — this sends device-to-wire-to-device).
"""

from __future__ import annotations

import logging
import time
from typing import Iterable

import jax
import numpy as np

from ..streams_binary import decode, encode

logger = logging.getLogger(__name__)


def _dtype_from_name(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def flatten_params(params: dict, prefix: str = "") -> Iterable[tuple[str, jax.Array]]:
    for key, value in sorted(params.items()):
        path = f"{prefix}{key}"
        if isinstance(value, dict):
            yield from flatten_params(value, prefix=f"{path}/")
        else:
            yield path, value


def unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def serialize_params(params: dict, version: int) -> bytes:
    """→ one msgpack body: {"version", "tensors": {path: {dtype, shape, data}}}.
    bf16 arrays pass through as raw bytes (ml_dtypes names the dtype)."""
    tensors = {}
    for path, arr in flatten_params(params):
        host = np.asarray(jax.device_get(arr))
        tensors[path] = {
            "dtype": host.dtype.name,
            "shape": list(host.shape),
            "data": host.tobytes(),
        }
    return encode({"version": int(version), "tensors": tensors})


def deserialize_params(body: bytes) -> tuple[dict, int]:
    msg = decode(body)
    flat = {}
    for path, t in msg["tensors"].items():
        arr = np.frombuffer(t["data"], dtype=_dtype_from_name(t["dtype"]))
        flat[path] = arr.reshape(t["shape"])
    return unflatten_params(flat), int(msg["version"])


def gather_for_push(params: dict, mesh) -> dict:
    """De-shard a sharded param tree to fully-replicated global arrays (one
    GSPMD all-gather), then return the process-local copies — what a
    cross-process push serializes. With mesh=None this is the identity."""
    if mesh is None:
        return params
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    gathered = jax.jit(lambda p: p, out_shardings=replicated)(params)
    # each process holds a full copy in its addressable shards now
    return jax.tree.map(
        lambda x: np.asarray(x.addressable_data(0)), gathered,
        is_leaf=lambda x: isinstance(x, jax.Array),
    )


def push_weights_http(
    urls: list[str], params: dict, version: int, timeout: float = 300.0
) -> None:
    """POST the serialized params to every engine server. Engines swap
    in-flight (no pause); failures raise after logging which URL broke."""
    import urllib.request

    body = serialize_params(params, version)
    t0 = time.monotonic()
    for url in urls:
        req = urllib.request.Request(
            f"{url}/receive_weight_update",
            data=body,
            headers={"Content-Type": "application/x-msgpack"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status != 200:
                raise RuntimeError(f"weight push to {url} failed: HTTP {resp.status}")
    logger.info(
        "Pushed %.1f MB of weights (v%d) to %d engine(s) in %.2fs",
        len(body) / 1e6, version, len(urls), time.monotonic() - t0,
    )
