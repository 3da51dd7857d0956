"""In-flight weight transfer between trainer and inference processes.

The reference broadcasts each parameter over a dedicated NCCL group while
vLLM is briefly paused (/root/reference/pipelinerl/finetune_loop.py:234-292,
vllm1.py:155-182). The TPU-native design has three tiers:

- same process / same mesh: pointer swap (``engine.update_params``) — no
  bytes move; the engine never pauses (launch.py inline mode);
- same host, different process: this module — the trainer serializes its
  (host-local, de-sharded) param arrays into one header+blob body and POSTs
  it to each engine's ``/receive_weight_update`` (all engines in parallel,
  mirroring the reference's thread-pool fan-out at finetune_loop.py:183-198);
  the engine's transfer thread stages the arrays onto the device while
  decoding continues, then the engine thread pointer-swaps;
- multi-host trainer mesh: rank 0 first gathers params to a replicated
  sharding (one ICI/DCN all-gather materialized by GSPMD via device_put),
  then ships its addressable copy as above.

Wire format (``PWT3``): a tiny msgpack header followed by the raw tensor
bytes, GROUPED BY DTYPE. Two properties matter:

- deserialization is a handful of ``np.frombuffer`` views into the body —
  microseconds of GIL — unlike the round-3 format which msgpack-unpacked
  the full multi-GB body in one C call with the GIL held, starving the
  engine thread (BENCH_r03 measured decode utilization 0.008 during a
  push);
- each dtype group is one contiguous typed run, so the engine can ship it
  to the device as ONE 1-D typed transfer and carve tensors with on-device
  slices+reshapes. Per-leaf device_put calls collapse ~25x behind in-flight
  decode windows (round-4 probe: 219 leaves = 32 s vs 1.1 s for the same
  bytes in one put), and byte-pair bitcasts are unusable on TPU (a
  [n, 2] u8 operand gets layout-padded 64x).
"""

from __future__ import annotations

import logging
import struct
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable

import jax
import msgpack
import numpy as np

logger = logging.getLogger(__name__)

_MAGIC = b"PWT3"


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


def _byte_view(host: np.ndarray) -> memoryview:
    """Flat uint8 view of an array's bytes without copying (works for
    ml_dtypes like bfloat16 that reject a direct memoryview)."""
    if not host.flags["C_CONTIGUOUS"]:
        host = np.ascontiguousarray(host)
    return memoryview(host.reshape(-1).view(np.uint8))


def serialize_params(params: dict, version: int) -> bytes:
    """→ ``PWT3 | u64 header_len | msgpack header | dtype-grouped blob``.

    Header: ``{"version", "groups": [{"dtype", "byte_offset", "count"}],
    "tensors": [{"name", "dtype", "shape", "elem_offset"}]}`` — tensor
    elem_offsets index into their dtype group's typed run."""
    by_dtype: dict[str, list[tuple[str, np.ndarray]]] = {}
    for path, arr in flatten_params(params):
        host = np.asarray(jax.device_get(arr))
        by_dtype.setdefault(host.dtype.name, []).append((path, host))
    groups = []
    tensors = []
    chunks: list = []
    byte_offset = 0
    for dtype_name in sorted(by_dtype):
        items = by_dtype[dtype_name]
        elem_offset = 0
        for path, host in items:
            tensors.append(
                {
                    "name": path,
                    "dtype": dtype_name,
                    "shape": list(host.shape),
                    "elem_offset": elem_offset,
                }
            )
            chunks.append(_byte_view(host))
            elem_offset += host.size
        groups.append(
            {"dtype": dtype_name, "byte_offset": byte_offset, "count": elem_offset}
        )
        byte_offset += elem_offset * np.dtype(_dtype_from_name(dtype_name)).itemsize
    header = msgpack.packb(
        {"version": int(version), "groups": groups, "tensors": tensors}
    )
    return b"".join([_MAGIC, struct.pack("<Q", len(header)), header, *chunks])


def parse_push_header(body: bytes) -> tuple[list[dict], list[dict], int, int]:
    """→ (dtype groups, tensor entries, version, blob base offset)."""
    if body[:4] != _MAGIC:
        raise ValueError("not a PWT3 weight-push body")
    (header_len,) = struct.unpack_from("<Q", body, 4)
    header = msgpack.unpackb(body[12 : 12 + header_len], raw=False)
    return header["groups"], header["tensors"], int(header["version"]), 12 + header_len


def deserialize_params(body: bytes) -> tuple[dict, int]:
    """Zero-copy: each tensor is an ``np.frombuffer`` view into ``body``."""
    groups, tensors, version, base = parse_push_header(body)
    group_off = {g["dtype"]: g["byte_offset"] for g in groups}
    flat = {}
    for t in tensors:
        dt = _dtype_from_name(t["dtype"])
        count = int(np.prod(t["shape"], dtype=np.int64)) if t["shape"] else 1
        off = base + group_off[t["dtype"]] + t["elem_offset"] * dt.itemsize
        arr = np.frombuffer(body, dtype=dt, count=count, offset=off)
        flat[t["name"]] = arr.reshape(t["shape"])
    return unflatten_params(flat), int(version)


def parallel_device_put(x, streams: int = 4):
    """Host→device transfer of one array as ``streams`` concurrent sub-puts
    (split along axis 0) concatenated on device. On link stacks that
    throttle a single stream (the tunneled dev chip ages to ~0.04 GB/s
    serial; ~2x with four streams — round-4/5 probes) this roughly halves
    multi-GB staging; on healthy PCIe DMA it is harmless. Used by both the
    engine's paced push chunks and hf_loader's checkpoint staging."""
    import threading

    n = x.shape[0]
    if n < streams:
        dev = jax.device_put(x)
        dev.block_until_ready()
        return dev
    bounds = [(i * n // streams, (i + 1) * n // streams) for i in range(streams)]
    parts: list = [None] * streams

    def put(i: int, lo: int, hi: int) -> None:
        parts[i] = jax.device_put(x[lo:hi])
        parts[i].block_until_ready()

    threads = [
        threading.Thread(target=put, args=(i, lo, hi))
        for i, (lo, hi) in enumerate(bounds)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    import jax.numpy as jnp

    dev = jnp.concatenate(parts, axis=0)
    dev.block_until_ready()
    return dev


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


def _push_one(url: str, body: bytes, timeout: float) -> None:
    import urllib.request

    req = urllib.request.Request(
        f"{url}/receive_weight_update",
        data=body,
        headers={"Content-Type": "application/x-msgpack"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if resp.status != 200:
            raise RuntimeError(f"weight push to {url} failed: HTTP {resp.status}")


def push_weights_http(
    urls: list[str], params: dict, version: int, timeout: float | None = None
) -> None:
    """POST the serialized params to every engine server IN PARALLEL
    (reference fan-out: finetune_loop.py:183-198). Engines swap in-flight
    (no pause); any failure raises after all pushes settle.

    The default timeout is size-aware and strictly LONGER than the server's
    600 s wait-for-swap deadline in /receive_weight_update: paced transfers
    deliberately stretch wall time (~10x serial at duty 0.9), so a fixed
    client timeout below the server's would abort the POST while the engine
    still applies the update — the trainer would crash on a push that in
    fact succeeds. Floor 660 s, plus 1 s per 50 MB of body for slow links."""
    body = serialize_params(params, version)
    if timeout is None:
        timeout = 660.0 + len(body) / 50e6
    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=max(1, len(urls))) as pool:
        futures = {pool.submit(_push_one, url, body, timeout): url for url in urls}
        errors = []
        for fut, url in futures.items():
            try:
                fut.result()
            except Exception as exc:  # surface every broken URL, then raise
                logger.error("weight push to %s failed: %s", url, exc)
                errors.append((url, exc))
    if errors:
        raise RuntimeError(f"weight push failed for {[u for u, _ in errors]}")
    logger.info(
        "Pushed %.1f MB of weights (v%d) to %d engine(s) in %.2fs",
        len(body) / 1e6, version, len(urls), time.monotonic() - t0,
    )
