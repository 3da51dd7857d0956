"""Append-only ordered message streams connecting pipeline stages.

Re-design of the reference streams layer (/root/reference/pipelinerl/streams.py):
same topology semantics — a stream is addressed by (topic, instance, partition),
writers append dict messages, readers tail-follow from the beginning — with two
backends:

- ``files``  : one JSONL file per partition under
               ``<exp>/streams/<topic>/<instance>/<partition>.jsonl``.
               Readers tolerate torn tail lines (a writer mid-append) by only
               consuming newline-terminated lines, mirroring the reference's
               retry loop (streams.py:329-346) without re-opening the file.
- ``memory`` : in-process deques with condition variables; used by the inline
               single-process mode and tests (replaces the reference's Redis
               backend — no extra server needed on a TPU host).

Messages are plain JSON-serializable dicts.
"""

from __future__ import annotations

import io
import json
import os
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterator

_BACKEND = "files"
_HUB_ADDR: str | None = None


def set_streams_backend(backend: str, hub: str | None = None) -> None:
    """Select the process-wide default backend. ``tcp`` (cross-host streams
    through the hub server, streams_tcp.py — the Redis role) requires
    ``hub`` as "host:port"."""
    global _BACKEND, _HUB_ADDR
    if backend not in ("files", "memory", "binary", "tcp"):
        raise ValueError(f"Unknown streams backend {backend!r}")
    if backend == "tcp":
        if hub is None and _HUB_ADDR is None:
            raise ValueError("tcp streams backend requires hub='host:port'")
    if hub is not None:
        _HUB_ADDR = hub
    _BACKEND = backend


def get_streams_backend() -> str:
    return _BACKEND


def get_streams_hub() -> str | None:
    return _HUB_ADDR


@dataclass(frozen=True)
class SingleStreamSpec:
    exp_path: str
    topic: str
    instance: int = 0
    partition: int = 0


@dataclass(frozen=True)
class StreamRangeSpec:
    """A set of partitions of one topic; writes round-robin unless an explicit
    partition is requested."""

    exp_path: str
    topic: str
    instance: int = 0
    partitions: tuple[int, ...] = (0,)

    def single(self, partition: int) -> SingleStreamSpec:
        if partition not in self.partitions:
            raise ValueError(f"partition {partition} not in {self.partitions}")
        return SingleStreamSpec(self.exp_path, self.topic, self.instance, partition)


# ---------------------------------------------------------------------------
# memory backend
# ---------------------------------------------------------------------------


class _MemoryStream:
    def __init__(self) -> None:
        self.messages: list[dict] = []
        self.cond = threading.Condition()

    def append(self, msg: dict) -> None:
        with self.cond:
            self.messages.append(msg)
            self.cond.notify_all()


_MEMORY_STREAMS: dict[tuple, _MemoryStream] = {}
_MEMORY_LOCK = threading.Lock()


def _memory_stream(spec: SingleStreamSpec) -> _MemoryStream:
    key = (spec.exp_path, spec.topic, spec.instance, spec.partition)
    with _MEMORY_LOCK:
        if key not in _MEMORY_STREAMS:
            _MEMORY_STREAMS[key] = _MemoryStream()
        return _MEMORY_STREAMS[key]


def reset_memory_streams() -> None:
    with _MEMORY_LOCK:
        _MEMORY_STREAMS.clear()


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------


def stream_file_path(spec: SingleStreamSpec, backend: str = "files") -> Path:
    ext = "scf" if backend == "binary" else "jsonl"
    return (
        Path(spec.exp_path)
        / "streams"
        / spec.topic
        / str(spec.instance)
        / f"{spec.partition}.{ext}"
    )


class StreamWriter:
    """Writer for a single partition."""

    def __init__(self, spec: SingleStreamSpec, backend: str | None = None):
        self.spec = spec
        self.backend = backend or _BACKEND
        self._fh: io.TextIOBase | None = None
        self._tcp = None
        if self.backend == "files":
            path = stream_file_path(spec)
            path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(path, "a", buffering=1024 * 1024)
        elif self.backend == "binary":
            self._path = stream_file_path(spec, "binary")
            self._path.parent.mkdir(parents=True, exist_ok=True)
        elif self.backend == "tcp":
            from .streams_tcp import TcpStreamWriter

            assert _HUB_ADDR is not None, "tcp backend: call set_streams_backend first"
            self._tcp = TcpStreamWriter(spec, _HUB_ADDR)
        else:
            self._mem = _memory_stream(spec)

    def write(self, msg: dict) -> None:
        if self.backend == "files":
            assert self._fh is not None
            self._fh.write(json.dumps(msg, separators=(",", ":")) + "\n")
            self._fh.flush()
        elif self.backend == "binary":
            from .streams_binary import write_frame

            write_frame(self._path, msg)
        elif self.backend == "tcp":
            self._tcp.write(msg)
        else:
            self._mem.append(msg)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tcp is not None:
            self._tcp.close()
            self._tcp = None

    def __enter__(self) -> "StreamWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class RangeStreamWriter:
    """Round-robin writer over the partitions of a StreamRangeSpec."""

    def __init__(self, spec: StreamRangeSpec, backend: str | None = None):
        self.spec = spec
        self._writers = {
            p: StreamWriter(spec.single(p), backend) for p in spec.partitions
        }
        self._next = 0

    def write(self, msg: dict, partition: int | None = None) -> int:
        if partition is None:
            partition = self.spec.partitions[self._next % len(self.spec.partitions)]
            self._next += 1
        self._writers[partition].write(msg)
        return partition

    def close(self) -> None:
        for w in self._writers.values():
            w.close()

    def __enter__(self) -> "RangeStreamWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------


class StreamReader:
    """Tail-follow reader for a single partition.

    ``read()`` yields messages forever (blocking); ``read_available()`` yields
    what is currently present and returns.
    """

    def __init__(
        self,
        spec: SingleStreamSpec,
        backend: str | None = None,
        poll_interval: float = 0.05,
    ):
        self.spec = spec
        self.backend = backend or _BACKEND
        self.poll_interval = poll_interval
        self._offset = 0  # byte offset (files) or message index (memory)
        self._buf = b""
        # messages drained from the backend but not yet handed to the caller
        # (read_available may stop mid-chunk; nothing may be lost)
        self._pending: deque[dict] = deque()
        self._frame_reader = None
        self._tcp = None
        if self.backend == "binary":
            from .streams_binary import FrameReader

            self._frame_reader = FrameReader(stream_file_path(spec, "binary"))
        elif self.backend == "tcp":
            from .streams_tcp import TcpStreamReader

            assert _HUB_ADDR is not None, "tcp backend: call set_streams_backend first"
            self._tcp = TcpStreamReader(spec, _HUB_ADDR, poll_interval)
        self._stop = threading.Event()

    def stop(self) -> None:
        self._stop.set()
        if self._tcp is not None:
            self._tcp.stop()
        if self.backend == "memory":
            mem = _memory_stream(self.spec)
            with mem.cond:
                mem.cond.notify_all()

    def _drain_file(self) -> Iterator[dict]:
        path = stream_file_path(self.spec)
        if not path.exists():
            return
        with open(path, "rb") as f:
            f.seek(self._offset)
            chunk = f.read()
        if not chunk:
            return
        data = self._buf + chunk
        # Only consume newline-terminated lines; keep a torn tail buffered.
        last_nl = data.rfind(b"\n")
        if last_nl == -1:
            self._buf = data
            self._offset += len(chunk)
            return
        complete, self._buf = data[: last_nl + 1], data[last_nl + 1 :]
        self._offset += len(chunk)
        for line in complete.splitlines():
            if line:
                yield json.loads(line)

    def read_available(self, max_messages: int | None = None) -> Iterator[dict]:
        if self.backend == "tcp":
            assert self._tcp is not None
            self._pending.extend(self._tcp.read_available())
        elif self.backend == "binary":
            assert self._frame_reader is not None
            self._pending.extend(self._frame_reader.read_available())
        elif self.backend == "files":
            self._pending.extend(self._drain_file())
        else:
            mem = _memory_stream(self.spec)
            with mem.cond:
                msgs = mem.messages[self._offset :]
                self._offset = len(mem.messages)
            self._pending.extend(msgs)
        count = 0
        while self._pending:
            if max_messages is not None and count >= max_messages:
                return
            yield self._pending.popleft()
            count += 1

    def read(self) -> Iterator[dict]:
        while not self._stop.is_set():
            got = False
            for msg in self.read_available():
                got = True
                yield msg
            if not got:
                if self.backend == "memory":
                    mem = _memory_stream(self.spec)
                    with mem.cond:
                        if len(mem.messages) == self._offset and not self._pending:
                            mem.cond.wait(timeout=self.poll_interval)
                else:
                    time.sleep(self.poll_interval)


def write_to_stream(spec: SingleStreamSpec, msg: dict, backend: str | None = None) -> None:
    """One-shot convenience write (opens and closes a writer)."""
    with StreamWriter(spec, backend) as w:
        w.write(msg)
