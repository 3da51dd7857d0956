"""Binary stream backend: C++ framed codec + msgpack payloads.

Drop-in third backend for streams.py ("binary"): same
(topic, instance, partition) layout with ``.scf`` files instead of
``.jsonl``. Each message is one CRC-framed msgpack payload (see
native/streamcodec.cpp); numpy arrays pass through zero-copy-ish as
dtype/shape-tagged binary blobs instead of JSON number lists — packed
trainer batches serialize ~5x smaller and ~10x faster than JSONL.
"""

from __future__ import annotations

import ctypes
import functools
from pathlib import Path
from typing import Any, Iterator

import msgpack
import numpy as np

_ND_KEY = "__nd__"


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    from native.build import build  # repo-root package

    lib = ctypes.CDLL(str(build("streamcodec")))
    lib.sc_write_frame.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint64,
    ]
    lib.sc_write_frame.restype = ctypes.c_int
    lib.sc_read_frames.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.sc_read_frames.restype = ctypes.c_int64
    return lib


def _default(obj: Any):
    if isinstance(obj, np.ndarray):
        return {
            _ND_KEY: True,
            "dtype": obj.dtype.str,
            "shape": list(obj.shape),
            "data": obj.tobytes(),
        }
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"Unserializable type {type(obj)}")


def _object_hook(obj: dict) -> Any:
    if obj.get(_ND_KEY):
        arr = np.frombuffer(obj["data"], dtype=np.dtype(obj["dtype"]))
        return arr.reshape(obj["shape"]).copy()
    return obj


def encode(msg: dict) -> bytes:
    return msgpack.packb(msg, default=_default, use_bin_type=True)


def decode(payload: bytes) -> dict:
    return msgpack.unpackb(payload, object_hook=_object_hook, raw=False, strict_map_key=False)


def write_frame(path: str | Path, msg: dict) -> None:
    payload = encode(msg)
    buf = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
    rc = _lib().sc_write_frame(str(path).encode(), buf, len(payload))
    if rc != 0:
        raise OSError(-rc, f"sc_write_frame failed on {path}")


class FrameReader:
    """Stateful tail-follow reader over a framed file."""

    def __init__(self, path: str | Path, buffer_size: int = 64 * 1024 * 1024):
        self.path = str(path)
        self.offset = ctypes.c_uint64(0)
        self._buf = (ctypes.c_uint8 * buffer_size)()
        self._cap = buffer_size

    def read_available(self, max_messages: int | None = None) -> Iterator[dict]:
        lib = _lib()
        remaining = max_messages if max_messages is not None else 2**62
        while remaining > 0:
            frames = ctypes.c_uint64(0)
            n_bytes = lib.sc_read_frames(
                self.path.encode(),
                ctypes.byref(self.offset),
                self._buf,
                self._cap,
                min(remaining, 4096),
                ctypes.byref(frames),
            )
            if n_bytes < 0:
                raise OSError(-n_bytes, f"sc_read_frames failed on {self.path}")
            if frames.value == 0:
                return
            view = memoryview(self._buf)[: int(n_bytes)]
            pos = 0
            for _ in range(frames.value):
                ln = int.from_bytes(view[pos : pos + 8], "little")
                yield decode(bytes(view[pos + 8 : pos + 8 + ln]))
                pos += 8 + ln
                remaining -= 1
