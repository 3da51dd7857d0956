"""Cross-host stream transport: the TCP hub (streams_tcp.py) must preserve
the stream contract of the file backends — ordered append, tail-follow,
late-joiner full replay — across OS processes (the Redis role, reference
streams.py:103-232)."""

import os
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from pipelinerl_tpu.streams import (
    SingleStreamSpec,
    StreamReader,
    StreamWriter,
    set_streams_backend,
)
from pipelinerl_tpu.streams_tcp import StreamHub


@pytest.fixture()
def hub():
    h = StreamHub(host="127.0.0.1", port=0)
    h.start()
    yield h
    h.stop()


def _spec(topic="t"):
    return SingleStreamSpec(exp_path="/exp", topic=topic)


def test_append_read_roundtrip(hub):
    addr = f"127.0.0.1:{hub.port}"
    set_streams_backend("tcp", hub=addr)
    try:
        with StreamWriter(_spec()) as w:
            for i in range(20):
                w.write({"i": i, "arr": np.arange(4, dtype=np.int32) + i})
        reader = StreamReader(_spec())
        msgs = list(reader.read_available())
        assert [m["i"] for m in msgs] == list(range(20))
        np.testing.assert_array_equal(msgs[3]["arr"], np.arange(4, dtype=np.int32) + 3)
    finally:
        set_streams_backend("files")


def test_late_joiner_replays_history(hub):
    addr = f"127.0.0.1:{hub.port}"
    set_streams_backend("tcp", hub=addr)
    try:
        with StreamWriter(_spec("late")) as w:
            w.write({"i": 0})
            w.write({"i": 1})
        r1 = StreamReader(_spec("late"))
        assert [m["i"] for m in r1.read_available()] == [0, 1]
        with StreamWriter(_spec("late")) as w:
            w.write({"i": 2})
        # tail-follow sees only the new message; a fresh reader sees all
        assert [m["i"] for m in r1.read_available()] == [2]
        r2 = StreamReader(_spec("late"))
        assert [m["i"] for m in r2.read_available()] == [0, 1, 2]
    finally:
        set_streams_backend("files")


def test_blocking_read_wakes_on_append(hub):
    addr = f"127.0.0.1:{hub.port}"
    set_streams_backend("tcp", hub=addr)
    try:
        reader = StreamReader(_spec("blk"), poll_interval=0.5)
        got = []

        def consume():
            for msg in reader.read():
                got.append(msg["i"])
                if len(got) >= 3:
                    reader.stop()
                    return

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        time.sleep(0.1)
        with StreamWriter(_spec("blk")) as w:
            for i in range(3):
                w.write({"i": i})
        t.join(timeout=10)
        assert got == [0, 1, 2]
    finally:
        set_streams_backend("files")


def test_cross_process_producer(hub, tmp_path):
    """A separate OS process writes through the hub; this process tails."""
    addr = f"127.0.0.1:{hub.port}"
    producer = tmp_path / "producer.py"
    producer.write_text(
        "from pipelinerl_tpu.streams import SingleStreamSpec, StreamWriter, set_streams_backend\n"
        f"set_streams_backend('tcp', hub='{addr}')\n"
        "spec = SingleStreamSpec(exp_path='/exp', topic='xproc')\n"
        "with StreamWriter(spec) as w:\n"
        "    for i in range(50):\n"
        "        w.write({'i': i})\n"
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": os.getcwd()}
    proc = subprocess.run(
        [sys.executable, str(producer)], env=env, capture_output=True, text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    set_streams_backend("tcp", hub=addr)
    try:
        reader = StreamReader(SingleStreamSpec(exp_path="/exp", topic="xproc"))
        msgs = [m["i"] for m in reader.read_available()]
        assert msgs == list(range(50))
    finally:
        set_streams_backend("files")


def test_hub_maxlen_trims_and_readers_resume():
    """Retention bound (the reference trims Redis streams at maxlen 1M,
    streams.py:120-192): the hub keeps at most ``maxlen`` entries per key;
    a reader behind the trim horizon resumes at the oldest retained entry
    instead of stalling or erroring."""
    h = StreamHub(host="127.0.0.1", port=0, maxlen=10)
    h.start()
    try:
        addr = f"127.0.0.1:{h.port}"
        set_streams_backend("tcp", hub=addr)
        reader = StreamReader(_spec("trim"))
        with StreamWriter(_spec("trim")) as w:
            for i in range(25):
                w.write({"i": i})
        # late reader (offset 0 < base 15) gets exactly the retained window
        msgs = list(reader.read_available())
        assert [m["i"] for m in msgs] == list(range(15, 25))
        # memory actually bounded
        log = h._logs["trim/0/0"]
        assert len(log.payloads) == 10 and log.base == 15
        # a caught-up reader keeps tailing normally across further trims
        with StreamWriter(_spec("trim")) as w:
            for i in range(25, 31):
                w.write({"i": i})
        more = list(reader.read_available())
        assert [m["i"] for m in more] == list(range(25, 31))
    finally:
        set_streams_backend("files")
        h.stop()
