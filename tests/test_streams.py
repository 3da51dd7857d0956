import threading
import time

import pytest

from pipelinerl_tpu.streams import (
    RangeStreamWriter,
    SingleStreamSpec,
    StreamRangeSpec,
    StreamReader,
    StreamWriter,
    reset_memory_streams,
    stream_file_path,
)


@pytest.fixture(params=["files", "memory"])
def backend(request):
    reset_memory_streams()
    return request.param


def test_write_read_available(tmp_path, backend):
    spec = SingleStreamSpec(str(tmp_path), "actor")
    with StreamWriter(spec, backend) as w:
        for i in range(5):
            w.write({"i": i})
    reader = StreamReader(spec, backend)
    msgs = list(reader.read_available())
    assert [m["i"] for m in msgs] == list(range(5))
    # nothing new
    assert list(reader.read_available()) == []
    # append more → reader picks up from where it left
    with StreamWriter(spec, backend) as w:
        w.write({"i": 5})
    assert [m["i"] for m in reader.read_available()] == [5]


def test_torn_line_not_consumed(tmp_path):
    spec = SingleStreamSpec(str(tmp_path), "actor")
    path = stream_file_path(spec)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        f.write('{"i": 0}\n{"i": 1')  # torn second line
    reader = StreamReader(spec, "files")
    assert [m["i"] for m in reader.read_available()] == [0]
    with open(path, "a") as f:
        f.write("}\n")
    assert [m["i"] for m in reader.read_available()] == [1]


def test_blocking_read_follows(tmp_path, backend):
    spec = SingleStreamSpec(str(tmp_path), "t")
    reader = StreamReader(spec, backend, poll_interval=0.01)
    got = []

    def consume():
        for msg in reader.read():
            got.append(msg["i"])
            if msg["i"] == 2:
                reader.stop()
                break

    t = threading.Thread(target=consume)
    t.start()
    with StreamWriter(spec, backend) as w:
        for i in range(3):
            w.write({"i": i})
            time.sleep(0.02)
    t.join(timeout=5)
    assert got == [0, 1, 2]


def test_round_robin_partitions(tmp_path, backend):
    spec = StreamRangeSpec(str(tmp_path), "training_data", partitions=(0, 1, 2))
    with RangeStreamWriter(spec, backend) as w:
        for i in range(6):
            w.write({"i": i})
    for p in range(3):
        reader = StreamReader(spec.single(p), backend)
        assert [m["i"] for m in reader.read_available()] == [p, p + 3]


def test_explicit_partition(tmp_path, backend):
    spec = StreamRangeSpec(str(tmp_path), "training_data", partitions=(0, 1))
    with RangeStreamWriter(spec, backend) as w:
        w.write({"i": 100}, partition=1)
    assert list(StreamReader(spec.single(0), backend).read_available()) == []
    assert [m["i"] for m in StreamReader(spec.single(1), backend).read_available()] == [100]


def test_read_available_max_messages_no_loss(tmp_path, backend):
    """Stopping mid-chunk must not drop the rest of the drained messages
    (regression: the trainer reads one batch at a time from bursts)."""
    spec = SingleStreamSpec(str(tmp_path), "t2")
    with StreamWriter(spec, backend) as w:
        for i in range(10):
            w.write({"i": i})
    reader = StreamReader(spec, backend)
    got = []
    for _ in range(10):
        got.extend(m["i"] for m in reader.read_available(max_messages=1))
    assert got == list(range(10))


def test_binary_backend_roundtrip(tmp_path):
    import numpy as np

    spec = SingleStreamSpec(str(tmp_path), "bin")
    msg = {
        "group_id": "g1",
        "n": 7,
        "x": 1.5,
        "ids": np.arange(100, dtype=np.int32),
        "floats": np.linspace(0, 1, 50, dtype=np.float32).reshape(2, 25),
        "nested": {"list": [1, 2, 3], "s": "héllo"},
    }
    with StreamWriter(spec, "binary") as w:
        for i in range(5):
            w.write({**msg, "i": i})
    reader = StreamReader(spec, "binary")
    out = list(reader.read_available())
    assert len(out) == 5
    np.testing.assert_array_equal(out[0]["ids"], msg["ids"])
    np.testing.assert_array_equal(out[3]["floats"], msg["floats"])
    assert out[4]["i"] == 4 and out[4]["nested"]["s"] == "héllo"
    # incremental follow + max_messages no-loss
    with StreamWriter(spec, "binary") as w:
        w.write({"i": 5})
        w.write({"i": 6})
    got = [m["i"] for m in reader.read_available(max_messages=1)]
    got += [m["i"] for m in reader.read_available()]
    assert got == [5, 6]


def test_binary_backend_torn_tail(tmp_path):
    from pipelinerl_tpu.streams import stream_file_path

    spec = SingleStreamSpec(str(tmp_path), "torn")
    with StreamWriter(spec, "binary") as w:
        w.write({"i": 0})
    path = stream_file_path(spec, "binary")
    # append a torn frame: valid header promising more bytes than exist
    import struct

    with open(path, "ab") as f:
        f.write(b"SCF1" + struct.pack("<Q", 9999) + b"\x00\x00\x00\x00" + b"partial")
    reader = StreamReader(spec, "binary")
    assert [m["i"] for m in reader.read_available()] == [0]  # torn tail ignored
