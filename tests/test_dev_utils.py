"""Dev utilities: stream browser and json gatherer (reference browse.py /
gather_jsons.py analogues)."""

import json

from pipelinerl_tpu.browse import _find_topics, _iter_messages, _summarize
from pipelinerl_tpu.gather_jsons import gather_jsons
from pipelinerl_tpu.streams import SingleStreamSpec, StreamWriter


def test_browse_lists_and_reads(tmp_path):
    spec = SingleStreamSpec(str(tmp_path), "actor")
    with StreamWriter(spec) as writer:
        writer.write({"reward": 1.0, "group_id": "g0"})
        writer.write({"reward": 0.5, "group_id": "g1"})
    topics = _find_topics(tmp_path)
    assert topics == ["actor/0/0"]
    msgs = list(_iter_messages(tmp_path, "actor/0/0"))
    assert [m["group_id"] for m in msgs] == ["g0", "g1"]
    stats = _summarize(msgs)
    assert stats["messages"] == 2
    assert stats["numeric"]["reward"]["mean"] == 0.75


def test_browse_cli_main(tmp_path, capsys):
    from pipelinerl_tpu.browse import main

    spec = SingleStreamSpec(str(tmp_path), "stats")
    with StreamWriter(spec) as writer:
        writer.write({"x": 1})
    main([str(tmp_path)])
    assert "stats/0/0" in capsys.readouterr().out
    main([str(tmp_path), "stats/0/0", "--stats"])
    assert '"messages": 1' in capsys.readouterr().out


def test_gather_jsons(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "one.json").write_text(json.dumps({"id": 1}))
    (tmp_path / "two.json").write_text(json.dumps({"id": 2}))
    dst = gather_jsons(tmp_path)
    gathered = json.loads(dst.read_text())
    assert sorted(g["id"] for g in gathered) == [1, 2]
    # idempotent: a second run does not ingest its own output
    dst = gather_jsons(tmp_path)
    gathered = json.loads(dst.read_text())
    assert sorted(g["id"] for g in gathered) == [1, 2]
