"""Actor problem-stream semantics: a small problem set must CYCLE (with
per-epoch reshuffle) rather than starve after one pass — the reference actor
iterates its dataset for the whole run (round-1 regression: `_problem_stream`
returned after a single epoch when total_groups was unbounded)."""

import itertools

from pipelinerl_tpu.actor import ActorLoop
from pipelinerl_tpu.config import Config


def make_loop(problems):
    loop = object.__new__(ActorLoop)
    loop.problems = list(problems)
    loop.cfg = Config({"seed": 0})
    return loop


def test_problem_stream_cycles_past_one_epoch():
    problems = [{"task": i} for i in range(3)]
    loop = make_loop(problems)
    taken = list(itertools.islice(loop._problem_stream(None), 10))
    assert len(taken) == 10  # > one epoch of 3
    # every problem keeps appearing
    for p in problems:
        assert taken.count(p) >= 3


def test_problem_stream_respects_total_groups():
    loop = make_loop([{"task": i} for i in range(4)])
    taken = list(loop._problem_stream(7))
    assert len(taken) == 7


def test_problem_stream_reshuffles_between_epochs():
    problems = [{"task": i} for i in range(20)]
    loop = make_loop(problems)
    taken = list(itertools.islice(loop._problem_stream(None), 60))
    epochs = [taken[0:20], taken[20:40], taken[40:60]]
    for epoch in epochs:
        assert sorted(e["task"] for e in epoch) == list(range(20))
    assert epochs[0] != epochs[1] or epochs[1] != epochs[2]


def test_problem_stream_empty_set_terminates():
    loop = make_loop([])
    assert list(loop._problem_stream(None)) == []
