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


def test_degenerate_abort_rollouts_never_become_samples(tmp_path):
    """An over-length prompt the engine resolves as finish_reason="abort"
    with zero tokens must never flow into a training group (the reference
    retries abort-shaped completions, async_llm.py:61-168). The actor
    retries the rollout, then drops the whole group and counts it."""
    import asyncio

    from pipelinerl_tpu.state import TrainerState
    from pipelinerl_tpu.types import RolloutResult, TrainingText

    calls = {"n": 0}

    async def degenerate_policy(cfg, llm, problem, session):
        calls["n"] += 1
        text = TrainingText(
            text="x",
            n_predicted=0,
            input_ids=[1, 2, 3],
            labels=[-100, -100, -100],
            logprobs=[],
            finished=True,
            finish_reason="abort",
            prompt_tokens=3,
            output_tokens=0,
        )
        return RolloutResult(
            training_texts=[text],
            metrics={"reward": 0.0, "success": False, "no_error": True,
                     "no_answer": True},
            dataset_name="d",
        )

    cfg = Config(
        {
            "seed": 0,
            "attempts": 2,
            "actor": {"max_rollout_retries": 1, "max_parallel_groups": 2},
            "finetune": {"samples_per_step": 4},
            "llm": {"parameters": {}},
        }
    )
    state = TrainerState(str(tmp_path))
    state.debug_mode_init()
    loop = ActorLoop(
        cfg, [object()], [{"task": 0}], state, str(tmp_path), degenerate_policy
    )
    stats = asyncio.run(loop.run(total_groups=2))
    assert stats.samples_written == 0
    assert stats.groups_completed == 0
    assert stats.dropped_degenerate_groups == 2
    assert stats.aborted_rollout_retries > 0
    # each rollout was retried once (2 groups x 2 attempts x 2 tries)
    assert calls["n"] == 8
    actor_stream = tmp_path / "streams" / "actor"
    rows = []
    if actor_stream.exists():
        for f in actor_stream.rglob("*.jsonl"):
            rows += [l for l in f.read_text().splitlines() if l.strip()]
    assert rows == []


def test_model_version_stamped_from_generation_not_completion():
    """The sample's model_version must be the version the ENGINE generated
    under (metadata stamped by make_training_text), NOT the trainer's
    current version at group-completion time — the latter made every lag
    metric read ~0 (round-4 find)."""
    import asyncio

    from pipelinerl_tpu.types import BaseMetrics, RolloutResult, TrainingText

    loop = object.__new__(ActorLoop)
    loop.cfg = Config({"seed": 0, "actor": {"max_rollout_retries": 0}})
    loop._active_per_llm = [0]
    loop.llms = [object()]

    class FakeState:
        propagated_weight_version = 500  # trainer has long moved on

    loop.trainer_state = FakeState()

    async def fake_policy(cfg, llm, problem, session):
        return RolloutResult(
            training_texts=[
                TrainingText(input_ids=[1, 2], labels=[-100, 2],
                             metadata={"model_version": 120}),
                TrainingText(input_ids=[1, 3], labels=[-100, 3],
                             metadata={"model_version": 118}),
            ],
            metrics=BaseMetrics(reward=1.0, success=1, no_error=True, no_answer=False),
        )

    loop.rollout_policy = staticmethod(fake_policy)
    from pipelinerl_tpu.actor import ActorStats

    loop.stats = ActorStats()
    loop._pick_llm = lambda: 0
    result = asyncio.run(loop._run_one_rollout({"task": "x"}, "g0", 0))
    assert result.model_version == 118  # min generation version, not 500
