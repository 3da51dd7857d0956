"""Math verifier, reward table, datasets, and the verifier HTTP service."""

import asyncio

import pytest

from pipelinerl_tpu.domains.math.load_datasets import load_datasets
from pipelinerl_tpu.domains.math.rollouts import (
    RewardTable,
    get_reward,
    length_penalty,
)
from pipelinerl_tpu.domains.math.verifier import (
    answers_equal,
    extract_answer,
    extract_boxed,
    grade_answer,
    normalize_answer,
    verify_countdown,
)


# -- extraction --------------------------------------------------------------


def test_extract_boxed_nested():
    assert extract_boxed(r"thus \boxed{\frac{1}{2}}") == r"\frac{1}{2}"
    assert extract_boxed(r"a \boxed{1} then \boxed{2}") == "2"
    assert extract_boxed("no box") is None


def test_extract_answer_fallbacks():
    assert extract_answer("The final answer is 42") == "42"
    assert extract_answer("<answer>7</answer>") == "7"
    assert extract_answer(r"so \boxed{x+1}") == "x+1"
    assert extract_answer("I don't know") is None


# -- equivalence -------------------------------------------------------------


@pytest.mark.parametrize(
    "pred,gold",
    [
        ("42", "42"),
        (" 42 ", "42."),
        (r"\frac{1}{2}", "0.5"),
        ("1/2", "2/4"),
        ("1,000", "1000"),
        (r"\$5", "5"),
        ("50\\%", "0.5"),
        ("(1, 2)", "(1,2)"),
        (r"\text{east}", "east"),
        ("2*3", "6"),
        (r"\sqrt{4}", "2"),
        ("-0.25", "-1/4"),
    ],
)
def test_answers_equal(pred, gold):
    assert answers_equal(pred, gold), (normalize_answer(pred), normalize_answer(gold))


@pytest.mark.parametrize(
    "pred,gold", [("41", "42"), ("1/3", "0.5"), ("(1,2)", "(2,1)"), ("east", "west")]
)
def test_answers_not_equal(pred, gold):
    assert not answers_equal(pred, gold)


def test_grade_answer_statuses():
    assert grade_answer(r"the answer is \boxed{6}", r"\boxed{6}") == "correct"
    assert grade_answer(r"\boxed{5}", "6") == "wrong"
    assert grade_answer("I cannot solve this", "6") == "no_answer"
    assert grade_answer("", "6") == "no_answer"


# -- countdown ---------------------------------------------------------------


def test_countdown():
    assert verify_countdown("<answer>(3+5)*2</answer>", [3, 5, 2], 16) == "correct"
    assert verify_countdown("<answer>3*5*2</answer>", [3, 5, 2], 16) == "wrong"
    assert verify_countdown("<answer>(3+5)*4</answer>", [3, 5, 2], 16) == "wrong"  # wrong numbers
    assert verify_countdown("no expr here", [3, 5, 2], 16) == "no_answer"


# -- rewards -----------------------------------------------------------------


def test_reward_table():
    table = RewardTable()
    assert get_reward("correct", True, table) == 1.0
    assert get_reward("correct", False, table) == 0.5
    assert get_reward("wrong", True, table) == -0.5
    assert get_reward("unparsable", False, table) == -1.0


def test_length_penalty():
    # inside the buffer window the penalty ramps to -1
    assert length_penalty(1000, 800, 100) == 0.0
    assert length_penalty(1000, 950, 100) == pytest.approx(-0.5)
    assert length_penalty(1000, 1000, 100) == pytest.approx(-1.0)
    assert length_penalty(1000, 1050, 100) == 0.0  # beyond max → handled by overflow


# -- datasets ----------------------------------------------------------------


def test_synthetic_datasets():
    problems = load_datasets(["synthetic_arithmetic", "countdown"])
    assert len(problems) == 512 + 256
    p = problems[0]
    assert set(p) >= {"task", "answer", "dataset", "domain"}
    cd = problems[-1]
    assert "numbers" in cd and "target" in cd


def test_local_file_loader(tmp_path):
    f = tmp_path / "custom.jsonl"
    f.write_text('{"problem": "What is 1+1?", "answer": "2"}\n')
    problems = load_datasets([str(f)])
    assert problems == [
        {"task": "What is 1+1?", "answer": "2", "dataset": "custom", "domain": "math"}
    ]


def test_unknown_dataset_raises():
    with pytest.raises(ValueError):
        load_datasets(["not_a_dataset_xyz"])


# -- verifier HTTP service ---------------------------------------------------


def test_verifier_service_roundtrip():
    import aiohttp

    from pipelinerl_tpu.domains.math.verifier_api import MathEnvironment, verify_answer_rpc

    async def scenario():
        env = MathEnvironment()
        runner = await env.run(host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        try:
            async with aiohttp.ClientSession() as session:
                ok = await verify_answer_rpc(
                    session, "127.0.0.1", port, r"\boxed{4}", r"\boxed{4}"
                )
                wrong = await verify_answer_rpc(
                    session, "127.0.0.1", port, r"\boxed{5}", r"\boxed{4}"
                )
                cd = await verify_answer_rpc(
                    session, "127.0.0.1", port, "<answer>2*8</answer>", "",
                    extra={"numbers": [2, 8], "target": 16},
                )
                async with session.get(f"http://127.0.0.1:{port}/health") as r:
                    health = await r.json()
        finally:
            await runner.cleanup()
        return ok, wrong, cd, health

    ok, wrong, cd, health = asyncio.run(scenario())
    assert ok == "correct" and wrong == "wrong" and cd == "correct"
    assert health["status"] == "ok"
