"""Logic domain: verifier registry, synthetic generators, env HTTP service."""

import asyncio
import itertools

import pytest

from pipelinerl_tpu.domains.logic.dataset import generate_problems, load_problems
from pipelinerl_tpu.domains.logic.verifiers import (
    CORRECT,
    NO_ANSWER,
    UNPARSABLE,
    WRONG,
    _safe_bool_eval,
    _safe_int_eval,
    extract_answer,
    verify_answer,
)


def _oracle(task: str, game_data: dict) -> str:
    """Compute the ground-truth answer for a generated puzzle."""
    if task == "boolean_expressions":
        return str(_safe_bool_eval(game_data["expression"]))
    if task == "multistep_arithmetic":
        return str(_safe_int_eval(game_data["expression"]))
    if task == "dyck_languages":
        close = {"(": ")", "[": "]", "{": "}", "<": ">"}
        stack = []
        for ch in game_data["prefix"]:
            if ch in close:
                stack.append(close[ch])
            else:
                stack.pop()
        return "".join(reversed(stack))
    if task == "word_sorting":
        return ", ".join(sorted(w.lower() for w in game_data["words"]))
    if task == "web_of_lies":
        truth = game_data["first_truth"]
        for says_truth in game_data["statements"]:
            truth = truth if says_truth else not truth
        return "yes" if truth else "no"
    if task == "navigation":
        x = sum(dx for dx, _ in game_data["moves"])
        y = sum(dy for _, dy in game_data["moves"])
        return "yes" if (x == 0 and y == 0) else "no"
    if task == "zebra_puzzle":
        attr, value, target = game_data["query"]
        for house in game_data["solution"].values():
            if str(house[attr]).lower() == str(value).lower():
                return str(house[target])
        raise AssertionError("query target missing from solution")
    if task == "sudoku":
        puzzle = game_data["puzzle"]
        target = {1, 2, 3, 4}
        for cand in itertools.product(*[
            [puzzle[r][c]] if puzzle[r][c] else [1, 2, 3, 4]
            for r in range(4) for c in range(4)
        ]):
            g = [list(cand[r * 4:(r + 1) * 4]) for r in range(4)]
            if all(set(g[i]) == target and {g[r][i] for r in range(4)} == target
                   for i in range(4)) and all(
                {g[br + r][bc + c] for r in range(2) for c in range(2)} == target
                for br in (0, 2) for bc in (0, 2)
            ):
                return "".join(str(v) for v in cand)
        raise AssertionError("unsolvable sudoku generated")
    if task == "date_understanding":
        return game_data["answer"]
    raise AssertionError(f"no oracle for {task}")


def test_every_generated_problem_verifies_with_oracle():
    problems = generate_problems(90, seed=3)
    assert len({p["reward_context"]["task"] for p in problems}) == 9
    for p in problems:
        ctx = p["reward_context"]
        answer = _oracle(ctx["task"], ctx["game_data"])
        assert verify_answer(f"reasoning...<answer>{answer}</answer>", ctx) == CORRECT, (
            ctx, answer)


def test_wrong_and_missing_answers():
    problems = generate_problems(18, seed=5)
    for p in problems:
        ctx = p["reward_context"]
        assert verify_answer("<answer>gibberish 999</answer>", ctx) == WRONG
        assert verify_answer("", ctx) == NO_ANSWER
        assert verify_answer("I have no idea at all", ctx) == NO_ANSWER
    assert verify_answer("<answer>x</answer>", {"task": "nope", "game_data": {}}) == UNPARSABLE


def test_extract_answer_forms():
    assert extract_answer("<answer> 42 </answer>") == "42"
    assert extract_answer("first <answer>1</answer> then <answer>2</answer>") == "2"
    assert extract_answer(r"so \boxed{yes}") == "yes"
    assert extract_answer("Final answer: no") == "no"
    assert extract_answer("just rambling") is None


def test_cryptarithm_verifier():
    ctx = {"task": "cryptarithm",
           "game_data": {"words": ["SEND", "MORE"], "result": "MONEY"}}
    good = "<answer>S=9, E=5, N=6, D=7, M=1, O=0, R=8, Y=2</answer>"
    assert verify_answer(good, ctx) == CORRECT
    bad = "<answer>S=9, E=5, N=6, D=7, M=1, O=0, R=8, Y=3</answer>"
    assert verify_answer(bad, ctx) == WRONG
    # duplicate digit assignment is invalid
    dup = "<answer>S=9, E=9, N=6, D=7, M=1, O=0, R=8, Y=2</answer>"
    assert verify_answer(dup, ctx) == WRONG


def test_load_problems_synthetic_and_gating():
    train = load_problems(["train"], max_examples=64)
    test = load_problems(["test"], max_examples=64)
    assert len(train) == 64 and len(test) == 64
    assert train[0]["task"] != test[0]["task"]  # different seeds
    assert all(p["domain"] == "logic" for p in train)
    with pytest.raises(ValueError):
        load_problems(["bogus_set"])


def test_logic_env_service_roundtrip():
    import aiohttp

    from pipelinerl_tpu.domains.logic.verifier_api import (
        LogicEnvironment,
        verify_answer_rpc,
    )

    problems = generate_problems(4, seed=7)
    ctx = problems[0]["reward_context"]
    answer = _oracle(ctx["task"], ctx["game_data"])

    async def scenario():
        runner = await LogicEnvironment().run(host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        try:
            async with aiohttp.ClientSession() as session:
                ok = await verify_answer_rpc(
                    session, "127.0.0.1", port, f"<answer>{answer}</answer>", ctx
                )
                wrong = await verify_answer_rpc(
                    session, "127.0.0.1", port, "<answer>nope 0</answer>", ctx
                )
                async with session.get(f"http://127.0.0.1:{port}/health") as r:
                    health = await r.json()
        finally:
            await runner.cleanup()
        return ok, wrong, health

    ok, wrong, health = asyncio.run(scenario())
    assert ok == CORRECT and wrong == WRONG and health["status"] == "ok"


def test_registry_resolves_logic():
    from pipelinerl_tpu.domains.registry import resolve_domain_rollout

    fn = resolve_domain_rollout("logic")
    assert fn.__name__ == "generate_logic_rollout"
