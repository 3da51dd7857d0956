"""Coding verifier + fn_calling AST matcher."""

import asyncio
import json

import pytest

from pipelinerl_tpu.domains.coding.dataset import load_datasets as load_coding
from pipelinerl_tpu.domains.coding.verifier import (
    evaluate_coding_prediction,
    extract_code,
    outputs_match,
)
from pipelinerl_tpu.domains.fn_calling.dataset import load_datasets as load_fn
from pipelinerl_tpu.domains.fn_calling.verifier import ast_match_score, parse_call


# -- coding ------------------------------------------------------------------


def test_extract_code_block():
    text = "Here's my solution:\n```python\nprint('hi')\n```\ndone"
    assert extract_code(text) == "print('hi')"
    assert extract_code("def f():\n    return 1") == "def f():\n    return 1"
    assert extract_code("just words") == ""


def test_outputs_match_tolerance():
    assert outputs_match("1.0000001\n2", "1.0 \n2\n")
    assert outputs_match("  a  \n b ", "a\nb")
    assert not outputs_match("1\n2", "1\n3")
    assert not outputs_match("1", "1\n2")


class FakeExecutor:
    """Simulates a sandbox: executes the known synthetic script shapes."""

    def __init__(self, behavior="ok"):
        self.behavior = behavior
        self.scripts = []

    async def __call__(self, script: str) -> str:
        self.scripts.append(script)
        if self.behavior == "ok":
            # emulate the sum-two-ints program against embedded stdin
            import re

            m = re.search(r"StringIO\('(\d+)\\n(\d+)'\)", script)
            if m:
                return str(int(m.group(1)) + int(m.group(2)))
            return "42"
        if self.behavior == "timeout":
            return "[execution timed out]"
        if self.behavior == "crash":
            return "x\n[stderr]\nTraceback (most recent call last): Error"
        return "[execution error: boom]"


def test_coding_all_pass():
    tests = {"inputs": ["1\n2", "3\n4"], "outputs": ["3", "7"]}
    pred = "```python\na=int(input());b=int(input());print(a+b)\n```"
    v = asyncio.run(evaluate_coding_prediction(pred, tests, FakeExecutor("ok")))
    assert v.answer_status == "correct"
    assert v.passed == 2 and v.total == 2


def test_coding_wrong_output():
    tests = {"inputs": ["1\n2"], "outputs": ["999"]}
    pred = "```python\nprint(3)\n```"
    v = asyncio.run(evaluate_coding_prediction(pred, tests, FakeExecutor("ok")))
    assert v.answer_status == "wrong"


def test_coding_timeout_and_crash():
    tests = {"inputs": ["1\n2"], "outputs": ["3"]}
    pred = "```python\nwhile True: pass\n```"
    v = asyncio.run(evaluate_coding_prediction(pred, tests, FakeExecutor("timeout")))
    assert v.timeout_error and v.answer_status == "unparsable"
    v = asyncio.run(evaluate_coding_prediction(pred, tests, FakeExecutor("crash")))
    assert v.runtime_error and v.answer_status == "wrong"


def test_coding_no_code():
    v = asyncio.run(evaluate_coding_prediction("no code here", {"inputs": [], "outputs": []}, FakeExecutor()))
    assert v.answer_status == "no_answer"
    assert v.empty_response


def test_coding_functional_mode():
    tests = {"fn_name": "add", "inputs": [[1, 2]], "outputs": [3]}

    class FnExec:
        async def __call__(self, script):
            assert "add(1, 2)" in script
            return "3"

    v = asyncio.run(
        evaluate_coding_prediction("```python\ndef add(a,b): return a+b\n```", tests, FnExec())
    )
    assert v.answer_status == "correct"


def test_coding_synthetic_dataset():
    problems = load_coding(["synthetic_coding"])
    assert len(problems) == 128
    assert problems[0]["tests"]["inputs"]


# -- fn_calling --------------------------------------------------------------


def test_parse_tool_call_block():
    text = '<tool_call>{"name": "get_weather", "arguments": {"city": "Paris"}}</tool_call>'
    calls = parse_call(text)
    assert calls == [{"name": "get_weather", "arguments": {"city": "Paris"}}]


def test_parse_python_style_call():
    calls = parse_call("I'll call get_weather(city='Oslo', unit='celsius')")
    assert calls[0]["name"] == "get_weather"
    assert calls[0]["arguments"]["city"] == "Oslo"


def test_ast_match_exact_and_partial():
    gold = [{"name": "get_weather", "arguments": {"city": "Paris", "unit": []}}]
    assert ast_match_score(
        '<tool_call>{"name": "get_weather", "arguments": {"city": "paris"}}</tool_call>',
        gold,
    ) == 1.0
    # wrong arg value
    assert ast_match_score(
        '<tool_call>{"name": "get_weather", "arguments": {"city": "Rome"}}</tool_call>',
        gold,
    ) == 0.0
    # hallucinated extra call dilutes
    two = (
        '<tool_call>{"name": "get_weather", "arguments": {"city": "Paris"}}</tool_call>'
        '<tool_call>{"name": "bogus", "arguments": {}}</tool_call>'
    )
    assert ast_match_score(two, gold) == pytest.approx(0.5)


def test_ast_match_alternatives_and_tolerance():
    gold = [{"name": "f", "arguments": {"x": [1, 2], "y": 0.5}}]
    assert ast_match_score('<tool_call>{"name": "f", "arguments": {"x": 2, "y": 0.5000001}}</tool_call>', gold) == 1.0


def test_fn_synthetic_dataset():
    problems = load_fn(["synthetic_fn_calling"])
    assert len(problems) == 128
    p = problems[0]
    assert p["tools"][0]["name"] == "get_weather"
