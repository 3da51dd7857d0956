"""Tool parser, sandbox safety, shaping math, and a scripted TIR rollout."""

import asyncio
import json

import pytest

from pipelinerl_tpu.config import Config
from pipelinerl_tpu.domains.tir.rollouts import (
    build_tool_definitions,
    compute_shaping,
    generate_tir_rollout,
)
from pipelinerl_tpu.domains.tir.sandbox import (
    check_code_safety,
    safe_expression_executor,
)
from pipelinerl_tpu.domains.tir.tool_parser import parse_tool_calls
from pipelinerl_tpu.inference.client import BaseLLM, LLMCall, LLMMessage, Prompt
from pipelinerl_tpu.models.toy_tokenizer import ToyTokenizer


def test_parse_hermes_tool_call():
    text = 'thinking... <tool_call>{"name": "run_python_code", "arguments": {"code": "print(2+2)"}}</tool_call>'
    calls, content = parse_tool_calls(text)
    assert len(calls) == 1
    assert calls[0].function.name == "run_python_code"
    assert json.loads(calls[0].function.arguments) == {"code": "print(2+2)"}
    assert content == "thinking..."


def test_parse_apriel_variant():
    text = '<tool_calls>[{"name": "MathAnswer", "arguments": {"answer": "42"}}]</tool_calls>'
    calls, _ = parse_tool_calls(text)
    assert calls[0].function.name == "MathAnswer"


def test_parse_malformed_json_skipped():
    calls, content = parse_tool_calls("<tool_call>{not json}</tool_call> rest")
    assert calls == []
    assert "rest" in content


def test_final_response_extraction():
    text = "junk [BEGIN FINAL RESPONSE]the answer[END FINAL RESPONSE]"
    _, content = parse_tool_calls(text)
    assert content == "the answer"


def test_code_safety_blocklist():
    assert check_code_safety("import subprocess; subprocess.run(['ls'])")
    assert check_code_safety("os.system('rm -rf /')")
    assert check_code_safety("print(1+1)") is None


def test_safe_executor_evaluates_arithmetic():
    out = asyncio.run(safe_expression_executor("print(2+2*3)"))
    assert out == "8"
    out = asyncio.run(safe_expression_executor("import os\nos.system('x')"))
    assert out.startswith("Blocked")


def test_shaping_bonus_and_penalty():
    cfg = Config(
        {
            "python_tool_shaping": {
                "bonus_on_correct_with_python": 0.1,
                "penalty_on_incorrect_without_python": 0.1,
                "max_abs": 0.2,
            }
        }
    )
    assert compute_shaping(cfg, "correct", 1, 100, 1000) == pytest.approx(0.1)
    assert compute_shaping(cfg, "wrong", 0, 100, 1000) == pytest.approx(-0.1)
    assert compute_shaping(cfg, "correct", 0, 100, 1000) == 0.0


def test_length_shaping():
    cfg = Config(
        {
            "length_shaping": {
                "target_output_tokens": 100,
                "slope": 0.01,
                "max_penalty": 0.5,
                "bonus_on_short_correct": 0.2,
            }
        }
    )
    assert compute_shaping(cfg, "correct", 0, 50, 1000) == pytest.approx(0.2)
    assert compute_shaping(cfg, "wrong", 0, 150, 1000) == pytest.approx(-0.5)


class ScriptedLLM(BaseLLM):
    """Deterministic fake LLM returning queued responses."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.tokenizer = ToyTokenizer()
        self.parameters = {"max_tokens": 64}
        self.seen_messages = []

    async def agenerate(self, prompt: Prompt, session=None, **kw) -> LLMCall:
        self.seen_messages.append(prompt.messages)
        content = self.responses.pop(0)
        ids = self.tokenizer.encode(content) + [self.tokenizer.eos_token_id]
        return LLMCall(
            prompt=prompt,
            output=LLMMessage(role="assistant", content=content),
            prompt_token_ids=self.tokenizer.apply_chat_template(
                prompt.messages, add_generation_prompt=True
            ),
            output_token_ids=ids,
            logprobs=[-0.1] * len(ids),
            finish_reason="stop",
        )


def test_tir_rollout_with_python_then_answer():
    cfg = Config(
        {
            "actor": {"max_turns": 4, "task_template": "{task}", "system_prompt": "solve"},
            "rewards": {"correct_answer_finished": 1.0, "buffer_tokens": 0},
            "python_tool_shaping": {"bonus_on_correct_with_python": 0.1, "max_abs": 0.2},
        }
    )
    llm = ScriptedLLM(
        [
            '<tool_call>{"name": "run_python_code", "arguments": {"code": "print(6*7)"}}</tool_call>',
            '<tool_call>{"name": "MathAnswer", "arguments": {"answer": "42"}}</tool_call>',
        ]
    )
    problem = {"task": "What is 6*7?", "answer": "42", "dataset": "t", "domain": "tir"}
    result = asyncio.run(generate_tir_rollout(cfg, llm, problem))
    assert result.metrics.success
    assert result.metrics.num_python_calls == 1
    assert result.metrics.num_steps == 2
    assert result.metrics.reward == pytest.approx(1.1)  # table 1.0 + python bonus
    assert len(result.training_texts) == 2
    # the tool result was fed back into the second turn's conversation
    second_turn_msgs = llm.seen_messages[1]
    tool_msgs = [m for m in second_turn_msgs if m["role"] == "tool"]
    assert tool_msgs and tool_msgs[0]["content"] == "42"


def test_tir_rollout_no_answer():
    cfg = Config(
        {
            "actor": {"max_turns": 1, "task_template": "{task}", "system_prompt": None},
            "rewards": {"no_answer_finished": -1.0},
        }
    )
    llm = ScriptedLLM(["I give up"])
    problem = {"task": "hard", "answer": "1"}
    result = asyncio.run(generate_tir_rollout(cfg, llm, problem))
    # plain content (no tool call) is treated as a final response: graded
    assert result.metrics.success in (0, False)


def test_tool_definitions_schema():
    tools = build_tool_definitions()
    names = {t["function"]["name"] for t in tools}
    assert names == {"run_python_code", "MathAnswer"}
