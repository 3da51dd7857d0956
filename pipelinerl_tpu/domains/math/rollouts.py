"""Math rollout generation with the 8-way reward table and length shaping.

Behavioral parity with reference domains/math/rollouts.py:24-149:
(answer_status × finished) reward table, discount by output length, overlong
length penalty inside the buffer window. Verification goes to a remote
verifier server when ``cfg.environment`` lists one, else runs in-process
(the pure-Python grader is cheap — no process pool needed)."""

from __future__ import annotations

import asyncio
import logging
import random
import time
from typing import Any

from pydantic import BaseModel

from ...inference.client import BaseLLM, Prompt, llm_async_generate, make_training_text
from ...types import BaseMetrics, RolloutResult
from .verifier import grade_answer, verify_countdown
from .verifier_api import verify_answer_rpc

logger = logging.getLogger(__name__)

DOMAIN = "math"


class MathMetrics(BaseMetrics):
    penalty: float = 0.0


class RewardTable(BaseModel):
    wrong_answer_not_finished: float = -1.0
    wrong_answer_finished: float = -0.5
    no_answer_not_finished: float = -1.0
    no_answer_finished: float = -1.0
    unparsable_not_finished: float = -1.0
    unparsable_finished: float = -1.0
    correct_answer_not_finished: float = 0.5
    correct_answer_finished: float = 1.0
    buffer_tokens: int = 0  # 0 → no overlong shaping


def get_reward(answer_status: str, finished: bool, table: RewardTable) -> float:
    key = {
        "wrong": "wrong_answer",
        "no_answer": "no_answer",
        "unparsable": "unparsable",
        "correct": "correct_answer",
    }[answer_status]
    suffix = "finished" if finished else "not_finished"
    return float(getattr(table, f"{key}_{suffix}"))


def length_penalty(max_length: int, sequence_length: int, buffer_tokens: int) -> float:
    """Linear penalty inside the last ``buffer_tokens`` of the budget
    (reference rollouts.py:80-86)."""
    if (max_length - buffer_tokens) < sequence_length <= max_length:
        return ((max_length - buffer_tokens) - sequence_length) / buffer_tokens
    return 0.0


def _environment_servers(cfg: Any) -> list[tuple[str, int]]:
    env = cfg.get("environment") if hasattr(cfg, "get") else None
    if not env:
        return []
    servers = []
    for entry in env if isinstance(env, list) else [env]:
        host = entry.get("hostname", "127.0.0.1") if hasattr(entry, "get") else "127.0.0.1"
        port = entry.get("port") if hasattr(entry, "get") else None
        if port:
            servers.append((host, int(port)))
    return servers


async def _verify(cfg: Any, session: Any, prediction: str, problem: dict) -> str:
    extra = None
    if "numbers" in problem and "target" in problem:
        extra = {"numbers": problem["numbers"], "target": problem["target"]}
    servers = _environment_servers(cfg)
    if servers and session is not None:
        host, port = random.choice(servers)
        return await verify_answer_rpc(
            session, host, port, prediction, str(problem.get("answer", "")), extra=extra
        )
    loop = asyncio.get_event_loop()
    if extra is not None:
        return await loop.run_in_executor(
            None, verify_countdown, prediction, list(problem["numbers"]), int(problem["target"])
        )
    return await loop.run_in_executor(
        None, grade_answer, prediction, str(problem.get("answer", ""))
    )


async def generate_math_rollout(
    cfg: Any, llm: BaseLLM, problem: dict, session: Any = None
) -> RolloutResult:
    messages = []
    system_prompt = cfg.actor.get("system_prompt") if hasattr(cfg, "actor") else None
    if system_prompt:
        messages.append({"role": "system", "content": system_prompt})
    task_template = (
        cfg.actor.get("task_template", "{task}") if hasattr(cfg, "actor") else "{task}"
    )
    messages.append({"role": "user", "content": task_template.format(task=problem["task"])})

    time_start = time.time()
    llm_call = await llm_async_generate(llm, Prompt(messages=messages), session)
    latency = time.time() - time_start

    table = RewardTable(**dict(cfg.get("rewards", {}).items() if hasattr(cfg.get("rewards", {}), "items") else {}))
    discount = float(cfg.actor.get("discount_factor", 1.0)) if hasattr(cfg, "actor") else 1.0

    answer_status = await _verify(cfg, session, llm_call.output.content or "", problem)

    trace = make_training_text(llm, llm_call)
    reward = get_reward(answer_status, trace.finished, table)
    reward *= discount ** llm_call.output_length_tokens
    overlong_penalty = 0.0
    if table.buffer_tokens > 0:
        max_tokens = int(llm.parameters.get("max_tokens", 0))
        overlong_penalty = length_penalty(
            max_tokens, llm_call.output_length_tokens, table.buffer_tokens
        )
    reward += overlong_penalty
    trace.reward = reward

    metrics = MathMetrics(
        reward=reward,
        success=answer_status == "correct",
        no_error=answer_status != "unparsable",
        no_answer=answer_status == "no_answer",
        penalty=overlong_penalty,
    )
    return RolloutResult(
        training_texts=[trace],
        metrics=metrics,
        latency=latency,
        dataset_name=problem.get("dataset"),
        domain=DOMAIN,
    )
