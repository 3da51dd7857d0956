"""Logic rollout generation (reference domains/logic/rollouts.py:27-120):
prompt from cfg.actor.task_template, reward from the math RewardTable
(answer_status × finished) with discount-by-length, verification via a
remote logic env server when configured, else in-process."""

from __future__ import annotations

import asyncio
import random
import time
from typing import Any

from ...inference.client import BaseLLM, Prompt, llm_async_generate, make_training_text
from ...types import BaseMetrics, RolloutResult
from ..math.rollouts import RewardTable, _environment_servers, get_reward, length_penalty
from .verifier_api import verify_answer_rpc
from .verifiers import verify_answer

DOMAIN = "logic"


class LogicMetrics(BaseMetrics):
    penalty: float = 0.0


async def generate_logic_rollout(
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

    reward_context = problem.get("reward_context") or {}
    servers = _environment_servers(cfg)
    if servers and session is not None:
        host, port = random.choice(servers)
        answer_status = await verify_answer_rpc(
            session, host, port, llm_call.output.content or "", reward_context
        )
    else:
        loop = asyncio.get_event_loop()
        answer_status = await loop.run_in_executor(
            None, verify_answer, llm_call.output.content or "", reward_context
        )

    rewards_cfg = cfg.get("rewards", {}) if hasattr(cfg, "get") else {}
    table = RewardTable(**dict(rewards_cfg.items() if hasattr(rewards_cfg, "items") else {}))
    discount = float(cfg.actor.get("discount_factor", 1.0)) if hasattr(cfg, "actor") else 1.0

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

    metrics = LogicMetrics(
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
