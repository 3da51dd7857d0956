"""MiniWoB rollout: env-server pool with health-checked failover, a
multi-turn observation→action loop, and the reference's two reward
computations (reference miniwob/rollouts.py:86-305).

Failover contract preserved: try servers in random order skipping unhealthy
ones, bound each attempt by ``rollout_timeout``, and return a penalized
failed RolloutResult (reward −1, no training texts) when every server
fails."""

from __future__ import annotations

import asyncio
import logging
import random
import re
import time
from typing import Any

from pydantic import BaseModel

from ...inference.client import BaseLLM, Prompt, llm_async_generate, make_training_text
from ...types import BaseMetrics, RolloutResult, rollout_has_overflow
from ..math.rollouts import _environment_servers

logger = logging.getLogger(__name__)

DOMAIN = "miniwob"

SYSTEM_PROMPT = (
    "You control a web page. Each turn you see the goal and the page DOM "
    "with element ids in [brackets]. Reply with EXACTLY ONE action:\n"
    'click("bid")\nfill("bid", "text")\nselect_option("bid", "option")\n'
)

_ACTION_LINE_RE = re.compile(r"(click|fill|select_option)\s*\(.*?\)", re.DOTALL)


class MiniwobMetrics(BaseMetrics):
    overflow: bool = False
    n_llm_calls: int = 0
    n_step_errors: int = 0
    n_page_observations: int = 0
    n_steps: int = 0
    total_execution_time: float = 0.0


async def check_env_server_health(session: Any, host: str, port: int) -> bool:
    try:
        async with session.get(
            f"http://{host}:{port}/health", timeout=5
        ) as response:
            return response.status == 200
    except Exception:
        logger.warning("health check failed for %s:%d", host, port, exc_info=True)
        return False


def compute_reward(
    raw_reward: float, no_error: bool, n_step_errors: int,
    n_page_observations: int, mode: str,
) -> float:
    """The reference's reward shapes (rollouts.py:255-263)."""
    if mode == "nico":
        return raw_reward * 0.99**n_step_errors if no_error and raw_reward >= 0 else -1.0
    if mode == "uic":
        reward = float(raw_reward > 0)
        if reward == 0.0:
            reward = -1.0
        return reward * 0.98**n_page_observations
    raise ValueError(f"invalid reward_computation {mode!r}")


async def generate_miniwob_rollout(
    cfg: Any, llm: BaseLLM, problem: dict, session: Any = None
) -> RolloutResult:
    start_time = time.time()
    actor_cfg = cfg.actor if hasattr(cfg, "actor") else cfg
    rollout_timeout = float(actor_cfg.get("rollout_timeout", 600))
    servers = _environment_servers(cfg)
    if not servers or session is None:
        # no env pool configured: run the simulated env in-process (tests,
        # hermetic smoke runs)
        return await _run_episode(cfg, llm, problem, session, start_time, None)

    tried: list[tuple[str, int]] = []
    while len(tried) < len(servers):
        host, port = random.choice([s for s in servers if s not in tried])
        tried.append((host, port))
        if not await check_env_server_health(session, host, port):
            logger.warning("env server %s:%d unhealthy; rotating", host, port)
            continue
        try:
            return await asyncio.wait_for(
                _run_episode(cfg, llm, problem, session, start_time, (host, port)),
                timeout=rollout_timeout,
            )
        except asyncio.TimeoutError:
            logger.warning("rollout timed out on %s:%d; rotating", host, port)
        except Exception:
            logger.warning("rollout failed on %s:%d; rotating", host, port, exc_info=True)
    logger.error("all %d env servers failed for %s", len(servers), problem.get("task"))
    return _failed_rollout(problem, start_time)


class _RemoteEnv:
    def __init__(self, session: Any, host: str, port: int):
        self.session = session
        self.base = f"http://{host}:{port}"
        self.sid: str | None = None

    async def start(self, task: str, seed: int) -> str:
        async with self.session.post(
            f"{self.base}/start_task", json={"task": task, "seed": seed}
        ) as r:
            body = await r.json()
            if r.status != 200:
                raise RuntimeError(f"start_task failed: {body}")
            self.sid = body["session_id"]
            return body["observation"]

    async def step(self, action: str) -> tuple[str, bool, dict]:
        async with self.session.post(
            f"{self.base}/step", json={"session_id": self.sid, "action": action}
        ) as r:
            body = await r.json()
            if r.status != 200:
                raise RuntimeError(f"step failed: {body}")
            return body["observation"], body["done"], body.get("info", {})

    async def close(self) -> None:
        if self.sid:
            try:
                await self.session.post(
                    f"{self.base}/close", json={"session_id": self.sid}
                )
            except Exception:
                pass


class _LocalEnv:
    def __init__(self) -> None:
        self.env = None

    async def start(self, task: str, seed: int) -> str:
        from .simulated_env import SimulatedWebEnv

        self.env = SimulatedWebEnv(task_name=task, seed=seed)
        return self.env.observe()

    async def step(self, action: str) -> tuple[str, bool, dict]:
        return self.env.step(action)

    async def close(self) -> None:
        pass


async def _run_episode(
    cfg: Any, llm: BaseLLM, problem: dict, session: Any,
    start_time: float, server: tuple[str, int] | None,
) -> RolloutResult:
    actor_cfg = cfg.actor if hasattr(cfg, "actor") else cfg
    max_loops = int(actor_cfg.get("agent_max_loops", 8))
    reward_mode = str(actor_cfg.get("reward_computation", "nico"))

    env = _RemoteEnv(session, *server) if server else _LocalEnv()
    observation = await env.start(problem["task"], int(problem.get("seed", 0)))

    messages = [
        {"role": "system", "content": actor_cfg.get("system_prompt") or SYSTEM_PROMPT},
        {"role": "user", "content": observation},
    ]
    llm_calls = []
    n_step_errors = 0
    n_page_observations = 1
    raw_reward = -1.0
    done = False
    try:
        for _loop in range(max_loops):
            llm_call = await llm_async_generate(llm, Prompt(messages=list(messages)), session)
            llm_calls.append(llm_call)
            content = llm_call.output.content or ""
            messages.append({"role": "assistant", "content": content})
            m = _ACTION_LINE_RE.search(content)
            action = m.group(0) if m else content.strip()
            if not m:
                n_step_errors += 1
            observation, done, info = await env.step(action)
            if info.get("action_error"):
                n_step_errors += 1
            n_page_observations += 1
            raw_reward = float(
                info.get("task_info", {}).get("REWARD_GLOBAL", raw_reward)
            )
            if done:
                break
            messages.append({"role": "user", "content": observation})
    finally:
        await env.close()

    no_error = done and raw_reward >= 0
    reward = compute_reward(
        raw_reward, no_error, n_step_errors, n_page_observations, reward_mode
    )
    traces = [make_training_text(llm, call) for call in llm_calls]
    for t in traces:
        t.reward = reward
    overflow = rollout_has_overflow(traces)

    metrics = MiniwobMetrics(
        reward=reward,
        success=reward > 0.5,
        no_error=no_error,
        no_answer=raw_reward < 0,
        overflow=overflow,
        n_llm_calls=len(llm_calls),
        n_step_errors=n_step_errors,
        n_page_observations=n_page_observations,
        n_steps=len(llm_calls) + n_page_observations,
        total_execution_time=time.time() - start_time,
    )
    return RolloutResult(
        training_texts=traces,
        metrics=metrics,
        latency=time.time() - start_time,
        dataset_name=problem.get("dataset"),
        domain=DOMAIN,
    )


def _failed_rollout(problem: dict, start_time: float) -> RolloutResult:
    """All servers down → penalized empty result (reference rollouts.py:308-336)."""
    latency = time.time() - start_time
    metrics = MiniwobMetrics(
        reward=-1.0, success=False, no_error=False, no_answer=True,
        total_execution_time=latency,
    )
    return RolloutResult(
        training_texts=[],
        metrics=metrics,
        latency=latency,
        dataset_name=problem.get("dataset"),
        domain=DOMAIN,
    )
