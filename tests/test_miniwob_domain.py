"""MiniWoB domain: simulated env, env server, failover pool, rewards."""

import asyncio

import pytest

from pipelinerl_tpu.config import Config
from pipelinerl_tpu.domains.miniwob.load_tasks import load_tasks
from pipelinerl_tpu.domains.miniwob.rollouts import (
    compute_reward,
    generate_miniwob_rollout,
)
from pipelinerl_tpu.domains.miniwob.simulated_env import TASKS, SimulatedWebEnv
from pipelinerl_tpu.inference.client import BaseLLM, LLMCall, LLMMessage, Prompt
from pipelinerl_tpu.models.toy_tokenizer import ToyTokenizer


class ScriptedLLM(BaseLLM):
    def __init__(self, responses):
        self.responses = list(responses)
        self.tokenizer = ToyTokenizer()
        self.parameters = {"max_tokens": 64}

    async def agenerate(self, prompt: Prompt, session=None, **kw) -> LLMCall:
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


def _solve(env: SimulatedWebEnv) -> list[str]:
    """Oracle action sequence for any simulated task."""
    goal = env.task.goal
    dom = env.task.dom
    if "Click the" in goal and "button" in goal:
        target = goal.split('"')[1]
        bid = next(b for b, el in dom.items() if el.get("text") == target)
        return [f'click("{bid}")']
    if goal.startswith("Check the boxes"):
        wanted = set(goal.split("labeled ")[1].split(" then")[0].split(", "))
        acts = [
            f'click("{b}")' for b, el in dom.items()
            if el["tag"] == "checkbox" and el["text"] in wanted
        ]
        return acts + ['click("submit")']
    if goal.startswith("Type"):
        word = goal.split('"')[1]
        return [f'fill("input", "{word}")', 'click("submit")']
    if goal.startswith("Select"):
        option = goal.split('"')[1]
        return [f'select_option("list", "{option}")', 'click("submit")']
    raise AssertionError(goal)


@pytest.mark.parametrize("task", sorted(TASKS))
@pytest.mark.parametrize("seed", [0, 3])
def test_simulated_tasks_solvable_by_oracle(task, seed):
    env = SimulatedWebEnv(task_name=task, seed=seed)
    for action in _solve(env):
        obs, done, info = env.step(action)
    assert done and info["task_info"]["REWARD_GLOBAL"] == 1.0

    # a wrong episode fails
    env2 = SimulatedWebEnv(task_name=task, seed=seed)
    for _ in range(env2.task.max_steps):
        obs, done, info = env2.step('click("nonexistent")')
    assert done and info["task_info"]["REWARD_GLOBAL"] == -1.0


def test_reward_computations():
    assert compute_reward(1.0, True, 0, 3, "nico") == 1.0
    assert compute_reward(1.0, True, 2, 3, "nico") == pytest.approx(0.99**2)
    assert compute_reward(1.0, False, 0, 3, "nico") == -1.0
    assert compute_reward(1.0, True, 0, 3, "uic") == pytest.approx(0.98**3)
    assert compute_reward(0.0, True, 0, 3, "uic") == pytest.approx(-(0.98**3))
    with pytest.raises(ValueError):
        compute_reward(1.0, True, 0, 0, "bogus")


def test_load_tasks_splits():
    problems = load_tasks(["simweb_train"], n_seeds=4)
    assert len(problems) == 4 * 4
    test = load_tasks(["simweb_test"], n_seeds=2)
    assert all(p["seed"] >= 10_000 for p in test)
    with pytest.raises(ValueError):
        load_tasks(["nope"])


def test_rollout_in_process_success():
    env = SimulatedWebEnv(task_name="simweb.enter-text", seed=1)
    actions = _solve(env)
    problem = {"task": "simweb.enter-text", "seed": 1, "dataset": "simweb_train"}
    cfg = Config({"actor": {"agent_max_loops": 6, "reward_computation": "nico"}})
    llm = ScriptedLLM([f"I will act. {a}" for a in actions])
    result = asyncio.run(generate_miniwob_rollout(cfg, llm, problem))
    assert result.metrics.success == 1
    assert result.metrics.reward == 1.0
    assert len(result.training_texts) == len(actions)
    assert all(t.reward == 1.0 for t in result.training_texts)


def test_rollout_step_errors_discount():
    problem = {"task": "simweb.enter-text", "seed": 1, "dataset": "simweb_train"}
    env = SimulatedWebEnv(task_name="simweb.enter-text", seed=1)
    actions = _solve(env)
    cfg = Config({"actor": {"agent_max_loops": 6, "reward_computation": "nico"}})
    llm = ScriptedLLM(["gibberish no action here"] + [f"ok {a}" for a in actions])
    result = asyncio.run(generate_miniwob_rollout(cfg, llm, problem))
    # one unparsable action (counted twice: parse fail + env action_error)
    assert result.metrics.n_step_errors == 2
    assert result.metrics.reward == pytest.approx(0.99**2)


def test_env_server_and_failover():
    import aiohttp

    from pipelinerl_tpu.domains.miniwob.environment_server import WebEnvironmentServer

    problem = {"task": "simweb.click-button", "seed": 2, "dataset": "simweb_train"}
    env = SimulatedWebEnv(task_name="simweb.click-button", seed=2)
    actions = _solve(env)

    async def scenario():
        runner = await WebEnvironmentServer().run(host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        # pool lists one DEAD server plus the live one → failover must rotate
        cfg = Config(
            {
                "actor": {"agent_max_loops": 4, "rollout_timeout": 30},
                "environment": [
                    {"hostname": "127.0.0.1", "port": 1},  # dead
                    {"hostname": "127.0.0.1", "port": port},
                ],
            }
        )
        llm = ScriptedLLM([f"act: {a}" for a in actions])
        try:
            async with aiohttp.ClientSession() as session:
                result = await generate_miniwob_rollout(cfg, llm, problem, session)
                async with session.get(f"http://127.0.0.1:{port}/health") as r:
                    health = await r.json()
        finally:
            await runner.cleanup()
        return result, health

    result, health = asyncio.run(scenario())
    assert result.metrics.success == 1 and result.metrics.reward == 1.0
    assert health["backend"] == "simulated"
    assert health["active_sessions"] == 0  # finished episodes close sessions


def test_all_servers_down_returns_failed_rollout():
    import aiohttp

    problem = {"task": "simweb.click-button", "seed": 0, "dataset": "simweb_train"}
    cfg = Config(
        {
            "actor": {"agent_max_loops": 2, "rollout_timeout": 5},
            "environment": [{"hostname": "127.0.0.1", "port": 1}],
        }
    )

    async def scenario():
        async with aiohttp.ClientSession() as session:
            return await generate_miniwob_rollout(
                cfg, ScriptedLLM(["x"]), problem, session
            )

    result = asyncio.run(scenario())
    assert result.metrics.reward == -1.0
    assert result.metrics.no_error == 0
    assert result.training_texts == []


def test_registry_resolves_miniwob():
    from pipelinerl_tpu.domains.registry import resolve_domain_rollout

    assert resolve_domain_rollout("miniwob").__name__ == "generate_miniwob_rollout"
