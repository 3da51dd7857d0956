"""Single-token bandit domain — the end-to-end learning oracle for tests.

Reward 1.0 when the first generated character matches the problem's target
letter. A tiny randomly-initialized model must learn to emit the target
within a few dozen optimizer steps, which exercises the full pipeline
(rollouts → groups → LOO advantages → packing → train step → in-flight
weight update → engine samples better). No reference analogue; the
reference's smallest oracle (guessing, README.md:189) needs a pretrained
0.5B model, which hermetic CI cannot download.
"""

from __future__ import annotations

import time
from typing import Any

from ..inference.client import BaseLLM, Prompt, llm_async_generate, make_training_text
from ..types import BaseMetrics, RolloutResult

DOMAIN = "bandit"


async def generate_bandit_rollout(
    cfg: Any, llm: BaseLLM, problem: dict, session: Any = None
) -> RolloutResult:
    time_start = time.time()
    messages = [{"role": "user", "content": problem["prompt"]}]
    llm_call = await llm_async_generate(llm, Prompt(messages=messages), session)
    content = llm_call.output.content or ""
    lstripped = content.lstrip()
    success = int(lstripped.startswith(problem["target"]))
    # dense shaping: distance of the first generated character from the
    # target character, so leave-one-out groups carry gradient signal from
    # step one. Computed on DECODED text (not raw token ids) so the oracle
    # works under any tokenizer — the byte-level toy AND a real BPE
    # checkpoint (whose first token may be a multi-char merge).
    target_byte = ord(problem["target"][0])
    if lstripped:
        reward = max(0.0, 1.0 - abs(ord(lstripped[0]) - target_byte) / 256.0)
    else:
        reward = 0.0
    if success:
        reward = 2.0
    text = make_training_text(llm, llm_call)
    text.reward = reward
    metrics = BaseMetrics(
        reward=reward, success=success, no_error=True, no_answer=not content
    )
    return RolloutResult(
        training_texts=[text],
        metrics=metrics,
        latency=time.time() - time_start,
        dataset_name=problem.get("dataset"),
        domain=DOMAIN,
    )


def load_problems(dataset_names: list[str]) -> list[dict]:
    problems = []
    for name in dataset_names:
        problems.extend(
            {"prompt": "say x", "target": "x", "dataset": name, "domain": DOMAIN}
            for _ in range(64)
        )
    return problems
