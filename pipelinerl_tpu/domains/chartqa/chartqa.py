"""ChartQA VLM domain: single-turn QA over chart images.

Behavioral parity with reference domains/chartqa/chartqa.py:63-148 —
base64 data-URL image messages, 8-way (answer_status × finished) reward
table, output-length discount, relaxed-correctness evaluation — built on
this repo's token-native client (the processor extracts pixel features once
and they flow with the call into the TrainingText; the reference re-extracts
them trainer-side, async_llm.py:242-289).
"""

from __future__ import annotations

import base64
import io
import logging
import time
from typing import Any

from ...inference.client import BaseLLM, Prompt, llm_async_generate, make_training_text
from ...types import BaseMetrics, RolloutResult
from ..math.rollouts import RewardTable, get_reward
from .evaluation import evaluate_answer

logger = logging.getLogger(__name__)

DOMAIN = "chartqa"


def image_to_data_url(image) -> str:
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def multimodal_message(image, question: str) -> dict:
    return {
        "role": "user",
        "content": [
            {"type": "image_url", "image_url": {"url": image_to_data_url(image)}},
            {"type": "text", "text": question},
        ],
    }


def load_datasets(dataset_names: list[str]) -> list[dict]:
    """HuggingFaceM4/ChartQA splits ("chartqa", "chartqa_test") → problems
    with PIL image, question, answer. Skips gracefully when the hub is
    unreachable (hermetic environments)."""
    problems: list[dict] = []
    for name in dataset_names:
        split = "test" if name.endswith("_test") else "train"
        try:
            from datasets import load_dataset

            ds = load_dataset("HuggingFaceM4/ChartQA", split=split)
        except Exception as e:  # no egress / hub down: skip, don't crash
            logger.warning("chartqa dataset %s unavailable (%s); skipping", name, e)
            continue
        for i, row in enumerate(ds):
            answer = row["label"]
            if isinstance(answer, list):
                answer = answer[0]
            problems.append(
                {
                    "id": f"{name}_{i}",
                    "dataset": name,
                    "domain": DOMAIN,
                    "image": row["image"],
                    "question": row["query"],
                    "answer": str(answer),
                }
            )
    return problems


async def generate_chartqa_rollout(
    cfg: Any, llm: BaseLLM, problem: dict, session: Any = None
) -> RolloutResult:
    time_start = time.time()
    messages = []
    system_prompt = cfg.actor.get("system_prompt")
    if system_prompt:
        messages.append({"role": "system", "content": system_prompt})
    question = str(cfg.actor.get("task_template", "{task}")).format(
        task=problem["question"], question=problem["question"]
    )
    if "message" in problem:  # pre-built message (tests)
        messages.append(problem["message"])
    else:
        messages.append(multimodal_message(problem["image"], question))

    llm_call = await llm_async_generate(llm, Prompt(messages=messages), session)
    trace = make_training_text(llm, llm_call)
    answer_status = evaluate_answer(llm_call.output.content or "", problem["answer"])

    table = RewardTable(**dict(cfg.get("rewards", {}) or {}))
    reward = get_reward(answer_status, trace.finished, table)
    discount = float(cfg.actor.get("discount_factor", 1.0))
    reward *= discount ** llm_call.output_length_tokens
    trace.reward = reward

    metrics = BaseMetrics(
        reward=reward,
        success=answer_status == "correct",
        no_error=answer_status != "unparsable",
        no_answer=answer_status == "no_answer",
    )
    return RolloutResult(
        training_texts=[trace],
        metrics=metrics,
        latency=time.time() - time_start,
        dataset_name=problem.get("dataset"),
        domain=DOMAIN,
    )
