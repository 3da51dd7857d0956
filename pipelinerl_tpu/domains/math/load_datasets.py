"""Math dataset loaders.

Reference: /root/reference/pipelinerl/domains/math/load_datasets.py:319-560
(Eurus, MATH, SimpleRL, DeepScaler, ORZ-57k/72k, MATH-500, AIME-2024/2025
upsampled, AMC, GPQA, countdown, custom paths). Problems are dicts with
``task`` (the question), ``answer`` (gold), ``dataset`` and ``domain``.

This environment has zero egress, so HF-hub names resolve only when already
cached; local files (jsonl/json/parquet) and the hermetic synthetic sets
always work. Dataset-name registry keeps the reference's names.
"""

from __future__ import annotations

import json
import logging
import random
from pathlib import Path
from typing import Any, Callable

logger = logging.getLogger(__name__)

DOMAIN = "math"

# HF hub sources for the reference's named datasets (resolved via the local
# HF cache; kept for parity — reference load_datasets.py:319-560)
_HF_SOURCES: dict[str, tuple[str, str | None, str]] = {
    # name: (hub path, subset, split)
    "math": ("EleutherAI/hendrycks_math", None, "train"),
    "math_500": ("HuggingFaceH4/MATH-500", None, "test"),
    "eurus_train": ("PRIME-RL/Eurus-2-RL-Data", None, "train"),
    "deepscaler": ("agentica-org/DeepScaleR-Preview-Dataset", None, "train"),
    "open_reasoner_zero_57k": ("Open-Reasoner-Zero/orz_math_57k_collected", None, "train"),
    "open_reasoner_zero_extended_72k": ("Open-Reasoner-Zero/orz_math_72k_collection_extended", None, "train"),
    "simplerl_math_35": ("zwhe99/simplerl-minerva-math", None, "train"),
    "aime_2024": ("HuggingFaceH4/aime_2024", None, "train"),
    "aime_2025": ("yentinglin/aime_2025", None, "train"),
    "amc_2023": ("zwhe99/amc23", None, "test"),
    "gpqa_diamond": ("Idavidrein/gpqa", "gpqa_diamond", "train"),
}

# eval sets the reference upsamples for tighter pass@1 estimates
_UPSAMPLE = {"aime_2024": 4, "aime_2025": 4, "amc_2023": 4}


def _standardize(row: dict[str, Any], dataset: str) -> dict[str, Any] | None:
    task = (
        row.get("problem")
        or row.get("question")
        or row.get("prompt")
        or row.get("task")
        or row.get("Question")
    )
    answer = (
        row.get("answer")
        or row.get("solution")
        or row.get("final_answer")
        or row.get("Answer")
        or row.get("expected_answer")
    )
    if isinstance(task, list):  # Eurus-style chat prompt
        task = next((m.get("content") for m in task if m.get("role") == "user"), None)
    if not task or answer is None:
        return None
    return {
        "task": str(task),
        "answer": str(answer),
        "dataset": dataset,
        "domain": DOMAIN,
    }


def _load_hf(name: str) -> list[dict]:
    hub, subset, split = _HF_SOURCES[name]
    from datasets import load_dataset

    ds = load_dataset(hub, subset, split=split)
    problems = []
    for row in ds:
        std = _standardize(dict(row), name)
        if std:
            problems.append(std)
    return problems * _UPSAMPLE.get(name, 1)


def _load_file(path: str) -> list[dict]:
    p = Path(path)
    rows: list[dict]
    if p.suffix in (".jsonl",):
        rows = [json.loads(line) for line in p.read_text().splitlines() if line.strip()]
    elif p.suffix == ".json":
        rows = json.loads(p.read_text())
    elif p.suffix == ".parquet":
        from datasets import Dataset

        rows = [dict(r) for r in Dataset.from_parquet(str(p))]
    else:
        raise ValueError(f"Unsupported dataset file {path}")
    out = []
    for row in rows:
        std = _standardize(row, p.stem)
        if std:
            out.append(std)
    return out


def _synthetic_arithmetic(n: int = 512, seed: int = 0, name: str = "synthetic_arithmetic") -> list[dict]:
    """Hermetic dataset: multi-digit arithmetic with \\boxed gold answers."""
    rng = random.Random(seed)
    problems = []
    for _ in range(n):
        a, b = rng.randint(10, 999), rng.randint(10, 999)
        op = rng.choice(["+", "-", "*"])
        answer = {"+": a + b, "-": a - b, "*": a * b}[op]
        problems.append(
            {
                "task": f"What is {a} {op} {b}?",
                "answer": f"\\boxed{{{answer}}}",
                "dataset": name,
                "domain": DOMAIN,
            }
        )
    return problems


def _synthetic_countdown(n: int = 256, seed: int = 0) -> list[dict]:
    rng = random.Random(seed)
    problems = []
    for _ in range(n):
        nums = [rng.randint(2, 30) for _ in range(4)]
        # build a guaranteed-solvable target
        a, b, c, d = nums
        target = a * b + c - d
        problems.append(
            {
                "task": (
                    f"Using the numbers {nums} exactly once each with + - * / and "
                    "parentheses, write an expression equal to "
                    f"{target}. Output it as <answer>expression</answer>."
                ),
                "numbers": nums,
                "target": target,
                "answer": str(target),
                "dataset": "countdown",
                "domain": DOMAIN,
            }
        )
    return problems


def load_datasets(dataset_names: list[str]) -> list[dict]:
    problems: list[dict] = []
    for name in dataset_names:
        if name.startswith("synthetic_arithmetic"):
            problems.extend(_synthetic_arithmetic(name=name))
        elif name == "countdown":
            problems.extend(_synthetic_countdown())
        elif name in _HF_SOURCES:
            problems.extend(_load_hf(name))
        elif Path(name).exists():
            problems.extend(_load_file(name))
        else:
            raise ValueError(
                f"Unknown math dataset {name!r} (not a registry name or local path)"
            )
        logger.info("Loaded %s → %d problems total", name, len(problems))
    return problems


# reference exposes the loader as load_datasets; keep load_problems alias
load_problems: Callable[[list[str]], list[dict]] = load_datasets
