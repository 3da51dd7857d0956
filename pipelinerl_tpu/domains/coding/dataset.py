"""Coding dataset loaders (reference domains/coding/dataset.py +
livecodebench.py): TACO/APPS-style rows with {"inputs", "outputs"} test
dicts, LiveCodeBench-style rows, local files, and a hermetic synthetic set."""

from __future__ import annotations

import json
import logging
import random
from pathlib import Path
from typing import Any

logger = logging.getLogger(__name__)

DOMAIN = "coding"

_HF_SOURCES = {
    "taco": ("BAAI/TACO", None, "train"),
    "apps": ("codeparrot/apps", "all", "train"),
    "livecodebench": ("livecodebench/code_generation_lite", None, "test"),
}


def _standardize(row: dict[str, Any], dataset: str) -> dict[str, Any] | None:
    task = row.get("question") or row.get("task") or row.get("question_content")
    tests = row.get("input_output") or row.get("tests") or row.get("public_test_cases")
    if isinstance(tests, str):
        try:
            tests = json.loads(tests)
        except json.JSONDecodeError:
            tests = None
    if not task or not tests:
        return None
    return {"task": str(task), "tests": tests, "dataset": dataset, "domain": DOMAIN}


def _synthetic_coding(n: int = 128, seed: int = 0) -> list[dict]:
    """Hermetic set: trivially checkable stdin/stdout transforms."""
    rng = random.Random(seed)
    problems = []
    for _ in range(n):
        a, b = rng.randint(1, 99), rng.randint(1, 99)
        problems.append(
            {
                "task": (
                    "Read two integers from stdin (one per line) and print "
                    "their sum."
                ),
                "tests": {
                    "inputs": [f"{a}\n{b}", f"{b}\n{a}"],
                    "outputs": [str(a + b), str(a + b)],
                },
                "dataset": "synthetic_coding",
                "domain": DOMAIN,
            }
        )
    return problems


def load_datasets(dataset_names: list[str]) -> list[dict]:
    problems: list[dict] = []
    for name in dataset_names:
        if name == "synthetic_coding":
            problems.extend(_synthetic_coding())
        elif name in _HF_SOURCES:
            hub, subset, split = _HF_SOURCES[name]
            from datasets import load_dataset

            ds = load_dataset(hub, subset, split=split, trust_remote_code=False)
            for row in ds:
                std = _standardize(dict(row), name)
                if std:
                    problems.append(std)
        elif Path(name).exists():
            rows = [
                json.loads(line)
                for line in Path(name).read_text().splitlines()
                if line.strip()
            ]
            for row in rows:
                std = _standardize(row, Path(name).stem)
                if std:
                    problems.append(std)
        else:
            raise ValueError(f"Unknown coding dataset {name!r}")
        logger.info("Loaded %s → %d problems total", name, len(problems))
    return problems


load_problems = load_datasets
