"""Math dataset loaders.

Reference: /root/reference/pipelinerl/domains/math/load_datasets.py:319-560
(Eurus train/validation, MATH train/test, SimpleRL, DeepScaler, ORZ
57k/72k/hard-13k, MATH-500, Omni-MATH-500, OpenR1-220k, Nemotron-Cascade,
GSM8K, LIMO, GPQA main/diamond, AIME 2022-2025, AMC 2022-2023 (each with
16x-upsampled and ``_original`` variants), countdown, generic ``org/name``
HF paths, and local custom jsonl files). Problems are dicts with ``task``
(the question), ``answer`` (gold, usually ``\\boxed{...}``), ``dataset``,
``id`` and ``domain``.

Design differences from the reference:
- a declarative registry (name -> source + row normalizer + upsample) instead
  of a 240-line if-chain, so every family's normalizer is unit-testable on
  recorded fixture rows without network;
- this environment has zero egress, so hub fetches resolve only from the
  local HF cache; unreachable datasets are skipped with a warning when
  ``strict=False`` (launch passes strict=True so misconfigured runs fail).
Hermetic synthetic sets (arithmetic, countdown) always work and power tests.
"""

from __future__ import annotations

import json
import logging
import random
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Iterable

logger = logging.getLogger(__name__)

DOMAIN = "math"

Row = dict[str, Any]
Normalizer = Callable[[Row], Row | None]


def _boxed(answer: Any) -> str:
    text = str(answer)
    return text if text.startswith("\\boxed{") else "\\boxed{" + text + "}"


# ---------------------------------------------------------------------------
# Per-family row normalizers (ref load_datasets.py:24-139). Each takes one
# raw dataset row and returns {"task","answer"} or None to drop the row.
# ---------------------------------------------------------------------------


def normalize_eurus(row: Row) -> Row | None:
    """Eurus-2-RL rows: chat prompt + reward_model ground truth (ref :24-36)."""
    if row.get("ability") != "math":
        return None
    prompt = row.get("prompt") or []
    task = None
    for msg in prompt:
        if msg.get("role") == "user":
            task = msg.get("content")
    if not task:
        return None
    task = task.replace(
        "\n\nPresent the answer in LaTex format: \\boxed{Your answer}", ""
    )
    gt = (row.get("reward_model") or {}).get("ground_truth")
    if gt is None:
        return None
    return {"task": task, "answer": _boxed(gt)}


def normalize_math(row: Row) -> Row | None:
    """MATH-style rows: problem/question + answer/solution (ref :39-72)."""
    verify = row.get("correctness_math_verify")
    if verify is not None and not any(verify):
        return None
    task = row.get("problem") or row.get("question")
    if not task:
        return None
    if "answer" in row and row["answer"] is not None:
        answer = _boxed(row["answer"])
    elif row.get("solution"):
        answer = row["solution"]
    else:
        return None
    out = {"task": task, "answer": answer}
    level = row.get("level")
    typ = row.get("type") or row.get("subject")
    if level:
        out["level"] = level
    if typ:
        out["type"] = typ
    return out


def normalize_gsm8k(row: Row) -> Row | None:
    """GSM8K rows: '#### <answer>' suffix holds the gold (ref :75-81)."""
    answer = row.get("answer", "")
    if "####" not in answer:
        return None
    return {"task": row["question"], "answer": answer.split("####")[1].strip()}


def normalize_limo(row: Row) -> Row | None:
    """LIMO rows (ref :84-92)."""
    if not row.get("question") or row.get("answer") is None:
        return None
    return {"task": row["question"], "answer": _boxed(row["answer"])}


def normalize_competition(row: Row) -> Row | None:
    """AIME/AMC rows: problem + short numeric answer (ref :95-103)."""
    if not row.get("problem") or row.get("answer") is None:
        return None
    return {"task": row["problem"], "answer": _boxed(row["answer"])}


def normalize_open_reasoner(row: Row) -> Row | None:
    """ORZ rows: ``{"0": {"value": task}, "1": {"ground_truth": {...}}}``
    (ref :106-116)."""
    try:
        task = row["0"]["value"]
        gt = row["1"]["ground_truth"]["value"]
    except (KeyError, TypeError):
        return None
    return {"task": task, "answer": _boxed(gt)}


def normalize_gpqa(row: Row) -> Row | None:
    """GPQA rows pre-rendered with problem/solution (ref :119-125)."""
    if not row.get("problem") or row.get("solution") is None:
        return None
    return {"task": row["problem"], "answer": row["solution"]}


def normalize_countdown(row: Row) -> Row | None:
    """Countdown rows: strip the chat template, keep target+nums in the
    answer key for the countdown verifier (ref :128-138)."""
    prompt = row.get("prompt")
    if isinstance(prompt, list):
        problem = prompt[0].get("content", "")
    else:
        problem = str(prompt or "")
    problem = problem.split("<|im_start|>user")[-1]
    problem = problem.split("<|im_start|>assistant")[0]
    problem = problem.split("<|im_end|>")[0].strip()
    if not problem:
        return None
    answer = "-".join(["countdown", str(row.get("target")), str(row.get("nums"))])
    return {"task": problem, "answer": answer}


# ---------------------------------------------------------------------------
# Registry: dataset name -> where to fetch + how to normalize each row.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DatasetSpec:
    hub: str  # HF hub path, or "json" for raw-url json files
    normalizer: Normalizer
    split: str = "train"
    subset: str | None = None
    data_files: str | None = None  # for hub == "json"
    upsample: int = 1
    url_filter: str | None = None  # substring filter on row["url"] (AIME/AMC years)


_ORZ_RAW = "https://raw.githubusercontent.com/Open-Reasoner-Zero/Open-Reasoner-Zero/refs/heads/main/data"
_SIMPLERL_RAW = (
    "https://raw.githubusercontent.com/hkust-nlp/simpleRL-reason/refs/heads/v0/"
    "train/data/math_level3to5_data_processed_with_qwen_prompt.json"
)

REGISTRY: dict[str, DatasetSpec] = {
    "eurus_train": DatasetSpec("PRIME-RL/Eurus-2-RL-Data", normalize_eurus),
    "eurus_validation": DatasetSpec(
        "PRIME-RL/Eurus-2-RL-Data", normalize_eurus, split="validation"
    ),
    "math_train": DatasetSpec("hendrycks/competition_math", normalize_math),
    "math_test": DatasetSpec("hendrycks/competition_math", normalize_math, split="test"),
    "math_simplerl_train": DatasetSpec(
        "json", normalize_math, data_files=_SIMPLERL_RAW
    ),
    "deepscaler_preview": DatasetSpec(
        "agentica-org/DeepScaleR-Preview-Dataset", normalize_math
    ),
    "nemotron_cascade_math": DatasetSpec(
        "nvidia/Nemotron-Cascade-RL-Math", normalize_math
    ),
    "omni_math_500": DatasetSpec(
        "reliable-agents/Omni-MATH-500", normalize_math, split="test"
    ),
    "math_500": DatasetSpec("HuggingFaceH4/MATH-500", normalize_math, split="test"),
    "open_r1_math_220k": DatasetSpec(
        "open-r1/OpenR1-Math-220k", normalize_math, split="default"
    ),
    "gpqa_main": DatasetSpec("hendrydong/gpqa_main", normalize_gpqa, split="test"),
    "gpqa_diamond": DatasetSpec("hendrydong/gpqa_diamond", normalize_gpqa, split="test"),
    "gsm8k_train": DatasetSpec("openai/gsm8k", normalize_gsm8k, subset="main"),
    "gsm8k_test": DatasetSpec(
        "openai/gsm8k", normalize_gsm8k, subset="main", split="test"
    ),
    "limo": DatasetSpec("GAIR/LIMO", normalize_limo),
    "open_reasoner_zero_57k": DatasetSpec(
        "json", normalize_open_reasoner,
        data_files=f"{_ORZ_RAW}/orz_math_57k_collected.json",
    ),
    "open_reasoner_zero_extended_72k": DatasetSpec(
        "json", normalize_open_reasoner,
        data_files=f"{_ORZ_RAW}/orz_math_72k_collection_extended.json",
    ),
    "open_reasoner_zero_hard_13k": DatasetSpec(
        "json", normalize_open_reasoner,
        data_files=f"{_ORZ_RAW}/orz_math_13k_collection_hard.json",
    ),
}

# AIME/AMC: per-year url-filtered competition sets, train names upsampled 16x,
# "_original" names kept at 1x for eval (ref :159-198, :467-505).
for _year in (2022, 2023, 2024):
    REGISTRY[f"aime_{_year}_original"] = DatasetSpec(
        "AI-MO/aimo-validation-aime", normalize_competition, url_filter=str(_year)
    )
    REGISTRY[f"aime_{_year}"] = DatasetSpec(
        "AI-MO/aimo-validation-aime",
        normalize_competition,
        url_filter=str(_year),
        upsample=16,
    )
REGISTRY["aime_2025_original"] = DatasetSpec(
    "MathArena/aime_2025", normalize_competition
)
REGISTRY["aime_2025"] = DatasetSpec(
    "MathArena/aime_2025", normalize_competition, upsample=16
)
for _year in (2022, 2023):
    REGISTRY[f"amc_{_year}_original"] = DatasetSpec(
        "AI-MO/aimo-validation-amc", normalize_competition, url_filter=str(_year)
    )
    REGISTRY[f"amc_{_year}"] = DatasetSpec(
        "AI-MO/aimo-validation-amc",
        normalize_competition,
        url_filter=str(_year),
        upsample=16,
    )

# Hub names the registry already covers; generic org/name loading skips these
# (ref _PREDEFINED_HF_DATASETS, :298-309).
_PREDEFINED_HUBS = {spec.hub for spec in REGISTRY.values() if spec.hub != "json"}


def normalize_rows(
    rows: Iterable[Row], spec: DatasetSpec, dataset_name: str
) -> list[Row]:
    """Apply a spec's normalizer + url filter + upsample to raw rows."""
    samples = []
    for row in rows:
        if spec.url_filter and spec.url_filter not in str(row.get("url", "")):
            continue
        std = spec.normalizer(dict(row))
        if std is None:
            continue
        std["dataset"] = dataset_name
        std["domain"] = DOMAIN
        samples.append(std)
    original = len(samples)
    if spec.upsample > 1:
        samples = samples * spec.upsample
        logger.info(
            "%s: %d samples (upsampled from %d)", dataset_name, len(samples), original
        )
    return samples


def _fetch_rows(spec: DatasetSpec) -> Iterable[Row]:
    from datasets import load_dataset

    if spec.hub == "json":
        ds = load_dataset("json", data_files=spec.data_files, split=spec.split)
    else:
        ds = load_dataset(spec.hub, spec.subset, split=spec.split)
    return (dict(r) for r in ds)


def _is_hf_dataset_path(name: str) -> bool:
    """``org/name`` (exactly one slash, no json extension) — ref :281-295."""
    if name.count("/") != 1 or name.endswith((".jsonl", ".json")):
        return False
    org, ds = name.split("/")
    return bool(org) and bool(ds)


def _load_file(path: Path, dataset_name: str | None = None) -> list[Row]:
    if path.suffix == ".jsonl":
        rows = [json.loads(line) for line in path.read_text().splitlines() if line.strip()]
    elif path.suffix == ".json":
        rows = json.loads(path.read_text())
    elif path.suffix == ".parquet":
        from datasets import Dataset

        rows = [dict(r) for r in Dataset.from_parquet(str(path))]
    else:
        raise ValueError(f"Unsupported dataset file {path}")
    name = dataset_name or path.stem
    out = []
    for row in rows:
        if "task" in row and "answer" in row:  # already standardized
            std = dict(row)
        else:
            std = normalize_math(row)
            if std is None:
                continue
        std.setdefault("dataset", name)
        std["domain"] = DOMAIN
        out.append(std)
    return out


def _resolve_custom(name: str) -> Path | None:
    """Search datasets/custom{,_runs}/ and plain paths (ref :240-278)."""
    names = [name] if name.endswith((".jsonl", ".json", ".parquet")) else [name, f"{name}.jsonl"]
    for n in names:
        for candidate in (Path(n), Path("datasets/custom") / n, Path("datasets/custom_runs") / n):
            if candidate.exists() and candidate.is_file():
                return candidate
    return None


# ---------------------------------------------------------------------------
# Hermetic synthetic sets (always available; power tests and CPU runs).
# ---------------------------------------------------------------------------


def _synthetic_arithmetic(n: int = 512, seed: int = 0, name: str = "synthetic_arithmetic") -> list[Row]:
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


def _synthetic_countdown(n: int = 256, seed: int = 0) -> list[Row]:
    rng = random.Random(seed)
    problems = []
    for _ in range(n):
        nums = [rng.randint(2, 30) for _ in range(4)]
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


def load_datasets(
    dataset_names: list[str] | str | None,
    seed: int | None = None,
    strict: bool = True,
) -> list[Row]:
    """Load and concatenate named datasets, assigning per-dataset ids.

    ``strict=False`` skips (with a warning) datasets whose hub source is
    unreachable — useful in air-gapped test environments.
    """
    if dataset_names is None:
        return []
    if isinstance(dataset_names, str):
        dataset_names = [dataset_names]
    dataset_names = list(dict.fromkeys(dataset_names))  # de-dup, keep order

    problems: list[Row] = []
    for name in dataset_names:
        try:
            if name.startswith("synthetic_arithmetic"):
                samples = _synthetic_arithmetic(name=name)
            elif name == "countdown":
                samples = _synthetic_countdown()
            elif name in REGISTRY:
                spec = REGISTRY[name]
                samples = normalize_rows(_fetch_rows(spec), spec, name)
            elif (custom := _resolve_custom(name)) is not None:
                samples = _load_file(custom, dataset_name=Path(name).stem)
            elif _is_hf_dataset_path(name) and name not in _PREDEFINED_HUBS:
                spec = DatasetSpec(name, normalize_math)
                samples = normalize_rows(_fetch_rows(spec), spec, name)
            else:
                raise ValueError(
                    f"Unknown math dataset {name!r} (not a registry name, org/name "
                    "hub path, or local file)"
                )
        except ValueError:
            raise
        except Exception as exc:  # hub unreachable / not cached
            if strict:
                raise
            logger.warning("Skipping dataset %s (unavailable: %s)", name, exc)
            continue
        for i, sample in enumerate(samples):
            sample.setdefault("id", i)
        problems.extend(samples)
        logger.info("Loaded %s -> %d problems total", name, len(problems))
    if seed is not None:
        random.Random(seed).shuffle(problems)
    return problems


# reference exposes the loader as load_datasets; keep load_problems alias
load_problems = load_datasets
