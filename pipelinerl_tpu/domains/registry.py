"""Dotted-path function resolution and multi-domain dispatch.

Replaces ``hydra.utils.get_method`` (reference actor.py:141,803) and the
domain dispatcher (reference domains/dispatcher.py:74-110)."""

from __future__ import annotations

import importlib
from typing import Any, Callable

# default rollout generators per domain (reference conf/domain_rollouts/base.yaml)
DEFAULT_DOMAIN_ROLLOUTS: dict[str, str] = {
    "guessing": "pipelinerl_tpu.domains.guessing.generate_guessing_rollout",
    "counting": "pipelinerl_tpu.domains.counting.generate_counting_rollout",
    "bandit": "pipelinerl_tpu.domains.bandit.generate_bandit_rollout",
    "math": "pipelinerl_tpu.domains.math.rollouts.generate_math_rollout",
    "tir": "pipelinerl_tpu.domains.tir.rollouts.generate_tir_rollout",
    "coding": "pipelinerl_tpu.domains.coding.rollouts.generate_coding_rollout",
    "fn_calling": "pipelinerl_tpu.domains.fn_calling.rollouts.generate_fn_calling_rollout",
    "ifeval": "pipelinerl_tpu.domains.ifeval.rollouts.generate_ifeval_rollout",
    "logic": "pipelinerl_tpu.domains.logic.rollouts.generate_logic_rollout",
    "deep_research": "pipelinerl_tpu.domains.deep_research.rollouts.generate_research_rollout",
    "miniwob": "pipelinerl_tpu.domains.miniwob.rollouts.generate_miniwob_rollout",
    "chartqa": "pipelinerl_tpu.domains.chartqa.generate_chartqa_rollout",
    "vlm_bandit": "pipelinerl_tpu.domains.vlm_bandit.generate_vlm_bandit_rollout",
}

_RUNTIME_REGISTRY: dict[str, str] = {}


def register_domain(domain: str, dotted_path: str) -> None:
    _RUNTIME_REGISTRY[domain] = dotted_path


def resolve(dotted_path: str) -> Callable:
    module_name, _, attr = dotted_path.rpartition(".")
    if not module_name:
        raise ValueError(f"Not a dotted path: {dotted_path!r}")
    module = importlib.import_module(module_name)
    try:
        return getattr(module, attr)
    except AttributeError:
        raise ImportError(f"{module_name!r} has no attribute {attr!r}") from None


def resolve_domain_rollout(domain: str, overrides: dict[str, str] | None = None) -> Callable:
    table = {**DEFAULT_DOMAIN_ROLLOUTS, **_RUNTIME_REGISTRY, **(overrides or {})}
    if domain not in table:
        raise KeyError(f"No rollout generator registered for domain {domain!r}")
    return resolve(table[domain])


async def generate_dispatched_rollout(cfg: Any, llm: Any, problem: dict, session: Any):
    """Multi-domain dispatch by problem['domain'] (reference dispatcher.py:74-99)."""
    domain = problem.get("domain")
    if not domain:
        raise ValueError("problem has no 'domain' key for dispatch")
    overrides = None
    if cfg is not None:
        dr = cfg.get("domain_rollouts") if hasattr(cfg, "get") else None
        if dr:
            overrides = {k: v for k, v in dr.items()}
    fn = resolve_domain_rollout(domain, overrides)
    return await fn(cfg, llm, problem, session)
