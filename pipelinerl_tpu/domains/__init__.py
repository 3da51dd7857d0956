"""Pluggable task domains: load_problems + generate_rollout per domain.

Same plugin contract as the reference (README.md:47-68, rollouts.py:60-68):
``load_problems(dataset_names) -> list[dict]`` and
``async generate_rollout(cfg, llm, problem, session) -> RolloutResult``,
resolved by dotted path (registry.resolve) exactly like the reference's
``hydra.utils.get_method`` (actor.py:141).
"""

from .registry import resolve, resolve_domain_rollout  # noqa: F401
