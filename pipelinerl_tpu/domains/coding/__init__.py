"""Coding domain: code-generation tasks verified by running test cases.

Reference: /root/reference/pipelinerl/domains/coding/ (verifier_api.py,
rollouts.py, dataset.py, livecodebench.py)."""

from .rollouts import CodingMetrics, generate_coding_rollout  # noqa: F401
from .verifier import evaluate_coding_prediction, extract_code, outputs_match  # noqa: F401
from .dataset import load_datasets, load_problems  # noqa: F401
