"""Function-calling domain (BFCL-style AST verification).

Reference: /root/reference/pipelinerl/domains/fn_calling/ (verifier_api.py
using the bfcl-eval package; re-implemented here as a self-contained AST
comparator)."""

from .rollouts import generate_fn_calling_rollout  # noqa: F401
from .verifier import ast_match_score, parse_call  # noqa: F401
from .dataset import load_datasets, load_problems  # noqa: F401
