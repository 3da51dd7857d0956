"""Instruction-following domain (IFEval-style verifiable instructions).

Reference: /root/reference/pipelinerl/domains/ifeval/ (which vendors
Google's IFEvalG checkers). The checkers here are an independent
implementation of the common instruction types from their published
semantics."""

from .checkers import CHECKERS, check_instruction  # noqa: F401
from .rollouts import generate_ifeval_rollout  # noqa: F401
from .dataset import load_datasets, load_problems  # noqa: F401
