"""Math domain: \\boxed answers, verifier service, reward tables.

Reference: /root/reference/pipelinerl/domains/math/ (rollouts.py,
verifier_api.py, load_datasets.py)."""

from .load_datasets import load_datasets, load_problems  # noqa: F401
from .rollouts import RewardTable, generate_math_rollout, get_reward  # noqa: F401
from .verifier import grade_answer  # noqa: F401
from .verifier_api import MathEnvironment, verify_answer_rpc  # noqa: F401
