"""Logic-puzzle domain (reference domains/logic/*).

The reference vendors ~3.7 kLoC of third-party INTELLECT-3 puzzle verifiers
(i3_logic). This package provides the same contract with self-written
verifiers for a representative family of logic tasks plus synthetic problem
generators so the domain works offline; the HF INTELLECT-3 loader path is
gated on dataset availability (reference domains/logic/dataset.py:14-45).
"""

from .rollouts import generate_logic_rollout  # noqa: F401
from .dataset import load_problems  # noqa: F401
from .verifiers import verify_answer, VERIFIERS  # noqa: F401
