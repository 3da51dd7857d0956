"""Deep-research domain (reference domains/deep_research/tapeagents_rollouts.py).

The reference wraps TapeAgents with an unimplemented reward (reward=0 TODO,
tapeagents_rollouts.py:32). This implementation keeps the same shape — a
multi-step research agent emitting one TrainingText per LLM call — but is
self-contained: search/read tools over a document corpus (in-process or via
the env-server job kind) and a verified final-answer reward.
"""

from .rollouts import generate_research_rollout  # noqa: F401
from .environment import ResearchCorpus, build_corpus, load_problems  # noqa: F401
