"""MiniWoB web-agent domain (reference domains/miniwob/*).

The reference drives BrowserGym MiniWoB tasks through TapeAgents with a pool
of remote environment servers (health checks + failover,
rollouts.py:106-147). BrowserGym is not in this image, so the environment
server hosts EITHER real BrowserGym sessions (gated import) or the
self-contained simulated web tasks in ``simulated_env.py`` — same HTTP
surface, same reward contract (REWARD_GLOBAL), so the rollout path,
failover, and reward shaping are fully exercisable offline.
"""

from .rollouts import generate_miniwob_rollout  # noqa: F401
from .load_tasks import load_tasks  # noqa: F401
