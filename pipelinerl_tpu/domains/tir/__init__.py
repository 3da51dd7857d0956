"""Tool-integrated reasoning (TIR) domain.

Reference: /root/reference/pipelinerl/domains/tir/ + rl_tool_parser_plugin.py."""

from .rollouts import generate_tir_rollout  # noqa: F401
from .tool_parser import ToolCall, parse_tool_calls  # noqa: F401
