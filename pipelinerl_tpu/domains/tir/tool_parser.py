"""Tool-call extraction from generated text.

Host-side replacement for the reference's vLLM ToolParser plugin
(/root/reference/pipelinerl/rl_tool_parser_plugin.py:43-201 — Hermes
``<tool_call>{json}</tool_call>`` plus the Apriel ``<tool_calls>[...]``
variant and ``[BEGIN FINAL RESPONSE]`` sections). Token-native engines parse
after decode, so no server plugin mechanism is needed.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field


@dataclass
class ToolFunction:
    name: str
    arguments: str  # JSON string, like the OpenAI wire format


@dataclass
class ToolCall:
    function: ToolFunction
    id: str = field(default_factory=lambda: f"call_{uuid.uuid4().hex[:8]}")
    type: str = "function"

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "type": self.type,
            "function": {"name": self.function.name, "arguments": self.function.arguments},
        }


_TOOL_CALL_RE = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.S)
_TOOL_CALLS_RE = re.compile(r"<tool_calls>\s*(.*?)\s*</tool_calls>", re.S)
_FINAL_RESPONSE_RE = re.compile(
    r"\[BEGIN FINAL RESPONSE\](.*?)(?:\[END FINAL RESPONSE\]|$)", re.S
)


def _call_from_obj(obj: dict) -> ToolCall | None:
    if not isinstance(obj, dict):
        return None
    name = obj.get("name") or (obj.get("function") or {}).get("name")
    if not name:
        return None
    args = obj.get("arguments", (obj.get("function") or {}).get("arguments", {}))
    if not isinstance(args, str):
        args = json.dumps(args)
    return ToolCall(function=ToolFunction(name=str(name), arguments=args))


def parse_tool_calls(text: str) -> tuple[list[ToolCall], str]:
    """→ (tool_calls, content_without_tool_blocks)."""
    calls: list[ToolCall] = []
    for raw in _TOOL_CALL_RE.findall(text):
        try:
            obj = json.loads(raw)
        except json.JSONDecodeError:
            continue
        call = _call_from_obj(obj)
        if call:
            calls.append(call)
    for raw in _TOOL_CALLS_RE.findall(text):
        try:
            arr = json.loads(raw)
        except json.JSONDecodeError:
            continue
        if isinstance(arr, list):
            for obj in arr:
                call = _call_from_obj(obj)
                if call:
                    calls.append(call)
    content = _TOOL_CALL_RE.sub("", text)
    content = _TOOL_CALLS_RE.sub("", content)
    final = _FINAL_RESPONSE_RE.search(content)
    if final:
        content = final.group(1)
    return calls, content.strip()
