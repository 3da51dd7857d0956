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


class StreamingToolParser:
    """Incremental ``<tool_call>{json}</tool_call>`` extraction from SSE
    deltas (the reference plugin's streaming mode,
    /root/reference/pipelinerl/rl_tool_parser_plugin.py:43-201): feed each
    delta, get back the content that is safe to emit (tool blocks and
    partial tags held back) plus any tool calls whose closing tag just
    arrived — the signal an SSE server uses to terminate generation early
    instead of decoding tokens past the call."""

    _OPEN = "<tool_call>"
    _CLOSE = "</tool_call>"

    def __init__(self) -> None:
        self._buf = ""
        self._in_call = False
        self.calls: list[ToolCall] = []

    def feed(self, delta: str) -> tuple[str, list[ToolCall]]:
        """→ (releasable content delta, tool calls completed by this delta)."""
        self._buf += delta
        content: list[str] = []
        new_calls: list[ToolCall] = []
        while True:
            if self._in_call:
                end = self._buf.find(self._CLOSE)
                if end == -1:
                    break  # wait for the closing tag
                raw = self._buf[:end]
                self._buf = self._buf[end + len(self._CLOSE):]
                self._in_call = False
                try:
                    call = _call_from_obj(json.loads(raw.strip()))
                except json.JSONDecodeError:
                    call = None
                if call:
                    new_calls.append(call)
                    self.calls.append(call)
            else:
                start = self._buf.find(self._OPEN)
                if start != -1:
                    content.append(self._buf[:start])
                    self._buf = self._buf[start + len(self._OPEN):]
                    self._in_call = True
                    continue
                # hold back any trailing partial "<tool_call" prefix
                hold = 0
                for h in range(min(len(self._buf), len(self._OPEN) - 1), 0, -1):
                    if self._OPEN.startswith(self._buf[-h:]):
                        hold = h
                        break
                if hold:
                    content.append(self._buf[:-hold])
                    self._buf = self._buf[-hold:]
                else:
                    content.append(self._buf)
                    self._buf = ""
                break
        return "".join(content), new_calls

    def flush(self) -> str:
        """End of stream: release whatever is still buffered (an unclosed
        tool block is returned as plain text, tags included)."""
        out = (self._OPEN + self._buf) if self._in_call else self._buf
        self._buf = ""
        self._in_call = False
        return out
