"""Code execution backends for TIR rollouts.

- ``SandboxFusionClient``: HTTP client for a SandboxFusion-compatible remote
  execution service (the reference's backend, tir/rollouts.py:76-116 —
  kept as an external host-side service, SURVEY.md §2.4).
- ``safe_expression_executor``: hermetic fallback that evaluates pure
  arithmetic expressions only (no code execution) so TIR tests and smoke
  runs work in a zero-egress sandboxless environment.

Both apply the reference's code-safety regex blocklist
(tir/rollouts.py:25-37) before anything leaves the process.
"""

from __future__ import annotations

import logging
import re

import aiohttp

logger = logging.getLogger(__name__)

BLOCKED_PATTERNS = [
    re.compile(r"\bsys\.exit\b"),
    re.compile(r"\bos\._exit\b"),
    re.compile(r"\bos\.system\b"),
    re.compile(r"\bsubprocess\b"),
    re.compile(r"\bos\.popen\b"),
    re.compile(r"\bos\.exec\w*\b"),
    re.compile(r"\bos\.spawn\w*\b"),
    re.compile(r"\bos\.kill\b"),
    re.compile(r"\bshutil\.rmtree\b"),
    re.compile(r"\bos\.remove\b"),
    re.compile(r"\bos\.unlink\b"),
]


def check_code_safety(code: str) -> str | None:
    for pattern in BLOCKED_PATTERNS:
        if pattern.search(code):
            return f"Blocked: code contains forbidden pattern '{pattern.pattern}'"
    return None


class SandboxFusionClient:
    """POST /run_code against a SandboxFusion service."""

    def __init__(self, endpoint: str, timeout: float = 30.0):
        self.endpoint = endpoint.rstrip("/")
        self.timeout = timeout

    async def execute(self, code: str, session: aiohttp.ClientSession | None = None) -> str:
        rejection = check_code_safety(code)
        if rejection is not None:
            return rejection
        body = {"code": code, "language": "python", "run_timeout": self.timeout}
        owns = session is None
        if owns:
            session = aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=self.timeout + 10)
            )
        try:
            async with session.post(f"{self.endpoint}/run_code", json=body) as resp:
                resp.raise_for_status()
                data = await resp.json()
        except Exception as exc:  # noqa: BLE001 — any transport error → message
            return f"[execution error: {exc}]"
        finally:
            if owns:
                await session.close()
        run = data.get("run_result") or {}
        parts = []
        if run.get("stdout"):
            parts.append(str(run["stdout"]).rstrip())
        if run.get("stderr"):
            parts.append(f"[stderr]\n{str(run['stderr']).rstrip()}")
        status = str(data.get("status", "")).lower()
        if "timeout" in status or "timeout" in str(data.get("message", "")).lower():
            parts.append("[execution timed out]")
        if not parts:
            parts.append("[no output]")
        return "\n".join(parts)


async def safe_expression_executor(code: str, session=None) -> str:
    """Evaluate `print(<arith expr>)` / bare expressions without running any
    code — hermetic test backend."""
    rejection = check_code_safety(code)
    if rejection is not None:
        return rejection
    from ..math.verifier import _safe_eval

    lines = [l.strip() for l in code.strip().splitlines() if l.strip()]
    outputs = []
    for line in lines:
        m = re.fullmatch(r"print\((.*)\)", line)
        expr = m.group(1) if m else line
        val = _safe_eval(expr)
        if val is not None:
            if m:
                outputs.append(str(int(val)) if float(val).is_integer() else str(val))
    return "\n".join(outputs) if outputs else "[no output]"
