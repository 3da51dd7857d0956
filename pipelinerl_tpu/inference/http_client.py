"""HTTP LLM client — same interface as InProcessLLM, over aiohttp.

Used when actors run on different hosts than the engines (the reference's
only mode, llm.py:349-961). Parses both our native ``token_ids`` field and
the vLLM ``token_id:<id>`` logprob convention (llm.py:387-404)."""

from __future__ import annotations

import time
from typing import Any, Sequence

import aiohttp

from .client import BaseLLM, LLMCall, LLMMessage, Prompt


def parse_token_id(token: str) -> int:
    if token.startswith("token_id:"):
        return int(token[len("token_id:") :])
    raise ValueError(f"Token not in token_id:<id> format: {token!r}")


class HTTPLLM(BaseLLM):
    def __init__(
        self,
        base_url: str,
        tokenizer,
        parameters: dict | None = None,
        model_name: str = "local",
        request_timeout: float = 3600.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.tokenizer = tokenizer
        self.parameters = dict(parameters or {})
        self.model_name = model_name
        self.timeout = aiohttp.ClientTimeout(total=request_timeout)

    async def agenerate(
        self, prompt: Prompt, session: aiohttp.ClientSession | None = None, **overrides
    ) -> LLMCall:
        start = time.monotonic()
        body = {
            "model": self.model_name,
            "messages": prompt.messages,
            "logprobs": 1,
            **self.parameters,
            **overrides,
        }
        if prompt.tools:
            body["tools"] = prompt.tools
        owns_session = session is None
        if owns_session:
            session = aiohttp.ClientSession(timeout=self.timeout)
        try:
            async with session.post(
                f"{self.base_url}/v1/chat/completions", json=body
            ) as resp:
                resp.raise_for_status()
                data = await resp.json()
        finally:
            if owns_session:
                await session.close()
        choice = data["choices"][0]
        if "token_ids" in choice:
            token_ids = [int(t) for t in choice["token_ids"]]
            logprobs = [float(e["logprob"]) for e in choice["logprobs"]["content"]]
        else:  # vLLM-style response
            entries = choice["logprobs"]["content"]
            token_ids = [parse_token_id(e["token"]) for e in entries]
            logprobs = [float(e["logprob"]) for e in entries]
        kwargs = {}
        if prompt.tools:
            kwargs["tools"] = prompt.tools
        prompt_ids = list(
            self.tokenizer.apply_chat_template(
                prompt.messages, add_generation_prompt=True, **kwargs
            )
        )
        return LLMCall(
            prompt=prompt,
            output=LLMMessage(
                role="assistant", content=choice["message"].get("content")
            ),
            prompt_token_ids=prompt_ids,
            output_token_ids=token_ids,
            logprobs=logprobs,
            finish_reason=choice.get("finish_reason", "stop"),
            model_version_start=data.get("model_version", 0),
            model_version_end=data.get("model_version", 0),
            latency=time.monotonic() - start,
        )

    async def astream(
        self, prompt: Prompt, session: aiohttp.ClientSession | None = None, **overrides
    ):
        """Streaming generation (``stream: true`` SSE) — an async generator
        yielding ``(token_ids, logprobs, text_delta, finish_reason)`` chunks;
        the terminal chunk has ``finish_reason`` set. The reference's client
        consumes vLLM's SSE stream the same way (llm.py LLMStream events)."""
        body = {
            "model": self.model_name,
            "messages": prompt.messages,
            "logprobs": 1,
            "stream": True,
            **self.parameters,
            **overrides,
        }
        if prompt.tools:
            body["tools"] = prompt.tools
        owns_session = session is None
        if owns_session:
            session = aiohttp.ClientSession(timeout=self.timeout)
        try:
            async with session.post(
                f"{self.base_url}/v1/chat/completions", json=body
            ) as resp:
                resp.raise_for_status()
                async for raw in resp.content:
                    line = raw.decode().strip()
                    if not line.startswith("data: "):
                        continue
                    payload = line[len("data: ") :]
                    if payload == "[DONE]":
                        break
                    import json

                    data = json.loads(payload)
                    choice = data["choices"][0]
                    token_ids = [int(t) for t in choice.get("token_ids", [])]
                    entries = (choice.get("logprobs") or {}).get("content", [])
                    logprobs = [float(e["logprob"]) for e in entries]
                    text = choice.get("delta", {}).get("content") or ""
                    yield token_ids, logprobs, text, choice.get("finish_reason")
        finally:
            if owns_session:
                await session.close()

    async def ascore(self, token_ids: Sequence[int]) -> list[float]:
        body = {
            "model": self.model_name,
            "prompt": list(token_ids),
            "echo": True,
            "logprobs": 1,
            "max_tokens": 0,
        }
        async with aiohttp.ClientSession(timeout=self.timeout) as session:
            async with session.post(
                f"{self.base_url}/v1/completions", json=body
            ) as resp:
                resp.raise_for_status()
                data = await resp.json()
        lps = data["choices"][0]["logprobs"]["token_logprobs"]
        return [float(x) for x in lps[1:]]
