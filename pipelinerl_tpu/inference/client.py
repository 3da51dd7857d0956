"""LLM client data model and the in-process client.

Mirrors the reference's client contract
(/root/reference/pipelinerl/llm.py:175-961, async_llm.py:86-357) so domains
port unchanged: ``Prompt(messages)`` in, ``LLMCall`` out with exact token
ids + per-token sampler logprobs, and ``make_training_text`` building the
token-exact RL sample (input_ids = chat-template(prompt) + sampled ids).

Being token-native and in-process, the reference's fragile pieces disappear:
no ``token_id:`` string parsing (llm.py:387-404), no detokenize/retokenize
round trip, no abort-retry on engine pause (the engine never pauses).
An HTTP transport with the same interface lives in ``http_client.py``.
"""

from __future__ import annotations

import asyncio
import time
import uuid
from typing import Any, Protocol, Sequence

from pydantic import BaseModel, ConfigDict, Field

from ..types import MASKED_TOKEN_ID, TrainingText
from .engine import GenRequest, GenResult, InferenceEngine, SamplingParams


class Prompt(BaseModel):
    messages: list[dict] = Field(default_factory=list)
    tools: list[dict] | None = None
    id: str = Field(default_factory=lambda: str(uuid.uuid4()))

    model_config = ConfigDict(arbitrary_types_allowed=True)

    def has_images(self) -> bool:
        """True if any message content is a parts list with an image part
        (the OpenAI-style convention the reference's chartqa domain uses)."""
        for m in self.messages:
            content = m.get("content")
            if isinstance(content, list) and any(
                p.get("type") in ("image", "image_url") for p in content
            ):
                return True
        return False


class LLMMessage(BaseModel):
    role: str = "assistant"
    content: str | None = None
    tool_calls: list[dict] | None = None


class LLMCall(BaseModel):
    """One completed generation with everything RL needs."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    prompt: Prompt
    output: LLMMessage
    prompt_token_ids: list[int]
    output_token_ids: list[int]
    logprobs: list[float]
    finish_reason: str
    model_version_start: int = 0
    model_version_end: int = 0
    latency: float = 0.0
    # VLM: {"pixel_values", "image_grid_thw"} as extracted by the processor
    # (reference re-extracts these trainer-side, async_llm.py:242-289; here
    # they are computed once and flow with the call)
    visual: dict | None = None

    @property
    def prompt_length_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def output_length_tokens(self) -> int:
        return len(self.output_token_ids)


class TokenizerLike(Protocol):
    """What the client needs from a tokenizer (HF tokenizers satisfy it)."""

    eos_token_id: int

    def apply_chat_template(
        self, conversation, add_generation_prompt: bool = False, **kwargs
    ) -> list[int]: ...

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = False) -> str: ...


class BaseLLM:
    """Interface shared by the in-process and HTTP clients."""

    tokenizer: TokenizerLike
    parameters: dict

    async def agenerate(self, prompt: Prompt, **overrides) -> LLMCall:
        raise NotImplementedError

    async def ascore(self, token_ids: Sequence[int]) -> list[float]:
        raise NotImplementedError


class InProcessLLM(BaseLLM):
    """Client bound directly to a local InferenceEngine (no HTTP hop).

    ``parameters`` mirrors the reference llm.parameters config block
    (conf/base.yaml:46-57): max_tokens, temperature, top_p, top_k.
    """

    def __init__(
        self,
        engine: InferenceEngine,
        tokenizer: TokenizerLike,
        parameters: dict | None = None,
        chat_template_kwargs: dict | None = None,
        processor=None,  # inference.processor.VisualProcessorLike (VLM only)
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.parameters = dict(parameters or {})
        self.chat_template_kwargs = dict(chat_template_kwargs or {})
        self.processor = processor

    def make_sampling_params(self, **overrides) -> SamplingParams:
        p = {**self.parameters, **overrides}
        return SamplingParams(
            temperature=float(p.get("temperature", 1.0)),
            top_p=float(p.get("top_p", 1.0)),
            top_k=int(p.get("top_k", 0) or 0),
            max_tokens=int(p.get("max_tokens", 256)),
            stop_token_ids=tuple(p.get("stop_token_ids", ())),
        )

    def prompt_token_ids(self, prompt: Prompt) -> list[int]:
        kwargs = dict(self.chat_template_kwargs)
        if prompt.tools:
            kwargs["tools"] = prompt.tools
        return list(
            self.tokenizer.apply_chat_template(
                prompt.messages, add_generation_prompt=True, **kwargs
            )
        )

    async def agenerate(self, prompt: Prompt, session: Any = None, **overrides) -> LLMCall:
        start = time.monotonic()
        visual = None
        if prompt.has_images():
            if self.processor is None:
                raise ValueError(
                    "prompt contains images but the client has no processor"
                )
            prompt_ids, visual = self.processor(
                prompt.messages, tools=prompt.tools
            )
        else:
            prompt_ids = self.prompt_token_ids(prompt)
        request = GenRequest(
            prompt_ids=prompt_ids,
            params=self.make_sampling_params(**overrides),
            request_id=prompt.id,
            visual=visual,
        )
        try:
            result: GenResult = await asyncio.wrap_future(self.engine.submit(request))
        except asyncio.CancelledError:
            # a cancelled rollout task frees its decode slot immediately
            # instead of leaving a zombie decoding to budget (the reference
            # gets this from vLLM's request abort, async_llm.py:61-168)
            self.engine.abort(request.request_id)
            raise
        content = self.tokenizer.decode(result.token_ids, skip_special_tokens=True)
        return LLMCall(
            prompt=prompt,
            output=LLMMessage(role="assistant", content=content),
            prompt_token_ids=prompt_ids,
            output_token_ids=list(result.token_ids),
            logprobs=list(result.logprobs),
            finish_reason=result.finish_reason,
            model_version_start=result.model_version_start,
            model_version_end=result.model_version_end,
            latency=time.monotonic() - start,
            visual=visual,
        )

    async def ascore(self, token_ids: Sequence[int]) -> list[float]:
        loop = asyncio.get_event_loop()
        return await loop.run_in_executor(None, self.engine.score_tokens, list(token_ids))


def make_training_text(llm: BaseLLM, llm_call: LLMCall) -> TrainingText:
    """Token-exact RL sample from one generation
    (contract of reference async_llm.py:215-346)."""
    prompt_ids = llm_call.prompt_token_ids
    completion_ids = llm_call.output_token_ids
    input_ids = prompt_ids + completion_ids
    labels = [MASKED_TOKEN_ID] * len(prompt_ids) + completion_ids
    finished = llm_call.finish_reason != "length"
    text = llm.tokenizer.decode(input_ids, skip_special_tokens=False)
    output_text = llm.tokenizer.decode(completion_ids, skip_special_tokens=False)
    visual_features = None
    if llm_call.visual is not None:
        visual_features = {
            "pixel_values": _tolist(llm_call.visual["pixel_values"]),
            "image_grid_thw": _tolist(llm_call.visual["image_grid_thw"]),
        }
    return TrainingText(
        text=text,
        n_predicted=len(output_text),
        input_ids=input_ids,
        labels=labels,
        logprobs=list(llm_call.logprobs),
        finished=finished,
        finish_reason=llm_call.finish_reason,
        prompt_tokens=len(prompt_ids),
        output_tokens=len(completion_ids),
        visual_features=visual_features,
        # version the ENGINE used to generate this sample (the lag metric's
        # numerator; a sample spanning an in-flight update keeps the start)
        metadata={"model_version": llm_call.model_version_start},
    )


def _tolist(x):
    return x.tolist() if hasattr(x, "tolist") else x


async def llm_async_generate(llm: BaseLLM, prompt: Prompt, session: Any = None, **overrides) -> LLMCall:
    """Reference-compatible helper name (async_llm.py:86-212)."""
    return await llm.agenerate(prompt, session=session, **overrides)
