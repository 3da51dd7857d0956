"""OpenAI-compatible HTTP server over the inference engine (aiohttp).

Serve-path parity with the reference's vLLM OpenAI server
(/root/reference/pipelinerl/vllm1.py:189-265, llm.py:387-404):

- ``POST /v1/chat/completions``: chat-template applied host-side, returns
  content plus per-token logprobs; tokens are reported BOTH in the vLLM
  ``token_id:<id>`` text convention (so reference-style clients parse them)
  and as a plain ``token_ids`` list (native clients skip the string parse);
- ``POST /v1/completions`` with ``echo+logprobs``: teacher-forced scoring of
  given token ids — the ref-logprob annotation endpoint
  (reference preprocess.py:86-104);
- ``POST /receive_weight_update``: load new weights from an HF-format
  checkpoint directory (written by the trainer's export) and swap in-flight;
- ``GET /health``.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
import uuid
from typing import Any

from aiohttp import web

from .engine import GenRequest, InferenceEngine, SamplingParams

logger = logging.getLogger(__name__)


def _tool_close_boundary(tokenizer, ids: list[int], n_calls: int) -> int:
    """Smallest token-prefix length of ``ids`` whose decoded text contains
    ``n_calls`` closing ``</tool_call>`` tags — the exact point the token
    stream must stop when tool calls terminate generation early. Returns
    ``len(ids)`` if the tags are not reachable in the decode (defensive:
    never drop tokens we cannot attribute past a tag)."""
    close = "</tool_call>"

    def count(k: int) -> int:
        return tokenizer.decode(ids[:k], skip_special_tokens=True).count(close)

    if not ids or count(len(ids)) < n_calls:
        return len(ids)
    lo, hi = 1, len(ids)
    while lo < hi:
        mid = (lo + hi) // 2
        if count(mid) >= n_calls:
            hi = mid
        else:
            lo = mid + 1
    return lo


class InferenceServer:
    def __init__(
        self,
        engine: InferenceEngine,
        tokenizer,
        model_name: str = "local",
        frozen: bool = False,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.model_name = model_name
        # frozen: a reference-policy server (ref_engine job) — weight pushes
        # are rejected so KL scoring always runs against the initial policy
        # (the reference's dedicated ref vLLM, launch.py:149)
        self.frozen = frozen
        self.app = web.Application(client_max_size=64 * 1024 * 1024)
        self.app.router.add_post("/v1/chat/completions", self.chat_completions)
        self.app.router.add_post("/v1/completions", self.completions)
        self.app.router.add_post("/receive_weight_update", self.receive_weight_update)
        self.app.router.add_get("/weight_version", self.weight_version)
        self.app.router.add_get("/health", self.health)
        self.app.router.add_get("/v1/models", self.models)

    # ------------------------------------------------------------------
    async def health(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "status": "ok",
                "version": self.engine.version,
                "counters": self.engine.perf_counters(),
            }
        )

    async def weight_version(self, request: web.Request) -> web.Response:
        """Cheap swap-confirmation poll: a pusher that does not want to hold
        its POST open for the whole paced transfer can fire-and-poll here
        (push_weights_http's timeout is sized to outlast the server wait,
        but external operators get this endpoint)."""
        pt = self.engine.push_counters() if hasattr(self.engine, "push_counters") else {}
        return web.json_response({"version": self.engine.version, **pt})

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response(
            {"object": "list", "data": [{"id": self.model_name, "object": "model"}]}
        )

    def _sampling_params(self, body: dict) -> SamplingParams:
        return SamplingParams(
            temperature=float(body.get("temperature", 1.0)),
            top_p=float(body.get("top_p", 1.0)),
            top_k=int(body.get("top_k", 0) or 0),
            max_tokens=int(body.get("max_tokens", 256)),
            stop_token_ids=tuple(body.get("stop_token_ids", ())),
        )

    async def chat_completions(self, request: web.Request) -> web.Response:
        body = await request.json()
        messages = body["messages"]
        kwargs: dict[str, Any] = {}
        if body.get("tools"):
            kwargs["tools"] = body["tools"]
        prompt_ids = list(
            self.tokenizer.apply_chat_template(
                messages, add_generation_prompt=True, **kwargs
            )
        )
        if body.get("stream"):
            return await self._chat_completions_stream(request, body, prompt_ids)
        gen = GenRequest(
            prompt_ids=prompt_ids,
            params=self._sampling_params(body),
            request_id=str(uuid.uuid4()),
        )
        result = await asyncio.wrap_future(self.engine.submit(gen))
        if result.finish_reason == "abort":
            return web.json_response(
                {"error": {"message": "prompt too long", "type": "invalid_request_error"}},
                status=400,
            )
        content = self.tokenizer.decode(result.token_ids, skip_special_tokens=True)
        logprobs_content = [
            {
                # vLLM --return-tokens-as-token-ids convention
                "token": f"token_id:{tid}",
                "token_id": int(tid),
                "logprob": float(lp),
            }
            for tid, lp in zip(result.token_ids, result.logprobs)
        ]
        return web.json_response(
            {
                "id": f"chatcmpl-{gen.request_id}",
                "object": "chat.completion",
                "created": int(time.time()),
                "model": self.model_name,
                "model_version": result.model_version_start,
                "choices": [
                    {
                        "index": 0,
                        "message": {"role": "assistant", "content": content},
                        "finish_reason": result.finish_reason,
                        "logprobs": {"content": logprobs_content},
                        "token_ids": [int(t) for t in result.token_ids],
                    }
                ],
                "usage": {
                    "prompt_tokens": result.prompt_tokens,
                    "completion_tokens": len(result.token_ids),
                    "total_tokens": result.prompt_tokens + len(result.token_ids),
                },
            }
        )

    async def _chat_completions_stream(
        self, request: web.Request, body: dict, prompt_ids: list[int]
    ) -> web.StreamResponse:
        """SSE streaming (``stream: true``) — OpenAI ``chat.completion.chunk``
        events, one per decode window, each carrying the window's delta text
        plus native ``token_ids`` and per-token logprobs. The reference gets
        this from vLLM's OpenAI server (SURVEY.md §2.4); here the engine's
        stream_callback bridges decode windows onto the asyncio loop."""
        loop = asyncio.get_event_loop()
        queue: asyncio.Queue = asyncio.Queue()

        def on_tokens(tokens: list[int], logprobs: list[float], finish):
            # engine thread → asyncio loop
            loop.call_soon_threadsafe(queue.put_nowait, (tokens, logprobs, finish))

        request_id = str(uuid.uuid4())
        gen = GenRequest(
            prompt_ids=prompt_ids,
            params=self._sampling_params(body),
            request_id=request_id,
            stream_callback=on_tokens,
        )
        future = self.engine.submit(gen)

        resp = web.StreamResponse(
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
            }
        )
        await resp.prepare(request)
        created = int(time.time())
        all_ids: list[int] = []
        sent_text = ""

        def chunk_payload(delta: dict, finish: str | None, extra: dict | None = None) -> bytes:
            obj = {
                "id": f"chatcmpl-{request_id}",
                "object": "chat.completion.chunk",
                "created": created,
                "model": self.model_name,
                "choices": [
                    {"index": 0, "delta": delta, "finish_reason": finish, **(extra or {})}
                ],
            }
            return f"data: {json.dumps(obj)}\n\n".encode()

        # streaming tool-call extraction (the reference plugin's streaming
        # mode, rl_tool_parser_plugin.py:43-201): when the request carries
        # tools, tool blocks are held out of the content stream, completed
        # calls arrive as OpenAI delta.tool_calls entries, and generation
        # TERMINATES at the first closed </tool_call> instead of decoding
        # past it (finish_reason "tool_calls")
        tool_parser = None
        if body.get("tools") and body.get("tool_choice") != "none":
            from ..domains.tir.tool_parser import StreamingToolParser

            tool_parser = StreamingToolParser()
        try:
            await resp.write(chunk_payload({"role": "assistant", "content": ""}, None))
            while True:
                tokens, logprobs, finish = await queue.get()
                stop_for_tools = False
                if tokens:
                    all_ids.extend(tokens)
                    # decode the FULL transcript and diff: per-chunk decode
                    # would split multi-token glyphs at window boundaries
                    text = self.tokenizer.decode(all_ids, skip_special_tokens=True)
                    delta_text, sent_text = text[len(sent_text):], text
                    delta: dict = {"content": delta_text}
                    if tool_parser is not None:
                        content, new_calls = tool_parser.feed(delta_text)
                        delta = {"content": content} if content else {}
                        if new_calls:
                            # the parser releases text AFTER the closing tag
                            # as plain content; generation stops at the tag,
                            # so that tail must not reach clients as TEXT any
                            # more than as tokens
                            tail_txt = delta_text.rsplit("</tool_call>", 1)[-1]
                            if tail_txt and content.endswith(tail_txt):
                                content = content[: -len(tail_txt)]
                                delta = {"content": content} if content else {}
                            delta["tool_calls"] = [
                                {"index": i, **c.to_dict()}
                                for i, c in enumerate(
                                    new_calls, len(tool_parser.calls) - len(new_calls)
                                )
                            ]
                            stop_for_tools = True
                            # terminate the TOKEN stream exactly at the
                            # closing tag: dispatched-but-unsynced window
                            # tokens past </tool_call> must not reach
                            # clients or training samples (the reference
                            # parser stops generation at the tag itself)
                            boundary = _tool_close_boundary(
                                self.tokenizer, all_ids, len(tool_parser.calls)
                            )
                            drop = len(all_ids) - boundary
                            if drop > 0:
                                tokens = tokens[: max(0, len(tokens) - drop)]
                                logprobs = logprobs[: len(tokens)]
                                del all_ids[boundary:]
                    await resp.write(
                        chunk_payload(
                            delta,
                            None,
                            {
                                "token_ids": [int(t) for t in tokens],
                                "logprobs": {
                                    "content": [
                                        {
                                            "token": f"token_id:{t}",
                                            "token_id": int(t),
                                            "logprob": float(lp),
                                        }
                                        for t, lp in zip(tokens, logprobs)
                                    ]
                                },
                            },
                        )
                    )
                if stop_for_tools and finish is None:
                    # first closed tool call: free the slot now. Usage
                    # counts the TRUNCATED stream (post-call tail excluded),
                    # not whatever landed in the aborted engine result.
                    self.engine.abort(request_id)
                    result = await asyncio.wrap_future(future)
                    await resp.write(
                        chunk_payload(
                            {},
                            "tool_calls",
                            {
                                "usage": {
                                    "prompt_tokens": result.prompt_tokens,
                                    "completion_tokens": len(all_ids),
                                    "total_tokens": result.prompt_tokens
                                    + len(all_ids),
                                },
                                "model_version": result.model_version_start,
                            },
                        )
                    )
                    break
                if finish is not None:
                    result = await asyncio.wrap_future(future)
                    if tool_parser is not None:
                        # stream ended via max_tokens/stop with text still
                        # buffered (a partial '<tool' prefix or an unclosed
                        # block): release it so clients see the full
                        # completion rather than a silent truncation
                        tail = tool_parser.flush()
                        if tail:
                            await resp.write(chunk_payload({"content": tail}, None))
                        if tool_parser.calls:
                            finish = "tool_calls"
                    # usage counts the STREAMED ids (== engine result for
                    # normal finishes; the truncated count when a tool call
                    # closed in the same callback that carried finish)
                    await resp.write(
                        chunk_payload(
                            {},
                            finish,
                            {
                                "usage": {
                                    "prompt_tokens": result.prompt_tokens,
                                    "completion_tokens": len(all_ids),
                                    "total_tokens": result.prompt_tokens
                                    + len(all_ids),
                                },
                                "model_version": result.model_version_start,
                            },
                        )
                    )
                    break
            await resp.write(b"data: [DONE]\n\n")
        finally:
            if not future.done():
                # client went away mid-generation: free the slot
                self.engine.abort(request_id)
        await resp.write_eof()
        return resp

    async def completions(self, request: web.Request) -> web.Response:
        """Echo+logprobs scoring (the reference's ref-logprob path) and plain
        prompt completions."""
        body = await request.json()
        prompt = body.get("prompt")
        echo = bool(body.get("echo", False))
        want_logprobs = body.get("logprobs") is not None
        if isinstance(prompt, str):
            token_ids = self.tokenizer.encode(prompt)
        else:
            token_ids = list(prompt)  # token-id list input
        if echo and want_logprobs and int(body.get("max_tokens", 0)) == 0:
            loop = asyncio.get_event_loop()
            scores = await loop.run_in_executor(
                None, self.engine.score_tokens, token_ids
            )
            return web.json_response(
                {
                    "id": f"cmpl-{uuid.uuid4()}",
                    "object": "text_completion",
                    "model": self.model_name,
                    "choices": [
                        {
                            "index": 0,
                            "text": "",
                            "logprobs": {
                                "token_logprobs": [None] + [float(x) for x in scores],
                                "tokens": [f"token_id:{t}" for t in token_ids],
                            },
                            "finish_reason": "stop",
                        }
                    ],
                }
            )
        gen = GenRequest(prompt_ids=token_ids, params=self._sampling_params(body))
        result = await asyncio.wrap_future(self.engine.submit(gen))
        text = self.tokenizer.decode(result.token_ids, skip_special_tokens=True)
        return web.json_response(
            {
                "id": f"cmpl-{uuid.uuid4()}",
                "object": "text_completion",
                "model": self.model_name,
                "choices": [
                    {
                        "index": 0,
                        "text": text,
                        "token_ids": [int(t) for t in result.token_ids],
                        "logprobs": {
                            "token_logprobs": [float(x) for x in result.logprobs]
                        },
                        "finish_reason": result.finish_reason,
                    }
                ],
            }
        )

    async def receive_weight_update(self, request: web.Request) -> web.Response:
        """Swap new weights in-flight (the reference's NCCL-broadcast
        endpoint, vllm1.py:244-249). Two modes:

        - ``application/x-msgpack`` body: serialized param arrays straight
          from the trainer's device memory (weight_transfer.py) — the fast
          path: no checkpoint files touch disk;
        - JSON body with ``checkpoint_dir``: HF-checkpoint handoff (fallback
          for operator-driven reloads).

        The engine never pauses: the swap happens between decode windows."""
        if self.frozen:
            return web.json_response(
                {"error": "frozen reference-policy server rejects weight updates"},
                status=403,
            )
        loop = asyncio.get_event_loop()
        if request.content_type == "application/x-msgpack":
            body = await request.read()
            # hand the raw wire body to the engine's transfer thread: it
            # ships each dtype run in paced transfers, carves leaves
            # on-device, and the engine thread pointer-swaps between windows.
            # Run in an executor: on mesh (tp/pp) engines this falls through
            # to deserialize+shard_params — a multi-GB device transfer that
            # must not stall every in-flight SSE stream on the event loop.
            try:
                version = await loop.run_in_executor(
                    None, self.engine.update_params_serialized, body
                )
            except ValueError as exc:  # tree/spec mismatch: reject loudly
                return web.json_response({"error": str(exc)}, status=400)
            # reply only once the swap is live so HTTP 200 == "engine now
            # serves version" (the reference's pause-scoped broadcast gives
            # the same guarantee, vllm1.py:155-182); decode is NOT paused
            # while we wait here
            deadline = loop.time() + 600
            while self.engine.version < version and loop.time() < deadline:
                await asyncio.sleep(0.02)
            if self.engine.version < version:
                return web.json_response(
                    {"error": "weight swap did not land within 600s"}, status=504
                )
            return web.json_response({"status": "ok", "version": version})
        body = await request.json()
        ckpt_dir = body["checkpoint_dir"]
        version = int(body.get("version", self.engine.version + 1))

        def load_and_swap():
            from ..models.hf_loader import load_hf_model

            params, _ = load_hf_model(ckpt_dir, dtype=self.engine.model_cfg.dtype)
            self.engine.update_params(params, version)

        await loop.run_in_executor(None, load_and_swap)
        return web.json_response({"status": "ok", "version": version})

    # ------------------------------------------------------------------
    async def run(self, host: str = "0.0.0.0", port: int = 8080) -> web.AppRunner:
        runner = web.AppRunner(self.app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        logger.info("Inference server listening on %s:%d", host, port)
        return runner
