"""Streaming tool-call extraction (reference plugin's streaming mode,
rl_tool_parser_plugin.py:43-201): deltas release content outside tool
blocks, completed calls surface as they close, and the SSE server
terminates generation at the first closed </tool_call>."""

import json

from pipelinerl_tpu.domains.tir.tool_parser import StreamingToolParser, parse_tool_calls


def feed_all(parser, chunks):
    content, calls = [], []
    for c in chunks:
        out, new = parser.feed(c)
        content.append(out)
        calls.extend(new)
    return "".join(content), calls


def test_stream_matches_posthoc_parse():
    text = (
        'I will compute.\n<tool_call>{"name": "run_python_code", '
        '"arguments": {"code": "print(1)"}}</tool_call>\ntrailing'
    )
    for size in (1, 3, 7, len(text)):
        parser = StreamingToolParser()
        chunks = [text[i : i + size] for i in range(0, len(text), size)]
        content, calls = feed_all(parser, chunks)
        content += parser.flush()
        want_calls, want_content = parse_tool_calls(text)
        assert [c.function.name for c in calls] == [
            c.function.name for c in want_calls
        ], f"size={size}"
        assert json.loads(calls[0].function.arguments) == {"code": "print(1)"}
        # tool block never leaks into the content stream
        assert "<tool_call>" not in content and "run_python_code" not in content
        assert "I will compute." in content and "trailing" in content


def test_partial_tag_held_back_then_released():
    parser = StreamingToolParser()
    out1, calls1 = parser.feed("hello <tool")
    assert out1 == "hello " and not calls1  # "<tool" might open a block
    out2, calls2 = parser.feed("ing is fun")  # it didn't
    assert out2 == "<tooling is fun"
    assert not calls2


def test_unclosed_block_flushes_as_text():
    parser = StreamingToolParser()
    out, calls = parser.feed('before <tool_call>{"name": "x"')
    assert out == "before " and not calls
    assert parser.flush() == '<tool_call>{"name": "x"'


def test_two_calls_in_one_delta():
    parser = StreamingToolParser()
    delta = (
        '<tool_call>{"name": "a", "arguments": {}}</tool_call>'
        '<tool_call>{"name": "b", "arguments": {}}</tool_call>'
    )
    out, calls = parser.feed(delta)
    assert out == ""
    assert [c.function.name for c in calls] == ["a", "b"]


def test_sse_server_terminates_on_tool_call(tmp_path):
    """End-to-end over a live server: with tools in the request, the stream
    must emit a delta.tool_calls entry and finish with finish_reason
    'tool_calls' WITHOUT exhausting max_tokens."""
    import asyncio
    import threading
    import time
    import urllib.request

    import jax
    import jax.numpy as jnp

    from pipelinerl_tpu.inference import EngineConfig, InferenceEngine
    from pipelinerl_tpu.inference.server import InferenceServer
    from pipelinerl_tpu.models.toy_tokenizer import ToyTokenizer
    from pipelinerl_tpu.models.transformer import ModelConfig, init_params

    cfg = ModelConfig(
        vocab_size=260, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), cfg)
    engine = InferenceEngine(
        params, cfg,
        EngineConfig(max_slots=2, max_len=512, prefill_buckets=(32,),
                     cache_dtype=jnp.float32, decode_window=4),
        eos_token_id=0,
    )

    tok = ToyTokenizer()
    call_text = '<tool_call>{"name": "run_python_code", "arguments": {}}</tool_call>'
    # rig the engine: stream this text regardless of the model by wrapping
    # decode — simplest honest route is a tokenizer whose decode yields the
    # scripted text as ids accumulate
    scripted = call_text + " and then some extra text that should never stream"

    class ScriptedTok:
        eos_token_id = 0

        def apply_chat_template(self, messages, add_generation_prompt=True, **kw):
            return [3, 5, 7]

        def decode(self, ids, skip_special_tokens=True):
            return scripted[: len(ids)]

    engine.start()
    server = InferenceServer(engine, ScriptedTok())
    loop = asyncio.new_event_loop()
    box = {}

    def serve():
        asyncio.set_event_loop(loop)
        box["runner"] = loop.run_until_complete(server.run(host="127.0.0.1", port=0))
        loop.run_forever()

    threading.Thread(target=serve, daemon=True).start()
    for _ in range(100):
        if "runner" in box:
            break
        time.sleep(0.05)
    port = list(box["runner"].sites)[0]._server.sockets[0].getsockname()[1]

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps(
            {
                "messages": [{"role": "user", "content": "go"}],
                "max_tokens": 400,
                "stream": True,
                "tools": [{"type": "function", "function": {"name": "run_python_code"}}],
            }
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as resp:
        for line in resp:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                events.append(json.loads(line[len("data: "):]))
    finishes = [e["choices"][0].get("finish_reason") for e in events]
    assert "tool_calls" in finishes, finishes
    tool_deltas = [
        tc
        for e in events
        for tc in e["choices"][0]["delta"].get("tool_calls", [])
    ]
    assert tool_deltas and tool_deltas[0]["function"]["name"] == "run_python_code"
    # early termination: the scripted tail never streamed
    streamed = "".join(
        e["choices"][0]["delta"].get("content") or "" for e in events
    )
    assert "extra text" not in streamed
    # generation stopped well short of max_tokens
    usage = next(
        e["choices"][0]["usage"] for e in events if "usage" in e["choices"][0]
    )
    assert usage["completion_tokens"] < 200, usage
    engine.stop()
    loop.call_soon_threadsafe(loop.stop)
