"""HTTP serve path: aiohttp server + HTTPLLM client against a live engine."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.inference import EngineConfig, InferenceEngine
from pipelinerl_tpu.inference.client import InProcessLLM, Prompt, make_training_text
from pipelinerl_tpu.inference.http_client import HTTPLLM
from pipelinerl_tpu.inference.server import InferenceServer
from pipelinerl_tpu.models.toy_tokenizer import ToyTokenizer
from pipelinerl_tpu.models.transformer import ModelConfig, init_params

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def served_engine():
    model_cfg = ModelConfig(
        vocab_size=260, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), model_cfg)
    tokenizer = ToyTokenizer()
    engine = InferenceEngine(
        params,
        model_cfg,
        EngineConfig(max_slots=4, max_len=128, prefill_buckets=(64,), cache_dtype=jnp.float32),
        eos_token_id=tokenizer.eos_token_id,
    )
    engine.start()
    yield engine, tokenizer, model_cfg
    engine.stop()


async def _serve_and_call(engine, tokenizer, fn):
    server = InferenceServer(engine, tokenizer)
    runner = await server.run(host="127.0.0.1", port=0)
    port = runner.addresses[0][1]
    try:
        return await fn(f"http://127.0.0.1:{port}")
    finally:
        await runner.cleanup()


def test_chat_completions_roundtrip(served_engine):
    engine, tokenizer, _ = served_engine

    async def scenario(base):
        llm = HTTPLLM(base, tokenizer, {"max_tokens": 8, "temperature": 1.0})
        call = await llm.agenerate(Prompt(messages=[{"role": "user", "content": "hi"}]))
        return call

    call = asyncio.run(_serve_and_call(engine, tokenizer, scenario))
    assert 1 <= len(call.output_token_ids) <= 8
    assert len(call.logprobs) == len(call.output_token_ids)
    assert call.finish_reason in ("stop", "length")
    # token-exact training text construction works over HTTP too
    tt = make_training_text(
        InProcessLLM(engine, tokenizer), call
    )
    assert tt.input_ids == call.prompt_token_ids + call.output_token_ids
    assert tt.labels[: len(call.prompt_token_ids)] == [-100] * len(call.prompt_token_ids)


def test_http_matches_inprocess_logprob_contract(served_engine):
    """HTTP-returned logprobs must equal the engine's teacher-forced scores."""
    engine, tokenizer, _ = served_engine

    async def scenario(base):
        llm = HTTPLLM(base, tokenizer, {"max_tokens": 6, "temperature": 1.0})
        call = await llm.agenerate(Prompt(messages=[{"role": "user", "content": "abc"}]))
        scored = await llm.ascore(call.prompt_token_ids + call.output_token_ids)
        return call, scored

    call, scored = asyncio.run(_serve_and_call(engine, tokenizer, scenario))
    recomputed = scored[len(call.prompt_token_ids) - 1 :]
    np.testing.assert_allclose(call.logprobs, recomputed, rtol=1e-4, atol=1e-5)


def test_health_and_weight_update(served_engine, tmp_path):
    engine, tokenizer, model_cfg = served_engine

    async def scenario(base):
        import aiohttp

        from pipelinerl_tpu.train.checkpoints import export_hf

        new_params = init_params(jax.random.key(7), model_cfg)
        ckpt = export_hf(tmp_path, new_params, model_cfg)
        async with aiohttp.ClientSession() as s:
            async with s.get(f"{base}/health") as r:
                health = await r.json()
            async with s.post(
                f"{base}/receive_weight_update",
                json={"checkpoint_dir": str(ckpt), "version": 42},
            ) as r:
                update = await r.json()
        return health, update

    health, update = asyncio.run(_serve_and_call(engine, tokenizer, scenario))
    assert health["status"] == "ok"
    assert update["version"] == 42
    # engine picks up the new version on its next loop iteration
    deadline = 50
    import time

    for _ in range(deadline):
        if engine.version == 42:
            break
        time.sleep(0.1)
    assert engine.version == 42


def test_streaming_chat_completions(served_engine):
    """SSE streaming: chunk token_ids/logprobs concatenate to exactly the
    non-streamed GenResult contract, text deltas concatenate to the full
    decode, and the terminal chunk carries finish_reason + usage."""
    engine, tokenizer, _ = served_engine

    async def scenario(base):
        llm = HTTPLLM(base, tokenizer, {"max_tokens": 8, "temperature": 1.0})
        chunks = []
        async for chunk in llm.astream(
            Prompt(messages=[{"role": "user", "content": "stream please"}])
        ):
            chunks.append(chunk)
        return chunks

    chunks = asyncio.run(_serve_and_call(engine, tokenizer, scenario))
    assert chunks, "no SSE chunks received"
    token_ids = [t for c in chunks for t in c[0]]
    logprobs = [lp for c in chunks for lp in c[1]]
    text = "".join(c[2] for c in chunks)
    finishes = [c[3] for c in chunks if c[3] is not None]
    assert finishes and finishes[-1] in ("stop", "length")
    assert 1 <= len(token_ids) <= 8
    assert len(logprobs) == len(token_ids)
    assert all(np.isfinite(lp) and lp <= 0 for lp in logprobs)
    assert text == tokenizer.decode(token_ids, skip_special_tokens=True)


def test_tool_close_boundary_truncates_exactly():
    """The SSE tool-call early-stop must cut the token stream at the token
    whose decode completes </tool_call> — dispatched-but-unsynced window
    tokens past the tag never reach clients or training samples."""
    from pipelinerl_tpu.inference.server import _tool_close_boundary
    from pipelinerl_tpu.models.toy_tokenizer import ToyTokenizer

    tok = ToyTokenizer()
    ids = tok.encode('x<tool_call>{"name":"f"}</tool_call> spurious tail')
    b = _tool_close_boundary(tok, ids, 1)
    assert tok.decode(ids[:b]).endswith("</tool_call>")
    assert "spurious" not in tok.decode(ids[:b])
    # a second call: boundary covers both tags
    ids2 = ids + tok.encode('<tool_call>{"name":"g"}</tool_call>xx')
    b2 = _tool_close_boundary(tok, ids2, 2)
    assert tok.decode(ids2[:b2]).count("</tool_call>") == 2
    assert not tok.decode(ids2[:b2]).endswith("xx")
    # tags not present in the decode: keep everything (defensive)
    plain = tok.encode("no tags here")
    assert _tool_close_boundary(tok, plain, 1) == len(plain)
