"""Deep-research domain: corpus search/read, agent loop, env HTTP service."""

import asyncio

from pipelinerl_tpu.config import Config
from pipelinerl_tpu.domains.deep_research.environment import (
    ResearchEnvironment,
    build_corpus,
    load_problems,
)
from pipelinerl_tpu.domains.deep_research.rollouts import generate_research_rollout
from pipelinerl_tpu.inference.client import BaseLLM, LLMCall, LLMMessage, Prompt
from pipelinerl_tpu.models.toy_tokenizer import ToyTokenizer


class ScriptedLLM(BaseLLM):
    def __init__(self, responses):
        self.responses = list(responses)
        self.tokenizer = ToyTokenizer()
        self.parameters = {"max_tokens": 64}
        self.seen_messages = []

    async def agenerate(self, prompt: Prompt, session=None, **kw) -> LLMCall:
        self.seen_messages.append(prompt.messages)
        content = self.responses.pop(0)
        ids = self.tokenizer.encode(content) + [self.tokenizer.eos_token_id]
        return LLMCall(
            prompt=prompt,
            output=LLMMessage(role="assistant", content=content),
            prompt_token_ids=self.tokenizer.apply_chat_template(
                prompt.messages, add_generation_prompt=True
            ),
            output_token_ids=ids,
            logprobs=[-0.1] * len(ids),
            finish_reason="stop",
        )


def test_corpus_is_deterministic_and_searchable():
    corpus_a, questions_a = build_corpus(seed=0)
    corpus_b, questions_b = build_corpus(seed=0)
    assert corpus_a.documents == corpus_b.documents
    assert questions_a == questions_b
    # a one-hop question is answerable by searching for the person
    q = questions_a[0]
    person = q["task"].removeprefix("In what year was ").removesuffix(" born?")
    hits = corpus_a.search(person)
    assert hits, person
    text = corpus_a.read(hits[0]["id"])
    assert q["answer"] in text


def test_load_problems():
    train = load_problems(["train"], max_examples=16)
    test = load_problems(["test"], max_examples=16)
    assert len(train) == 16 and len(test) == 16
    assert train[0]["corpus_seed"] == 0 and test[0]["corpus_seed"] == 1
    assert all(p["domain"] == "deep_research" for p in train)


def _cfg():
    return Config({"actor": {"max_loops": 6, "step_cost": 0.05}})


def test_scripted_two_hop_rollout_success():
    corpus, questions = build_corpus(seed=0)
    problem = {**questions[0], "dataset": "train", "domain": "deep_research",
               "corpus_seed": 0}
    person = problem["task"].removeprefix("In what year was ").removesuffix(" born?")
    hits = corpus.search(person)
    llm = ScriptedLLM([
        f"Let me look this up. <search>{person}</search>",
        f"Reading the biography. <read>{hits[0]['id']}</read>",
        f"Found it. <answer>{problem['answer']}</answer>",
    ])
    result = asyncio.run(generate_research_rollout(_cfg(), llm, problem))
    assert result.metrics.success == 1
    assert result.metrics.num_searches == 1 and result.metrics.num_reads == 1
    assert len(result.training_texts) == 3  # one per LLM call
    # search results were fed back as an observation turn
    assert any("<results>" in m.get("content", "")
               for m in llm.seen_messages[-1] if m["role"] == "user")
    # step cost applied: 1.0 - 2*0.05
    assert abs(result.metrics.reward - 0.9) < 1e-9
    assert all(t.reward == result.metrics.reward for t in result.training_texts)


def test_scripted_rollout_wrong_and_no_answer():
    _, questions = build_corpus(seed=0)
    problem = {**questions[0], "corpus_seed": 0}
    wrong = asyncio.run(generate_research_rollout(
        _cfg(), ScriptedLLM(["<answer>not it</answer>"]), problem))
    assert wrong.metrics.success == 0 and wrong.metrics.reward == -0.5

    rambler = ScriptedLLM(["hmm"] * 6)
    none = asyncio.run(generate_research_rollout(_cfg(), rambler, problem))
    assert none.metrics.no_answer == 1 and none.metrics.reward == -1.0
    assert none.metrics.num_steps == 6  # hit max_loops


def test_research_env_http_service():
    import aiohttp

    corpus, questions = build_corpus(seed=0)

    async def scenario():
        runner = await ResearchEnvironment().run(host="127.0.0.1", port=0)
        port = runner.addresses[0][1]
        try:
            async with aiohttp.ClientSession() as session:
                async with session.get(
                    f"http://127.0.0.1:{port}/search",
                    params={"q": "Biography", "seed": 0},
                ) as r:
                    results = (await r.json())["results"]
                doc_id = results[0]["id"]
                async with session.get(
                    f"http://127.0.0.1:{port}/read",
                    params={"id": doc_id, "seed": 0},
                ) as r:
                    text = (await r.json())["text"]
                async with session.get(
                    f"http://127.0.0.1:{port}/read",
                    params={"id": "nope", "seed": 0},
                ) as r:
                    missing = r.status
        finally:
            await runner.cleanup()
        return results, text, missing

    results, text, missing = asyncio.run(scenario())
    assert results and text == corpus.read(results[0]["id"])
    assert missing == 404


def test_registry_resolves_deep_research():
    from pipelinerl_tpu.domains.registry import resolve_domain_rollout

    assert resolve_domain_rollout("deep_research").__name__ == "generate_research_rollout"
