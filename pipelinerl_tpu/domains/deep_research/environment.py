"""Research environment: a document corpus with search/read operations.

Tools mirror what the reference's TapeAgents Environment provides to the
agent (tapeagents_rollouts.py:19-27); here the corpus is deterministic from
a seed so actor-side problems and env-server documents always agree.
Optionally served over HTTP (GET /search?q=, /read?id=, /health) to exercise
the env-server job kind the same way math/logic verifiers do.
"""

from __future__ import annotations

import asyncio
import logging
import random
import re
from dataclasses import dataclass, field

from aiohttp import web

logger = logging.getLogger(__name__)

DOMAIN = "deep_research"

# synthetic world: entities with facts spread across documents so questions
# need 1-2 retrieval hops
_PLACES = ["Zorland", "Mirava", "Quenth", "Ostrev", "Balmora", "Tirsk",
           "Veyra", "Lunden", "Corvale", "Ashby"]
_PEOPLE = ["Ilya Korven", "Mara Senn", "Tobias Hale", "Runa Veld", "Ada Prost",
           "Nikolai Ferr", "Selma Odetta", "Viktor Lune"]
_FIELDS = ["cartography", "hydrology", "astronomy", "metallurgy", "botany",
           "linguistics", "seismology", "horology"]
_YEARS = list(range(1711, 1930))


@dataclass
class ResearchCorpus:
    documents: dict[str, dict] = field(default_factory=dict)  # id → {title, text}

    def search(self, query: str, k: int = 5) -> list[dict]:
        """Keyword search: score = count of query terms in title+text."""
        terms = [t for t in re.findall(r"\w+", query.lower()) if len(t) > 2]
        scored = []
        for doc_id, doc in self.documents.items():
            hay = (doc["title"] + " " + doc["text"]).lower()
            score = sum(hay.count(t) for t in terms)
            if score > 0:
                scored.append((score, doc_id))
        scored.sort(key=lambda x: (-x[0], x[1]))
        return [
            {
                "id": doc_id,
                "title": self.documents[doc_id]["title"],
                "snippet": self.documents[doc_id]["text"][:120],
            }
            for _, doc_id in scored[:k]
        ]

    def read(self, doc_id: str) -> str | None:
        doc = self.documents.get(doc_id)
        return doc["text"] if doc else None


def build_corpus(seed: int = 0, n_entities: int = 24) -> tuple[ResearchCorpus, list[dict]]:
    """Deterministic corpus + the question set grounded in it.

    Each entity gets a 'profile' doc plus facts scattered into other docs;
    two-hop questions chain person → field → place."""
    rng = random.Random(seed)
    corpus = ResearchCorpus()
    questions: list[dict] = []

    entities = []
    for i in range(n_entities):
        person = rng.choice(_PEOPLE) + f" {['I','II','III','IV'][rng.randrange(4)]}"
        place = rng.choice(_PLACES)
        fld = rng.choice(_FIELDS)
        year = rng.choice(_YEARS)
        entities.append({"person": person, "place": place, "field": fld, "year": year})

    for i, e in enumerate(entities):
        corpus.documents[f"doc_{i}a"] = {
            "title": f"Biography of {e['person']}",
            "text": (
                f"{e['person']} was a noted scholar of {e['field']}. "
                f"Born in {e['year']}, their early work reshaped the discipline."
            ),
        }
        corpus.documents[f"doc_{i}b"] = {
            "title": f"The {e['field']} institute",
            "text": (
                f"The principal institute of {e['field']} was founded in "
                f"{e['place']} and attracted scholars from across the region."
            ),
        }
        # distractor
        corpus.documents[f"doc_{i}c"] = {
            "title": f"Trade routes of {rng.choice(_PLACES)}",
            "text": f"A survey of caravan traffic compiled in {rng.choice(_YEARS)}.",
        }
        # one-hop question
        questions.append(
            {
                "task": f"In what year was {e['person']} born?",
                "answer": str(e["year"]),
                "hops": 1,
            }
        )
        # two-hop question: person → field → institute city
        questions.append(
            {
                "task": (
                    f"In which city was the principal institute of the field "
                    f"{e['person']} studied founded?"
                ),
                "answer": e["place"],
                "hops": 2,
            }
        )
    return corpus, questions


def load_problems(dataset_names: list[str], **loader_kwargs) -> list[dict]:
    n = int(loader_kwargs.get("max_examples") or 128)
    problems = []
    for name in dataset_names:
        seed = 0 if "train" in name else 1
        _, questions = build_corpus(seed=seed)
        for i, q in enumerate(questions[:n]):
            problems.append(
                {**q, "dataset": name, "domain": DOMAIN, "corpus_seed": seed,
                 "id": f"{name}_{i}"}
            )
    return problems


class ResearchEnvironment:
    """HTTP wrapper so research tools can run as an environment-server job."""

    def __init__(self, seed: int = 0) -> None:
        self.corpora: dict[int, ResearchCorpus] = {}
        self.app = web.Application()
        self.app.router.add_get("/search", self.search)
        self.app.router.add_get("/read", self.read)
        self.app.router.add_get("/health", self.health)

    def _corpus(self, seed: int) -> ResearchCorpus:
        if seed not in self.corpora:
            self.corpora[seed], _ = build_corpus(seed=seed)
        return self.corpora[seed]

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def search(self, request: web.Request) -> web.Response:
        seed = int(request.query.get("seed", 0))
        results = self._corpus(seed).search(request.query.get("q", ""))
        return web.json_response({"results": results})

    async def read(self, request: web.Request) -> web.Response:
        seed = int(request.query.get("seed", 0))
        text = self._corpus(seed).read(request.query.get("id", ""))
        if text is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response({"text": text})

    async def run(self, host: str = "0.0.0.0", port: int = 7779) -> web.AppRunner:
        runner = web.AppRunner(self.app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        logger.info("research environment serving on %s:%d", host, port)
        return runner

    @staticmethod
    def launch(port: int = 7779) -> None:
        env = ResearchEnvironment()

        async def serve_forever() -> None:
            await env.run(port=port)
            await asyncio.Event().wait()

        asyncio.run(serve_forever())
