"""Math verifier environment server (aiohttp) + RPC client.

Reference: /root/reference/pipelinerl/domains/math/verifier_api.py (FastAPI
+ math_verify process pool). Verification here is fast pure Python, so a
thread executor suffices; the HTTP surface matches: POST /verify_answer
{prediction, gold, strict} → {answer_status}, plus /health.
"""

from __future__ import annotations

import asyncio
import logging
from typing import Any

import aiohttp
from aiohttp import web

from .verifier import UNPARSABLE, grade_answer, verify_countdown

logger = logging.getLogger(__name__)


class MathEnvironment:
    """Environment server job (reference MathEnvironment.launch)."""

    def __init__(self) -> None:
        self.app = web.Application()
        self.app.router.add_post("/verify_answer", self.verify_answer)
        self.app.router.add_get("/health", self.health)

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def verify_answer(self, request: web.Request) -> web.Response:
        body = await request.json()
        loop = asyncio.get_event_loop()
        try:
            if "numbers" in body and "target" in body:  # countdown problem
                status = await loop.run_in_executor(
                    None,
                    verify_countdown,
                    body["prediction"],
                    list(body["numbers"]),
                    int(body["target"]),
                )
            else:
                status = await loop.run_in_executor(
                    None,
                    grade_answer,
                    body["prediction"],
                    str(body["gold"]),
                    bool(body.get("strict", True)),
                )
        except Exception:
            logger.exception("Verification crashed")
            status = UNPARSABLE
        return web.json_response({"answer_status": status})

    async def run(self, host: str = "0.0.0.0", port: int = 7777) -> web.AppRunner:
        runner = web.AppRunner(self.app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        logger.info("Math verifier listening on %s:%d", host, port)
        return runner

    @staticmethod
    def launch(port: int = 7777) -> None:
        """Blocking entrypoint for a verifier subprocess."""
        env = MathEnvironment()

        async def serve():
            await env.run(port=port)
            await asyncio.Event().wait()

        asyncio.run(serve())


async def verify_answer_rpc(
    session: aiohttp.ClientSession,
    host: str,
    port: int,
    prediction: str,
    gold: str,
    strict: bool = True,
    extra: dict[str, Any] | None = None,
) -> str:
    body = {"prediction": prediction, "gold": gold, "strict": strict}
    if extra:
        body.update(extra)
    async with session.post(
        f"http://{host}:{port}/verify_answer", json=body
    ) as resp:
        resp.raise_for_status()
        data = await resp.json()
    return data["answer_status"]
