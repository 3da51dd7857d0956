"""Logic verifier environment server + RPC client.

Same HTTP surface as the reference's LogicEnvironment FastAPI server
(domains/logic/verifier_api.py:95-160): POST /verify_answer
{prediction, reward_context} → {answer_status}, plus GET /health.
Verification runs in a thread executor with a wall-clock timeout (the
reference uses SIGALRM in a process pool)."""

from __future__ import annotations

import asyncio
import logging
from typing import Any

from aiohttp import web

from .verifiers import UNPARSABLE, verify_answer

logger = logging.getLogger(__name__)

VERIFY_TIMEOUT_S = 5.0


class LogicEnvironment:
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
            status = await asyncio.wait_for(
                loop.run_in_executor(
                    None,
                    verify_answer,
                    body.get("prediction", ""),
                    body.get("reward_context") or {},
                ),
                timeout=VERIFY_TIMEOUT_S,
            )
        except asyncio.TimeoutError:
            logger.warning("logic verification timed out")
            status = UNPARSABLE
        except Exception:
            logger.exception("logic verification crashed")
            status = UNPARSABLE
        return web.json_response({"answer_status": status})

    async def run(self, host: str = "0.0.0.0", port: int = 7778) -> web.AppRunner:
        runner = web.AppRunner(self.app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        logger.info("logic environment serving on %s:%d", host, port)
        return runner

    @staticmethod
    def launch(port: int = 7778) -> None:
        """Blocking entrypoint for a verifier subprocess (run_environment)."""
        env = LogicEnvironment()

        async def serve_forever() -> None:
            await env.run(port=port)
            await asyncio.Event().wait()

        asyncio.run(serve_forever())


async def verify_answer_rpc(
    session: Any, host: str, port: int, prediction: str, reward_context: dict
) -> str:
    async with session.post(
        f"http://{host}:{port}/verify_answer",
        json={"prediction": prediction, "reward_context": reward_context},
    ) as response:
        if response.status != 200:
            raise ValueError(f"verifier error {response.status}: {await response.text()}")
        return (await response.json())["answer_status"]
