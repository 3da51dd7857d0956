"""Web-environment server: session-based HTTP API over BrowserGym (when
installed) or the simulated tasks.

Plays the role of the reference's TapeAgents EnvironmentServer + worker pool
(reference miniwob/environment_server.py + remote_environment): POST
/start_task {task, seed} → {session_id, observation}; POST /step
{session_id, action} → {observation, done, info}; POST /close
{session_id}; GET /health → {status, backend, active_sessions}.
"""

from __future__ import annotations

import asyncio
import logging
import uuid

from aiohttp import web

logger = logging.getLogger(__name__)


def _browsergym_available() -> bool:
    try:  # gated: not in this image
        import browsergym.miniwob  # noqa: F401
        return True
    except Exception:
        return False


class _BrowserGymSession:
    """Adapter giving BrowserGym the simulated-env step contract."""

    def __init__(self, task: str, seed: int):
        import gymnasium as gym
        self.env = gym.make(f"browsergym/{task}", task_kwargs={"seed": seed})
        obs, _ = self.env.reset()
        self._obs = obs

    def observe(self) -> str:
        return self._obs.get("axtree_txt") or str(self._obs.get("dom_txt", ""))

    def step(self, action: str):
        obs, reward, terminated, truncated, info = self.env.step(action)
        self._obs = obs
        done = bool(terminated or truncated)
        info = dict(info or {})
        info.setdefault("task_info", {}).setdefault("REWARD_GLOBAL", float(reward))
        return self.observe(), done, info

    def close(self) -> None:
        self.env.close()


class WebEnvironmentServer:
    def __init__(self, max_sessions: int = 32) -> None:
        self.sessions: dict[str, object] = {}
        self.max_sessions = max_sessions
        self.backend = "browsergym" if _browsergym_available() else "simulated"
        self.app = web.Application()
        self.app.router.add_get("/health", self.health)
        self.app.router.add_post("/start_task", self.start_task)
        self.app.router.add_post("/step", self.step)
        self.app.router.add_post("/close", self.close_session)

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "status": "ok",
                "backend": self.backend,
                "active_sessions": len(self.sessions),
            }
        )

    def _make_session(self, task: str, seed: int):
        if self.backend == "browsergym":
            return _BrowserGymSession(task, seed)
        from .simulated_env import SimulatedWebEnv

        return SimulatedWebEnv(task_name=task, seed=seed)

    async def start_task(self, request: web.Request) -> web.Response:
        body = await request.json()
        if len(self.sessions) >= self.max_sessions:
            return web.json_response({"error": "server at capacity"}, status=503)
        try:
            session = self._make_session(body["task"], int(body.get("seed", 0)))
        except Exception as e:
            logger.exception("failed to start task")
            return web.json_response({"error": str(e)}, status=400)
        sid = uuid.uuid4().hex
        self.sessions[sid] = session
        return web.json_response(
            {"session_id": sid, "observation": session.observe()}
        )

    async def step(self, request: web.Request) -> web.Response:
        body = await request.json()
        session = self.sessions.get(body.get("session_id", ""))
        if session is None:
            return web.json_response({"error": "no such session"}, status=404)
        try:
            obs, done, info = session.step(body.get("action", ""))
        except Exception as e:
            logger.exception("step failed")
            return web.json_response({"error": str(e)}, status=500)
        if done:
            self.sessions.pop(body["session_id"], None)
            closer = getattr(session, "close", None)
            if closer:
                try:
                    closer()
                except Exception:
                    pass
        return web.json_response({"observation": obs, "done": done, "info": info})

    async def close_session(self, request: web.Request) -> web.Response:
        body = await request.json()
        session = self.sessions.pop(body.get("session_id", ""), None)
        if session is not None and hasattr(session, "close"):
            try:
                session.close()
            except Exception:
                pass
        return web.json_response({"closed": session is not None})

    async def run(self, host: str = "0.0.0.0", port: int = 7780) -> web.AppRunner:
        runner = web.AppRunner(self.app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        logger.info("web environment (%s) serving on %s:%d", self.backend, host, port)
        return runner

    @staticmethod
    def launch(port: int = 7780) -> None:
        env = WebEnvironmentServer()

        async def serve_forever() -> None:
            await env.run(port=port)
            await asyncio.Event().wait()

        asyncio.run(serve_forever())
