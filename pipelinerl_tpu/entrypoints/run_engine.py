"""Engine job: inference engine + OpenAI-compatible HTTP server, weights
updated in-flight via POST /receive_weight_update (binary push from the
trainer world — inference/weight_transfer.py).

Split-deployment counterpart of the reference's standalone vLLM servers
(/root/reference/pipelinerl/launch.py:191-247, vllm1.py)."""

from __future__ import annotations

import asyncio
import logging

from ..inference.server import InferenceServer
from ..launch import build_engine, build_model
from .common import load_stage_config, stage_setup

logger = logging.getLogger(__name__)


def main(argv: list[str] | None = None) -> None:
    cfg = load_stage_config(argv)
    frozen = bool(cfg.select("me.frozen", False))
    stage_setup(cfg, "ref_engine" if frozen else "engine")
    port = int(cfg.select("me.port", 8080))

    params, model_cfg, tokenizer = build_model(cfg)
    engine = build_engine(cfg, params, model_cfg, tokenizer)
    engine.start()

    # frozen ref_engine jobs reject weight pushes (KL reference policy)
    server = InferenceServer(engine, tokenizer, frozen=frozen)
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    loop.run_until_complete(server.run(port=port))
    try:
        loop.run_forever()
    finally:
        engine.stop()


if __name__ == "__main__":
    main()
