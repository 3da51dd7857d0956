"""Device job: owns the chips — inference engine (+HTTP server) and trainer
in one process; weight updates are in-process pointer swaps.

Replaces the reference's separate vLLM-server and accelerate-trainer
processes plus their NCCL weight plane (launch.py:191-247, 306-399,
finetune_loop.py:174-292) with the single-process TPU arrangement.
"""

from __future__ import annotations

import asyncio
import logging
import threading

import jax
import jax.numpy as jnp

from ..inference.server import InferenceServer
from ..launch import build_engine, build_model
from ..train.trainer import TrainerLoop
from .common import load_stage_config, stage_setup

logger = logging.getLogger(__name__)


def main(argv: list[str] | None = None) -> None:
    cfg = load_stage_config(argv)
    exp_path = stage_setup(cfg, "device")
    port = int(cfg.select("me.port", 8080))

    # multi-host: join the jax.distributed world before touching devices
    # (env-driven — inert on single host; parallel/multihost.py)
    from ..parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed(cfg)

    params, model_cfg, tokenizer = build_model(cfg)
    engine_params = jax.tree.map(jnp.copy, params)
    engine = build_engine(cfg, engine_params, model_cfg, tokenizer)
    engine.start()

    server = InferenceServer(engine, tokenizer)
    loop = asyncio.new_event_loop()

    def serve() -> None:
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.run(port=port))
        loop.run_forever()

    server_thread = threading.Thread(target=serve, daemon=True, name="http-server")
    server_thread.start()

    def push_weights(new_params: dict, version: int) -> None:
        engine.update_params(jax.tree.map(jnp.copy, new_params), version)

    trainer = TrainerLoop(cfg, params, model_cfg, exp_path, weight_update_cb=push_weights)
    try:
        trainer.run()
    finally:
        engine.stop()
        loop.call_soon_threadsafe(loop.stop)
    logger.info("Device job done")


if __name__ == "__main__":
    main()
