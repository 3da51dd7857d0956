"""Trainer job: one process of the sharded learner world.

All trainer processes join a single jax.distributed world (coordinator env
wiring from the WorldMap — the reference's accelerate multi-node rendezvous,
/root/reference/pipelinerl/launch.py:306-399) and execute the same jitted
train step over the global (dp, cp, tp) mesh; each rank consumes ITS OWN
``training_data`` stream partition (sentinel-equalized by the preprocessor,
so ranks stay in lockstep — reference preprocess.py:594-663 semantics).

Weight pushes: every rank participates in the de-shard gather (a GSPMD
all-gather), then rank 0 POSTs the serialized arrays to all engine servers
(inference/weight_transfer.py) — replacing the reference's per-parameter
NCCL broadcast (finetune_loop.py:234-292) without pausing any engine.
"""

from __future__ import annotations

import logging
import os

from .common import load_stage_config, stage_setup

logger = logging.getLogger(__name__)


def main(argv: list[str] | None = None) -> None:
    cfg = load_stage_config(argv)
    exp_path = stage_setup(cfg, "trainer")

    process_id = int(cfg.select("me.process_id", os.environ.get("JAX_PROCESS_ID", 0)))
    num_processes = int(
        cfg.select("me.num_processes", os.environ.get("JAX_NUM_PROCESSES", 1))
    )
    coordinator = cfg.select("me.coordinator") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )

    import jax

    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "trainer rank %d/%d joined: %d local / %d global devices",
            process_id, num_processes,
            jax.local_device_count(), jax.device_count(),
        )

    from ..launch import build_model
    from ..train.trainer import TrainerLoop

    params, model_cfg, tokenizer = build_model(cfg)

    llm_urls = list(cfg.select("me.llm_urls", []) or [])
    mesh_box: dict = {}

    def push_weights(new_params: dict, version: int) -> None:
        # all ranks run the gather (collective); rank 0 ships the bytes
        from ..inference.weight_transfer import gather_for_push, push_weights_http

        host_params = gather_for_push(new_params, mesh_box.get("mesh"))
        if process_id == 0 and llm_urls:
            push_weights_http(llm_urls, host_params, version)

    trainer = TrainerLoop(
        cfg,
        params,
        model_cfg,
        exp_path,
        weight_update_cb=push_weights if llm_urls else None,
        rank=process_id,
    )
    mesh_box["mesh"] = trainer.mesh
    trainer.run()
    logger.info("Trainer rank %d done", process_id)


if __name__ == "__main__":
    main()
