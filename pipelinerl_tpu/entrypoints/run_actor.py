"""Actor job: schedules grouped rollouts against the engine HTTP servers,
with eval interleaving every ``eval_every_n_versions`` weight versions
(reference actor.py:783-909)."""

from __future__ import annotations

import asyncio
import logging

from ..actor import ActorLoop
from ..domains.registry import resolve
from ..inference.http_client import HTTPLLM
from ..state import TrainerState
from .common import load_stage_config, stage_setup

logger = logging.getLogger(__name__)


async def amain(cfg) -> None:
    exp_path = stage_setup(cfg, "actor")
    from transformers import AutoTokenizer

    from ..models.toy_tokenizer import ToyTokenizer

    model_path = cfg.get("model_path")
    tokenizer = (
        ToyTokenizer() if model_path in (None, "toy") else AutoTokenizer.from_pretrained(model_path)
    )

    urls = list(cfg.select("me.llm_urls", []) or [])
    if not urls:
        urls = [f"http://127.0.0.1:{cfg.select('world.engine_start_port', 8080)}"]
    llms = [HTTPLLM(url, tokenizer, dict(cfg.llm.parameters.items())) for url in urls]
    test_llms = [
        HTTPLLM(url, tokenizer, dict(cfg.test_llm.parameters.items())) for url in urls
    ]

    trainer_state = TrainerState(exp_path)
    trainer_state.start_listening()
    if cfg.select("debug.mode"):
        trainer_state.debug_mode_init()
    trainer_state.wait_for_model_version(0)

    loader = resolve(cfg.dataset_loader)
    problems = loader(list(cfg.get("train_dataset_names", ["train"])))
    if cfg.get("train_subset"):
        problems = problems[: int(cfg.train_subset)]
    rollout_policy = resolve(cfg.rollout_policy)
    train_loop = ActorLoop(
        cfg, llms, problems, trainer_state, exp_path, rollout_policy, is_training=True
    )

    eval_every = int(cfg.get("eval_every_n_versions", 0) or 0)
    test_problems = []
    if eval_every:
        test_problems = loader(list(cfg.get("test_dataset_names", [])))
        if cfg.get("test_subset"):
            test_problems = test_problems[: int(cfg.test_subset)]

    async def eval_watcher() -> None:
        last_eval_version = 0
        while not trainer_state.training_done:
            await asyncio.sleep(1.0)
            version = trainer_state.propagated_weight_version or 0
            if eval_every and version - last_eval_version >= eval_every:
                last_eval_version = version
                train_loop.is_scheduling_paused = True
                logger.info("Starting eval at version %d", version)
                eval_loop = ActorLoop(
                    cfg,
                    test_llms,
                    test_problems,
                    trainer_state,
                    exp_path,
                    rollout_policy,
                    is_training=False,
                )
                await eval_loop.run(total_groups=len(test_problems))
                train_loop.is_scheduling_paused = False
                logger.info("Eval at version %d done", version)

    watcher = asyncio.create_task(eval_watcher())
    await train_loop.run(total_groups=cfg.get("total_groups"))
    watcher.cancel()


def main(argv: list[str] | None = None) -> None:
    cfg = load_stage_config(argv)
    asyncio.run(amain(cfg))


if __name__ == "__main__":
    main()
