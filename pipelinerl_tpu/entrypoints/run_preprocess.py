"""Preprocessor job: advantages + packing between actor and trainer streams.

Ref-logprob scoring (when kl_coef != 0) goes over HTTP to the reference
engine (reference preprocess.py:86-104 did the same via /v1/completions)."""

from __future__ import annotations

import asyncio
import logging

from ..preprocess import Preprocessor
from ..state import TrainerState
from .common import load_stage_config, stage_setup

logger = logging.getLogger(__name__)


def main(argv: list[str] | None = None) -> None:
    cfg = load_stage_config(argv)
    exp_path = stage_setup(cfg, "preprocessor")

    from transformers import AutoTokenizer

    from ..models.toy_tokenizer import ToyTokenizer

    model_path = cfg.get("model_path")
    tokenizer = (
        ToyTokenizer() if model_path in (None, "toy") else AutoTokenizer.from_pretrained(model_path)
    )

    trainer_state = TrainerState(exp_path)
    trainer_state.start_listening()

    ref_score_fn = None
    ref_urls = list(cfg.select("me.ref_llm_urls", []) or [])
    if float(cfg.finetune.rl.get("kl_coef", 0.0)) != 0.0 and ref_urls:
        from ..inference.http_client import HTTPLLM

        ref_llm = HTTPLLM(ref_urls[0], tokenizer)

        def score(token_ids):
            return asyncio.run(ref_llm.ascore(token_ids))

        ref_score_fn = score

    preprocessor = Preprocessor(
        cfg,
        exp_path,
        trainer_state,
        eos_token_id=tokenizer.eos_token_id,
        # one training_data partition per trainer process (split world) or
        # per combined device job
        num_trainers=(
            int(cfg.select("world.trainer_procs", 0) or 0)
            or int(cfg.select("world.replicas", 1))
        ),
        ref_score_fn=ref_score_fn,
    )
    preprocessor.run()
    logger.info("Preprocessor done")


if __name__ == "__main__":
    main()
