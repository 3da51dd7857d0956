"""Orchestrator: builds the model/engine/stages and runs them.

Reference analogue: /root/reference/pipelinerl/launch.py (process spawner) —
but the TPU-native deployment unit is different (SURVEY.md §7): one process
owns the chips and runs the engine loop, preprocessor, and trainer on
threads with the actor's asyncio scheduler, all decoupled through streams.
``inline`` mode (this file) is that single-host arrangement; multi-host
launch adds engine replicas per host and a sharded trainer mesh
(parallel/, entrypoints/).

Weight updates are in-process pointer swaps (engine.update_params) — the
reference's NCCL broadcast group + HTTP pause/resume plane
(launch.py:191-247, vllm1.py:155-182) has no equivalent here because no
bytes need to move.
"""

from __future__ import annotations

import asyncio
import logging
import sys
import threading
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .actor import ActorLoop
from .config import Config, compose
from .domains.registry import resolve
from .inference import EngineConfig, InferenceEngine
from .inference.client import InProcessLLM
from .models.toy_tokenizer import ToyTokenizer
from .models.transformer import ModelConfig, init_params
from .preprocess import Preprocessor
from .state import TrainerState
from .streams import set_streams_backend
from .train.trainer import TrainerLoop
from .utils import setup_logging

logger = logging.getLogger(__name__)

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def build_model(cfg: Config):
    """→ (params, model_cfg, tokenizer). model_path=null builds the toy
    from-scratch model (hermetic runs); otherwise an HF checkpoint dir."""
    model_path = cfg.get("model_path")
    train_dtype = _DTYPES[cfg.finetune.get("param_dtype", "float32")]
    if model_path in (None, "toy"):
        tokenizer = ToyTokenizer()
        toy = cfg.get("toy_model", Config({}))
        model_cfg = ModelConfig(
            vocab_size=int(toy.get("vocab_size", tokenizer.vocab_size)),
            hidden_size=int(toy.get("hidden_size", 128)),
            intermediate_size=int(toy.get("intermediate_size", 256)),
            num_layers=int(toy.get("num_layers", 2)),
            num_heads=int(toy.get("num_heads", 4)),
            num_kv_heads=int(toy.get("num_kv_heads", 2)),
            dtype=train_dtype,
        )
        import jax

        params = init_params(jax.random.key(int(cfg.get("seed", 0))), model_cfg)
        return params, model_cfg, tokenizer
    from transformers import AutoTokenizer

    from .models.hf_loader import load_hf_model

    params, model_cfg = load_hf_model(model_path, dtype=train_dtype)
    tokenizer = AutoTokenizer.from_pretrained(model_path)
    return params, model_cfg, tokenizer


def build_engine(cfg: Config, params: dict, model_cfg: ModelConfig, tokenizer) -> InferenceEngine:
    ecfg = cfg.get("engine", Config({}))
    engine = InferenceEngine(
        params,
        model_cfg,
        EngineConfig(
            max_slots=int(ecfg.get("max_slots", 32)),
            max_len=int(ecfg.get("max_len", 2048)),
            prefill_buckets=tuple(ecfg.get("prefill_buckets", (128, 256, 512, 1024))),
            seed=int(cfg.get("seed", 0)),
            cache_dtype=_DTYPES[ecfg.get("cache_dtype", "bfloat16")],
            decode_window=int(ecfg.get("decode_window", 8)),
            window_pipeline_depth=int(ecfg.get("window_pipeline_depth", 2)),
            attn_impl=str(ecfg.get("attn_impl", "xla")),
        ),
        eos_token_id=tokenizer.eos_token_id,
    )
    return engine


def run_inline(cfg: Config) -> dict[str, Any]:
    """Single-host end-to-end run: engine + actor + preprocessor + trainer in
    one process, decoupled through streams. Returns summary stats."""
    exp_path = str(cfg.output_dir)
    Path(exp_path).mkdir(parents=True, exist_ok=True)
    setup_logging(Path(exp_path) / "logs")
    set_streams_backend(cfg.get("streams", Config({})).get("backend", "files"))
    cfg.save(Path(exp_path) / "conf" / "exp_config.yaml")

    params, model_cfg, tokenizer = build_model(cfg)
    # The trainer donates its param buffers on every optimizer step, and
    # same-device device_put aliases — the engine must own distinct buffers
    # or it would decode from deleted arrays. (Cross-mesh pushes copy by
    # construction; this inline single-device path is the aliasing case.)
    engine_params = jax.tree.map(jnp.copy, params)
    engine = build_engine(cfg, engine_params, model_cfg, tokenizer)
    engine.start()

    trainer_state = TrainerState(exp_path)
    trainer_state.start_listening()

    llm = InProcessLLM(engine, tokenizer, dict(cfg.llm.parameters.items()))

    ref_score_fn = None
    if float(cfg.finetune.rl.get("kl_coef", 0.0)) != 0.0:
        # reference-policy scoring against the frozen initial weights: a
        # second engine sharing the device (reference runs a separate
        # ref vLLM, launch.py:149)
        ref_engine = build_engine(cfg, params, model_cfg, tokenizer)
        ref_score_fn = ref_engine.score_tokens

    preprocessor = Preprocessor(
        cfg,
        exp_path,
        trainer_state,
        eos_token_id=tokenizer.eos_token_id,
        ref_score_fn=ref_score_fn,
    )
    def push_weights(new_params: dict, version: int) -> None:
        # copy so the engine's weights survive the trainer's buffer donation
        engine.update_params(jax.tree.map(jnp.copy, new_params), version)

    trainer = TrainerLoop(
        cfg,
        params,
        model_cfg,
        exp_path,
        weight_update_cb=push_weights,
    )

    loader = resolve(cfg.dataset_loader)
    problems = loader(list(cfg.get("train_dataset_names", ["train"])))
    if cfg.get("train_subset"):
        problems = problems[: int(cfg.train_subset)]
    rollout_policy = resolve(cfg.rollout_policy)
    actor = ActorLoop(
        cfg,
        [llm],
        problems,
        trainer_state,
        exp_path,
        rollout_policy,
        is_training=True,
    )

    max_steps = int(cfg.finetune.get("max_train_steps", 100))
    total_groups = cfg.get("total_groups")

    threads = [
        threading.Thread(target=preprocessor.run, name="preprocessor", daemon=True),
        threading.Thread(target=trainer.run, args=(max_steps,), name="trainer", daemon=True),
    ]
    for t in threads:
        t.start()

    actor_stats = asyncio.run(actor.run(total_groups=total_groups))

    # actors done; let the trainer drain, then stop everything
    deadline = time.monotonic() + float(cfg.get("drain_timeout_s", 120))
    while not trainer_state.training_done and time.monotonic() < deadline:
        time.sleep(0.1)
    preprocessor.stop()
    for t in threads:
        t.join(timeout=30)
    engine.stop()
    trainer_state.stop()

    return {
        "actor": actor_stats.snapshot(),
        "trainer": {
            "completed_steps": trainer.metrics.completed_steps,
            "samples": trainer.metrics.samples,
            "tokens": trainer.metrics.tokens,
            "train_loss": trainer.metrics.train_loss,
            "last_broadcasted_version": trainer.metrics.last_broadcasted_version,
        },
        "engine": {
            "generated_tokens": engine.total_generated_tokens,
            "prefill_tokens": engine.total_prefill_tokens,
            "decode_steps": engine.decode_steps,
        },
    }


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = "conf"
    config_name = "base"
    overrides = []
    for arg in argv:
        if arg.startswith("--config-dir="):
            config_dir = arg.split("=", 1)[1]
        elif arg.startswith("--config-name="):
            config_name = arg.split("=", 1)[1]
        else:
            overrides.append(arg)
    cfg = compose(config_dir, config_name, overrides)
    stats = run_inline(cfg)
    logger.info("Run complete: %s", stats)
    import json

    print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
