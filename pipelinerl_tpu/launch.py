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
import os
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
        mrope = toy.get("mrope_section")
        if mrope is None and cfg.get("toy_vision") is not None:
            # default (t, h, w) split of the head_dim/2 rotary channels
            hidden = int(toy.get("hidden_size", 128))
            heads = int(toy.get("num_heads", 4))
            half = (hidden // heads) // 2
            mrope = (half - 2 * (half // 4), half // 4, half // 4)
        model_cfg = ModelConfig(
            vocab_size=int(toy.get("vocab_size", tokenizer.vocab_size)),
            hidden_size=int(toy.get("hidden_size", 128)),
            intermediate_size=int(toy.get("intermediate_size", 256)),
            num_layers=int(toy.get("num_layers", 2)),
            num_heads=int(toy.get("num_heads", 4)),
            num_kv_heads=int(toy.get("num_kv_heads", 2)),
            dtype=train_dtype,
            # toy VLM: mrope rows + IMAGE placeholder (toy_tokenizer.IMAGE)
            mrope_section=tuple(int(x) for x in mrope) if mrope else None,
            image_token_id=(
                int(toy.get("image_token_id", 259)) if cfg.get("toy_vision") else None
            ),
        )
        import jax

        params = init_params(jax.random.key(int(cfg.get("seed", 0))), model_cfg)
        if cfg.finetune.get("value_head", False):
            from .models.transformer import init_value_head

            params["value_head"] = init_value_head(
                jax.random.key(int(cfg.get("seed", 0)) + 99), model_cfg
            )
        return params, model_cfg, tokenizer
    from transformers import AutoTokenizer

    from .models.hf_loader import load_hf_model

    params, model_cfg = load_hf_model(model_path, dtype=train_dtype)
    tokenizer = AutoTokenizer.from_pretrained(model_path)
    # padded-vocab guard: Qwen-family checkpoints carry more logit rows than
    # tokenizer entries; mask the untrained padding rows out of every logits
    # consumer (models/transformer.lm_head_logits)
    n_tok = len(tokenizer)
    if n_tok < model_cfg.vocab_size:
        from dataclasses import replace as _dc_replace

        model_cfg = _dc_replace(model_cfg, valid_vocab=n_tok)
        logger.info(
            "Masking %d padded logit rows (vocab %d, tokenizer %d)",
            model_cfg.vocab_size - n_tok, model_cfg.vocab_size, n_tok,
        )
    return params, model_cfg, tokenizer


def build_vision(cfg: Config, model_cfg: ModelConfig):
    """→ (vision_params, vision_cfg) or (None, None) for text-only runs.
    Toy path (``cfg.toy_vision``) builds a random frozen tower; HF VLM
    checkpoints load via models/hf_loader.load_hf_vision."""
    toy_vis = cfg.get("toy_vision")
    if toy_vis is not None:
        import jax
        import jax.numpy as jnp

        from .models.vision import VisionConfig, init_vision_params

        vcfg = VisionConfig(
            hidden_size=int(toy_vis.get("hidden_size", 16)),
            intermediate_size=int(toy_vis.get("intermediate_size", 32)),
            num_heads=int(toy_vis.get("num_heads", 2)),
            depth=int(toy_vis.get("depth", 2)),
            out_hidden_size=model_cfg.hidden_size,
            patch_size=int(toy_vis.get("patch_size", 2)),
            temporal_patch_size=int(toy_vis.get("temporal_patch_size", 1)),
            spatial_merge_size=int(toy_vis.get("spatial_merge_size", 2)),
            window_size=int(toy_vis.get("window_size", 8)),
            fullatt_block_indexes=tuple(toy_vis.get("fullatt_block_indexes", (1,))),
            dtype=_DTYPES[cfg.finetune.get("param_dtype", "float32")],
        )
        vparams = init_vision_params(jax.random.key(int(cfg.get("seed", 0)) + 3), vcfg)
        return vparams, vcfg
    model_path = cfg.get("model_path")
    if model_path in (None, "toy"):
        return None, None
    from .models.hf_loader import load_hf_vision

    return load_hf_vision(
        model_path, dtype=_DTYPES[cfg.finetune.get("param_dtype", "float32")]
    )


def build_processor(cfg: Config, model_cfg: ModelConfig, tokenizer, vision_cfg):
    """Visual processor for the rollout client (None for text-only runs)."""
    if vision_cfg is None:
        return None
    if cfg.get("model_path") in (None, "toy"):
        from .models.toy_tokenizer import ToyVisualProcessor

        return ToyVisualProcessor(tokenizer, vision_cfg.spatial_merge_size)
    from .inference.processor import HFVisualProcessor

    return HFVisualProcessor(str(cfg.model_path))


def build_engine(
    cfg: Config,
    params: dict,
    model_cfg: ModelConfig,
    tokenizer,
    vision_params: dict | None = None,
    vision_cfg=None,
) -> InferenceEngine:
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
            adaptive_window=bool(ecfg.get("adaptive_window", True)),
            attn_impl=str(ecfg.get("attn_impl", "xla")),
            decode_attn_impl=str(ecfg.get("decode_attn_impl", "auto")),
            max_prefill_batch=int(ecfg.get("max_prefill_batch", 8)),
            tp=int(ecfg.get("tp", 1)),
            pp=int(ecfg.get("pp", 1)),
            kv_layout=str(ecfg.get("kv_layout", "auto")),
            kv_block_size=int(ecfg.get("kv_block_size", 128)),
            kv_pool_blocks=(
                int(ecfg.kv_pool_blocks) if ecfg.get("kv_pool_blocks") else None
            ),
            prefix_cache=bool(ecfg.get("prefix_cache", True)),
        ),
        eos_token_id=tokenizer.eos_token_id,
        vision_params=vision_params,
        vision_cfg=vision_cfg,
    )
    return engine


def _is_vlm_checkpoint(model_path) -> bool:
    if model_path in (None, "toy"):
        return False
    try:
        import json as _json

        with open(Path(model_path) / "config.json") as f:
            return bool(_json.load(f).get("vision_config"))
    except Exception:
        return False


def validate_config(cfg: Config) -> None:
    """Cross-cutting invariants checked before anything launches
    (reference validate_config, launch.py:53-103)."""
    problems: list[str] = []
    seq_length = int(cfg.finetune.seq_length)
    engine_max = int(cfg.select("engine.max_len", 0) or 0)
    if engine_max > seq_length:
        problems.append(
            f"engine.max_len ({engine_max}) > finetune.seq_length ({seq_length}): "
            "generated samples would not fit a packed trainer batch"
        )
    buckets = list(cfg.select("engine.prefill_buckets", []) or [])
    if buckets and max(buckets) > engine_max:
        problems.append(
            f"largest prefill bucket ({max(buckets)}) exceeds engine.max_len ({engine_max})"
        )
    attempts = int(cfg.get("attempts", 1))
    if attempts < 2 and not cfg.finetune.get("value_head", False):
        problems.append(
            "attempts < 2 with no value head: leave-one-out advantages are "
            "always zero (nothing to learn from)"
        )
    samples_per_step = int(cfg.finetune.samples_per_step)
    if samples_per_step % attempts != 0:
        logger.warning(
            "finetune.samples_per_step (%d) is not a multiple of attempts (%d); "
            "group boundaries will straddle optimizer steps",
            samples_per_step,
            attempts,
        )
    max_tokens = int(cfg.select("llm.parameters.max_tokens", 0) or 0)
    if max_tokens >= engine_max:
        problems.append(
            f"llm.parameters.max_tokens ({max_tokens}) >= engine.max_len "
            f"({engine_max}): no room for any prompt in the KV cache"
        )
    # prompt-length-aware budget check: even the SHORTEST bucketed prompt
    # must leave room for the full completion budget, else every request
    # silently truncates to finish_reason="length"
    if buckets and max_tokens and max_tokens + min(buckets) > engine_max:
        problems.append(
            f"llm.parameters.max_tokens ({max_tokens}) + smallest prefill "
            f"bucket ({min(buckets)}) exceeds engine.max_len ({engine_max}): "
            "no prompt can receive its full completion budget"
        )
    if buckets and max_tokens and max_tokens + max(buckets) > engine_max:
        logger.warning(
            "llm.parameters.max_tokens (%d) + largest prefill bucket (%d) "
            "exceeds engine.max_len (%d): long prompts will have their "
            "completion budget truncated",
            max_tokens, max(buckets), engine_max,
        )
    # KL needs a reference policy: in processes mode that is a provisioned
    # ref_engine job (reference launch.py:149); without one, ref_logprobs
    # silently read 0.0 and the KL penalty is garbage
    kl_coef = float(cfg.select("finetune.rl.kl_coef", 0.0) or 0.0)
    if (
        kl_coef != 0.0
        and str(cfg.get("launch_mode", "inline")) == "processes"
        and str(cfg.select("world.ref_engine", "auto")) in ("false", "False", "0")
    ):
        problems.append(
            "finetune.rl.kl_coef != 0 with world.ref_engine disabled: "
            "preprocessors would score KL against a zero reference policy"
        )
    policy = cfg.select("finetune.rl.policy_loss", "reinforce")
    if policy not in ("reinforce", "ppo", "gspo"):
        problems.append(f"unknown finetune.rl.policy_loss {policy!r}")
    # VLM invariants (reference launch.py:63-69: no packing/SP, batch 1)
    if cfg.get("toy_vision") is not None or _is_vlm_checkpoint(cfg.get("model_path")):
        par = cfg.get("parallel") or {}
        if int(par.get("cp", 1)) > 1 or int(par.get("dp", 1)) > 1:
            problems.append(
                "VLM training requires parallel.cp == 1 and dp == 1 "
                "(multimodal rows are unpacked and cannot be cp-sliced)"
            )
    # unknown rl keys would be silently dropped by the RLLossConfig filter —
    # fail loudly instead (a mis-nested entropy_bonus once cost a debug hunt)
    rl_node = cfg.select("finetune.rl")
    if rl_node:
        from .train.rl_loss import RLLossConfig

        unknown = [k for k, _ in rl_node.items() if k not in RLLossConfig.__dataclass_fields__]
        if unknown:
            problems.append(f"unknown finetune.rl key(s): {unknown}")
    mode = str(cfg.select("debug.mode", "") or "")
    if mode and mode != "open_loop":
        stages = _debug_stages(cfg)
        if "actor" not in stages and not cfg.select("debug.streams_from"):
            problems.append(
                f"debug.mode={mode!r} drops the actor but debug.streams_from "
                "is unset — nothing would feed the pipeline"
            )
    if problems:
        raise ValueError("Invalid config:\n- " + "\n- ".join(problems))


def debug_link_streams(exp_path: str, streams_from: str, topics: list[str]) -> None:
    """Symlink stream topics from a previous run so missing upstream stages
    are replaced by recorded-stream replay (reference launch.py:554-564)."""
    src_root = Path(streams_from) / "streams"
    dst_root = Path(exp_path) / "streams"
    dst_root.mkdir(parents=True, exist_ok=True)
    for topic in topics:
        src = src_root / topic
        dst = dst_root / topic
        if not src.exists():
            raise FileNotFoundError(f"No recorded stream {src} to replay")
        if dst.is_symlink() or dst.exists():
            continue
        dst.symlink_to(src.resolve())
        logger.info("Replaying stream %s from %s", topic, src)


def _debug_stages(cfg: Config) -> set[str]:
    """Which stages run, per cfg.debug.mode (reference launch.py:684-697)."""
    mode = str(cfg.select("debug.mode", "") or "")
    all_stages = {"actor", "preprocessor", "trainer"}
    if not mode:
        return all_stages
    if mode == "open_loop":
        return {"actor"}
    stages = set(mode.split("+")) & (all_stages | {"finetune"})
    if "finetune" in stages:
        stages.discard("finetune")
        stages.add("trainer")
    if not stages:
        raise ValueError(f"Unknown debug.mode {mode!r}")
    return stages


def run_inline(cfg: Config) -> dict[str, Any]:
    """Single-host end-to-end run: engine + actor + preprocessor + trainer in
    one process, decoupled through streams. Returns summary stats.

    ``debug.mode`` runs a subset of stages with the missing upstream streams
    replayed from ``debug.streams_from``."""
    validate_config(cfg)
    exp_path = str(cfg.output_dir)
    Path(exp_path).mkdir(parents=True, exist_ok=True)
    setup_logging(Path(exp_path) / "logs")
    from .utils import enable_compilation_cache

    enable_compilation_cache(cfg.select("compilation_cache_dir"))
    set_streams_backend(cfg.get("streams", Config({})).get("backend", "files"))
    cfg.save(Path(exp_path) / "conf" / "exp_config.yaml")

    stages = _debug_stages(cfg)
    streams_from = cfg.select("debug.streams_from")
    if streams_from:
        replay: list[str] = []
        if "preprocessor" in stages and "actor" not in stages:
            replay.append("actor")
        if "trainer" in stages and "preprocessor" not in stages:
            replay.append("training_data")
        debug_link_streams(exp_path, str(streams_from), replay)

    params, model_cfg, tokenizer = build_model(cfg)
    vision_params, vision_cfg = build_vision(cfg, model_cfg)
    engine = None
    if "actor" in stages:
        # The trainer donates its param buffers on every optimizer step, and
        # same-device device_put aliases — the engine must own distinct
        # buffers or it would decode from deleted arrays. (Cross-mesh pushes
        # copy by construction.) The value head (if any) is trainer-only.
        engine_params = jax.tree.map(
            jnp.copy, {k: v for k, v in params.items() if k != "value_head"}
        )
        engine = build_engine(
            cfg, engine_params, model_cfg, tokenizer, vision_params, vision_cfg
        )
        engine.start()

    trainer_state = TrainerState(exp_path)
    trainer_state.start_listening()
    if "trainer" not in stages:
        # no trainer: fake version 0 so actors/preprocessors proceed
        # (reference state.py:28-32)
        trainer_state.debug_mode_init()

    preprocessor = trainer = actor = None
    threads: list[threading.Thread] = []
    max_steps = int(cfg.finetune.get("max_train_steps", 100))

    if "preprocessor" in stages:
        ref_score_fn = None
        if float(cfg.finetune.rl.get("kl_coef", 0.0)) != 0.0:
            # reference-policy scoring against the frozen initial weights: a
            # second engine sharing the device (reference runs a separate
            # ref vLLM, launch.py:149). Must own copies — TrainerLoop donates
            # the original buffers on every optimizer step.
            ref_params = jax.tree.map(
                jnp.copy, {k: v for k, v in params.items() if k != "value_head"}
            )
            ref_engine = build_engine(cfg, ref_params, model_cfg, tokenizer)
            ref_score_fn = ref_engine.score_tokens
        preprocessor = Preprocessor(
            cfg,
            exp_path,
            trainer_state,
            eos_token_id=tokenizer.eos_token_id,
            ref_score_fn=ref_score_fn,
            image_token_id=model_cfg.image_token_id,
            spatial_merge_size=(
                vision_cfg.spatial_merge_size if vision_cfg is not None else 2
            ),
        )
        threads.append(
            threading.Thread(target=preprocessor.run, name="preprocessor", daemon=True)
        )

    if "trainer" in stages:
        def push_weights(new_params: dict, version: int) -> None:
            # copy: the engine's weights must survive the trainer's donation
            if engine is None:
                return
            engine.update_params(
                jax.tree.map(
                    jnp.copy,
                    {k: v for k, v in new_params.items() if k != "value_head"},
                ),
                version,
            )

        trainer = TrainerLoop(
            cfg, params, model_cfg, exp_path, weight_update_cb=push_weights,
            vision_params=vision_params, vision_cfg=vision_cfg,
        )
        threads.append(
            threading.Thread(
                target=trainer.run, args=(max_steps,), name="trainer", daemon=True
            )
        )

    if "actor" in stages:
        llm = InProcessLLM(
            engine,
            tokenizer,
            dict(cfg.llm.parameters.items()),
            processor=build_processor(cfg, model_cfg, tokenizer, vision_cfg),
        )
        loader = resolve(cfg.dataset_loader)
        problems = loader(list(cfg.get("train_dataset_names", ["train"])))
        if cfg.get("train_subset"):
            problems = problems[: int(cfg.train_subset)]
        rollout_policy = resolve(cfg.rollout_policy)
        actor = ActorLoop(
            cfg, [llm], problems, trainer_state, exp_path, rollout_policy,
            is_training=True,
        )

    total_groups = cfg.get("total_groups")
    for t in threads:
        t.start()

    if actor is not None:
        # eval interleaving (reference actor.py:868-909): every
        # eval_every_n_versions weight versions, pause train scheduling and
        # run the test problems through a test ActorLoop (stats land on the
        # stats_test stream)
        eval_every = int(cfg.get("eval_every_n_versions", 0) or 0)
        test_problems: list = []
        if eval_every:
            loader = resolve(cfg.dataset_loader)
            test_problems = loader(list(cfg.get("test_dataset_names", [])))
            if cfg.get("test_subset"):
                test_problems = test_problems[: int(cfg.test_subset)]

        async def _run_actor_with_eval():
            watcher = None
            if eval_every and test_problems:
                test_llm = InProcessLLM(
                    engine,
                    tokenizer,
                    dict(cfg.test_llm.parameters.items()),
                    processor=build_processor(cfg, model_cfg, tokenizer, vision_cfg),
                )

                async def eval_watcher():
                    last_eval_version = 0
                    while not trainer_state.training_done:
                        await asyncio.sleep(0.2)
                        version = trainer_state.propagated_weight_version or 0
                        if version - last_eval_version >= eval_every:
                            last_eval_version = version
                            actor.is_scheduling_paused = True
                            logger.info("Starting inline eval at version %d", version)
                            eval_loop = ActorLoop(
                                cfg, [test_llm], test_problems, trainer_state,
                                exp_path, rollout_policy, is_training=False,
                            )
                            await eval_loop.run(total_groups=len(test_problems))
                            actor.is_scheduling_paused = False
                            logger.info("Inline eval at version %d done", version)

                watcher = asyncio.create_task(eval_watcher())
            try:
                return await actor.run(total_groups=total_groups)
            finally:
                if watcher is not None:
                    watcher.cancel()

        actor_stats = asyncio.run(_run_actor_with_eval())
    else:
        from .actor import ActorStats

        actor_stats = ActorStats()
        # stage-subset run: wait for the trainer (or preprocessor) to finish
        deadline = time.monotonic() + float(cfg.get("drain_timeout_s", 120))
        while (
            "trainer" in stages
            and not trainer_state.training_done
            and time.monotonic() < deadline
        ):
            time.sleep(0.1)

    # actors done; let the trainer drain, then stop everything
    if "trainer" in stages:
        deadline = time.monotonic() + float(cfg.get("drain_timeout_s", 120))
        while not trainer_state.training_done and time.monotonic() < deadline:
            time.sleep(0.1)
    if preprocessor is not None:
        preprocessor.stop()
    for t in threads:
        t.join(timeout=30)
    if engine is not None:
        engine.stop()
    trainer_state.stop()

    return {
        "actor": actor_stats.snapshot(),
        "trainer": (
            {
                "completed_steps": trainer.metrics.completed_steps,
                "samples": trainer.metrics.samples,
                "tokens": trainer.metrics.tokens,
                "train_loss": trainer.metrics.train_loss,
                "last_broadcasted_version": trainer.metrics.last_broadcasted_version,
            }
            if trainer is not None
            else {}
        ),
        "engine": engine.perf_counters() if engine is not None else {},
    }


def _wait_for_hub(addr: str, timeout: float = 60.0) -> None:
    """Block until the stream hub answers a ping."""
    from .streams_tcp import _HubConnection

    deadline = time.monotonic() + timeout
    conn = _HubConnection(addr)
    while True:
        try:
            conn.request({"op": "ping"}, retries=1)
            conn.close()
            return
        except Exception:
            if time.monotonic() > deadline:
                raise TimeoutError(f"Stream hub {addr} failed to come up")
            time.sleep(0.5)


def _wait_for_http(urls: list[str], timeout: float = 600.0) -> None:
    """Block until every URL's /health responds (reference
    utils.py:445-465)."""
    import urllib.request

    deadline = time.monotonic() + timeout
    for url in urls:
        while True:
            try:
                with urllib.request.urlopen(f"{url}/health", timeout=5) as resp:
                    if resp.status == 200:
                        break
            except Exception:
                pass
            if time.monotonic() > deadline:
                raise TimeoutError(f"Server {url} failed to become healthy")
            time.sleep(1.0)


def run_processes(cfg: Config) -> int:
    """Multi-process / multi-host deployment: device jobs (or a split
    engine/trainer world), actor/preprocessor/environment host jobs, the
    stream hub for cross-host transport, supervised fail-fast
    (reference launch.py:489-596 + multi-node 306-399). Non-local hosts are
    reached over ssh (the reference's DNS job scheme, world.py:44-49, maps
    to ``world.hosts``). Returns an exit code."""
    import subprocess

    from .world import WorldMap

    validate_config(cfg)
    exp_path = Path(str(cfg.output_dir))
    exp_path.mkdir(parents=True, exist_ok=True)
    setup_logging(exp_path / "logs" / "launcher")
    world_map = WorldMap(cfg)
    cfg = cfg.copy()
    cfg["jobs"] = world_map.to_config()
    if world_map.environment_servers:
        cfg["environment"] = world_map.environment_servers
    if world_map.use_stream_hub:
        # all stages route streams through the hub (cross-host transport)
        cfg["streams"] = {"backend": "tcp", "hub": world_map.stream_hub_addr}
    config_dir = exp_path / "conf"
    cfg.save(config_dir / "exp_config.yaml")

    entrypoints = {
        "device": "pipelinerl_tpu.entrypoints.run_device",
        "engine": "pipelinerl_tpu.entrypoints.run_engine",
        "ref_engine": "pipelinerl_tpu.entrypoints.run_engine",
        "trainer": "pipelinerl_tpu.entrypoints.run_trainer",
        "stream_hub": "pipelinerl_tpu.entrypoints.run_stream_hub",
        "actor": "pipelinerl_tpu.entrypoints.run_actor",
        "preprocessor": "pipelinerl_tpu.entrypoints.run_preprocess",
        "environment": "pipelinerl_tpu.entrypoints.run_environment",
    }
    dry_run = bool(os.environ.get("DRY_RUN"))
    procs: list[tuple[str, Any]] = []
    log_dir = exp_path / "logs"
    log_dir.mkdir(parents=True, exist_ok=True)
    chip_jobs = ("device", "engine", "ref_engine", "trainer")

    def spawn(job) -> None:
        name = f"{job.kind}_{job.replica_idx}"
        cmd = [
            sys.executable,
            "-m",
            entrypoints[job.kind],
            f"--config-dir={config_dir}",
            "--config-name=exp_config",
            f"+me.kind={job.kind}",
            f"+me.replica_idx={job.replica_idx}",
        ]
        if job.port is not None:
            cmd.append(f"+me.port={job.port}")
        if job.kind in ("actor", "trainer"):
            urls = ",".join(f'"{u}"' for u in world_map.llm_urls)
            cmd.append(f"+me.llm_urls=[{urls}]")
        if job.kind == "preprocessor" and world_map.ref_llm_urls:
            ref_urls = ",".join(f'"{u}"' for u in world_map.ref_llm_urls)
            cmd.append(f"+me.ref_llm_urls=[{ref_urls}]")
        for key, value in job.extra.items():
            cmd.append(f"+me.{key}={value}")
        env = dict(os.environ)
        if job.kind not in chip_jobs:
            # host-only jobs must not register with the (single-tenant) TPU
            # runtime; drop the sitecustomize path and force CPU
            env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent)
            env["JAX_PLATFORMS"] = "cpu"
        if job.kind == "trainer":
            env["JAX_COORDINATOR_ADDRESS"] = job.extra["coordinator"]
            env["JAX_NUM_PROCESSES"] = str(job.extra["num_processes"])
            env["JAX_PROCESS_ID"] = str(job.extra["process_id"])
        (exp_path / job.kind).mkdir(exist_ok=True)
        script = " \\\n  ".join(cmd)
        (exp_path / job.kind / f"start_{name}.sh").write_text(f"#!/bin/sh\n{script}\n")
        if not job.is_local:
            # remote host: ship env inline over ssh (key-based auth assumed;
            # the experiment dir must be on a shared filesystem)
            env_assigns = [
                f"{k}={env[k]}"
                for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                          "JAX_PROCESS_ID", "JAX_PLATFORMS", "PYTHONPATH")
                if k in env
            ]
            cmd = ["ssh", job.hostname, "env", *env_assigns, *cmd]
        if dry_run:
            logger.info("DRY_RUN: %s", " ".join(cmd))
            return
        log_file = open(log_dir / f"{name}.out", "w")
        # own process group per job: shutdown kills the whole group, so a
        # dying launcher cannot orphan grandchildren
        proc = subprocess.Popen(
            cmd, stdout=log_file, stderr=subprocess.STDOUT, env=env,
            start_new_session=True,
        )
        procs.append((name, proc))

    # order: stream hub first (transport), then environments + chip jobs,
    # then health-gate, then the data-plane stages
    for job in world_map.jobs_of("stream_hub"):
        spawn(job)
    if not dry_run and world_map.use_stream_hub:
        _wait_for_hub(world_map.stream_hub_addr)
    for job in (
        world_map.jobs_of("environment")
        + world_map.jobs_of("device")
        + world_map.jobs_of("engine")
        + world_map.jobs_of("ref_engine")
        + world_map.jobs_of("trainer")
    ):
        spawn(job)
    if not dry_run:
        _wait_for_http(world_map.llm_urls + world_map.ref_llm_urls)
        _wait_for_http(
            [f"http://{e['hostname']}:{e['port']}" for e in world_map.environment_servers]
        )
    for job in world_map.jobs_of("preprocessor") + world_map.jobs_of("actor"):
        spawn(job)
    if dry_run:
        return 0
    if world_map.use_stream_hub:
        from .streams import set_streams_backend

        set_streams_backend("tcp", hub=world_map.stream_hub_addr)

    def _kill_all() -> None:
        import signal as _signal

        for _, proc in procs:
            try:
                os.killpg(proc.pid, _signal.SIGTERM)
            except (ProcessLookupError, PermissionError):
                pass

    # a terminated launcher must take its jobs with it (otherwise orphaned
    # trainers keep the coordinator port and the hub keeps its socket)
    import signal

    def _on_term(signum, frame):
        _kill_all()
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _on_term)

    trainer_state = TrainerState(str(exp_path))
    trainer_state.start_listening()
    exit_code = 0
    try:
        while procs:
            time.sleep(1.0)
            for name, proc in list(procs):
                rc = proc.poll()
                if rc is None:
                    continue
                procs.remove((name, proc))
                if rc != 0:
                    logger.error("Job %s exited with %d — stopping everything", name, rc)
                    exit_code = 1
                    raise RuntimeError(f"job {name} failed")
                logger.info("Job %s finished cleanly", name)
            if trainer_state.training_done:
                # graceful shutdown: give host jobs a moment, then terminate
                logger.info("TrainingDone observed; shutting down remaining jobs")
                deadline = time.monotonic() + 30
                while procs and time.monotonic() < deadline:
                    for name, proc in list(procs):
                        if proc.poll() is not None:
                            procs.remove((name, proc))
                    time.sleep(0.5)
                break
    except (RuntimeError, KeyboardInterrupt):
        exit_code = exit_code or 1
    finally:
        _kill_all()
        for name, proc in procs:
            try:
                proc.wait(timeout=10)
            except Exception:
                proc.kill()
        trainer_state.stop()
    return exit_code


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
    mode = cfg.get("launch_mode", "inline")
    if mode == "processes":
        sys.exit(run_processes(cfg))
    stats = run_inline(cfg)
    logger.info("Run complete: %s", stats)
    import json

    print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
