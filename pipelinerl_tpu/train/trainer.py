"""The finetune loop: stream-fed micro-batches, gradient accumulation,
optax updates, weight-version publishing, in-flight weight pushes.

Re-design of the reference trainer (/root/reference/pipelinerl/finetune_loop.py):

- one jitted grad pass per packed micro-batch; gradients accumulate on
  device; the optimizer applies when the accumulated *sample* count reaches
  ``finetune.samples_per_step`` (the reference's
  train_batch_size × gradient_accumulation_passes target,
  finetune_loop.py:709-713) — the loss is pre-normalized by that count so
  summing gradients is exact;
- weight version ≡ cumulative trained samples (finetune_loop.py:948-949);
  ``SamplesProcessed`` after every pass, ``WeightUpdateSuccess`` after every
  push, ``TrainingDone`` at exit (finetune_loop.py:141-171);
- weight push = calling ``weight_update_cb(params, version)`` — in-process
  that is InferenceEngine.update_params (pointer swap between decode steps);
  across meshes it is a device_put reshard. No NCCL group, no engine pause.
"""

from __future__ import annotations

import dataclasses
import logging
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..state import SamplesProcessed, TrainerState, TrainingDone, WeightUpdateSuccess
from ..streams import SingleStreamSpec, StreamReader, StreamWriter
from ..types import TrainerBatch
from ..models.transformer import ModelConfig
from .rl_loss import RLLossConfig, rl_loss

logger = logging.getLogger(__name__)


@dataclass
class TrainingMetrics:
    completed_steps: int = 0
    passes: int = 0
    samples: int = 0
    tokens: int = 0
    last_broadcasted_version: int = 0
    samples_too_old_to_train: int = 0
    train_loss: float = 0.0
    grad_norm: float = 0.0
    lr: float = 0.0
    time_waiting_for_data: float = 0.0


def make_optimizer(cfg: Config) -> tuple[optax.GradientTransformation, Callable]:
    lr = float(cfg.finetune.learning_rate)
    warmup = int(cfg.finetune.get("num_warmup_steps", 0))
    max_steps = int(cfg.finetune.get("max_train_steps", 100_000))
    sched_type = cfg.finetune.get("lr_scheduler_type", "constant_with_warmup")
    if sched_type == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=max(1, warmup),
            decay_steps=max_steps,
            end_value=0.0,
        )
    elif sched_type in ("constant", "constant_with_warmup"):
        if warmup > 0:
            schedule = optax.join_schedules(
                [
                    optax.linear_schedule(0.0, lr, warmup),
                    optax.constant_schedule(lr),
                ],
                boundaries=[warmup],
            )
        else:
            schedule = optax.constant_schedule(lr)
    else:
        raise ValueError(f"Unknown lr_scheduler_type {sched_type!r}")

    optim_name = cfg.finetune.get("optim", "adamw")
    weight_decay = float(cfg.finetune.get("weight_decay", 0.0))
    clip = cfg.finetune.get("gradient_clipping_threshold")

    def decay_mask(params):
        # decay only matrices (>=2D) — biases and norm scales excluded,
        # matching the reference's param grouping (finetune/optim.py:25-46)
        return jax.tree.map(lambda p: p.ndim >= 2, params)

    if optim_name in ("adamw", "adamw_torch"):
        base = optax.adamw(schedule, weight_decay=weight_decay, mask=decay_mask)
    elif optim_name == "lion":
        base = optax.lion(schedule, weight_decay=weight_decay, mask=decay_mask)
    elif optim_name == "adafactor":
        base = optax.adafactor(schedule)
    else:
        raise ValueError(f"Unknown optimizer {optim_name!r}")
    transforms = []
    if clip is not None:
        transforms.append(optax.clip_by_global_norm(float(clip)))
    transforms.append(base)
    return optax.chain(*transforms), schedule


def batch_to_device(batch: TrainerBatch) -> dict:
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
    return arrays


class TrainerLoop:
    def __init__(
        self,
        cfg: Config,
        params: dict,
        model_cfg: ModelConfig,
        exp_path: str,
        weight_update_cb: Callable[[dict, int], None] | None = None,
        rank: int = 0,
        input_topic: str = "training_data",
        vision_params: dict | None = None,
        vision_cfg=None,  # models.vision.VisionConfig
    ):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.exp_path = exp_path
        self.weight_update_cb = weight_update_cb
        self.rank = rank
        self.metrics = TrainingMetrics()
        self.params = params
        # vision tower for VLM rows. Frozen by default (fixed feature
        # extractor); with finetune.train_vision_tower the tower joins the
        # trainable tree as params["vision_tower"] and trains end-to-end like
        # the reference (DeepSpeed trains the full Qwen2.5-VL, launch.py:63-69)
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self.train_vision = bool(
            cfg.finetune.get("train_vision_tower", False)
        ) and vision_params is not None
        if self.train_vision:
            self.params = dict(self.params)
            self.params["vision_tower"] = vision_params
            self.vision_params = None  # lives in the trainable tree now

        self.samples_per_step = int(cfg.finetune.samples_per_step)
        self.weight_update_interval = int(cfg.finetune.get("weight_update_interval", 1))
        self.max_train_steps = int(cfg.finetune.get("max_train_steps", 100_000))
        self.max_lag = cfg.finetune.get("max_lag")

        rl_cfg_dict = {
            k: v for k, v in cfg.finetune.rl.items() if k in RLLossConfig.__dataclass_fields__
        }
        rl_cfg_dict.setdefault("batch_size", self.samples_per_step)
        rl_cfg_dict["batch_size"] = int(rl_cfg_dict["batch_size"]) or self.samples_per_step
        self.loss_cfg = RLLossConfig(**rl_cfg_dict)

        # LoRA: the trainable tree becomes the adapter factors; base weights
        # freeze (reference finetune/lora.py via peft — here a merge-based
        # functional design, train/lora.py)
        from .lora import init_lora_params, lora_config_from, merge_lora

        self.lora_cfg = lora_config_from(cfg.finetune)
        self.frozen_params: dict = {}
        if self.lora_cfg.enabled and self.train_vision:
            raise ValueError(
                "train_vision_tower is incompatible with LoRA (the tower is "
                "not a low-rank-adaptable matmul set in this design)"
            )
        if self.lora_cfg.enabled:
            self.frozen_params = self.params
            self.params = init_lora_params(
                jax.random.key(int(cfg.get("seed", 0)) + 7),
                self.frozen_params,
                self.lora_cfg,
            )
            self._merge = jax.jit(
                lambda frozen, adapters: merge_lora(frozen, adapters, self.lora_cfg)
            )

        # multi-chip: shard params/optimizer over a (dp, cp, tp) mesh; the
        # jitted passes below need no changes — GSPMD propagates the input
        # shardings and inserts the collectives (SURVEY.md §2.5)
        par = cfg.get("parallel", None)
        self.mesh = None
        self.dp = 1
        if par is not None:
            dp = int(par.get("dp", 1))
            cp = int(par.get("cp", 1))
            tp = int(par.get("tp", 1))
            if dp * cp * tp > 1 and self.train_vision:
                raise ValueError(
                    "train_vision_tower requires an unsharded trainer "
                    "(VLM rows train at batch 1, reference launch.py:63-69)"
                )
            if dp * cp * tp > 1:
                from jax.sharding import NamedSharding, PartitionSpec

                from ..parallel import make_mesh, shard_batch, shard_params

                if jax.process_count() > 1:
                    # multi-host: dp spans hosts over DCN, cp×tp stays on
                    # each host's ICI-connected chips (parallel/multihost.py)
                    from ..parallel.multihost import make_multihost_mesh

                    self.mesh = make_multihost_mesh(tp=tp, cp=cp)
                    if dp * cp * tp != jax.device_count():
                        raise ValueError(
                            f"parallel dp*cp*tp={dp * cp * tp} must equal the "
                            f"global device count {jax.device_count()} on multi-host"
                        )
                else:
                    self.mesh = make_mesh(n_devices=dp * cp * tp, tp=tp, cp=cp)
                self.dp = dp
                if dp % jax.process_count() != 0:
                    raise ValueError(
                        f"parallel.dp={dp} must be a multiple of the process "
                        f"count {jax.process_count()} (each rank contributes "
                        "dp/process_count rows per pass)"
                    )
                if self.lora_cfg.enabled:
                    # adapters are tiny: replicate; shard the frozen base
                    rep = NamedSharding(self.mesh, PartitionSpec())
                    self.params = jax.tree.map(
                        lambda x: jax.device_put(x, rep), self.params
                    )
                    self.frozen_params = shard_params(self.frozen_params, self.mesh)
                else:
                    self.params = shard_params(self.params, self.mesh)
                self._shard_batch = shard_batch

        self.optimizer, self.lr_schedule = make_optimizer(cfg)
        self.opt_state = jax.jit(self.optimizer.init)(self.params)
        self._grad_accum = None
        self._row_buffer: list[TrainerBatch] = []
        # global (cross-rank) sample count of the most recent gradient pass
        self.last_pass_samples = 0

        self.input_spec = SingleStreamSpec(
            exp_path=exp_path, topic=input_topic, partition=rank
        )
        self.save_checkpoint_steps = int(cfg.finetune.get("save_checkpoint_steps", 0))
        self.checkpoint_dir = Path(exp_path) / "finetune"

        # gradient_checkpointing: true → "auto" (selective at long L),
        # false → off, or an explicit policy string "full" | "mlp"
        remat_cfg = cfg.finetune.get("gradient_checkpointing", True)
        attn_impl: Any = str(cfg.finetune.get("attn_impl", "auto"))
        cp = int(cfg.get("parallel", {}).get("cp", 1)) if cfg.get("parallel") else 1
        seq_length = int(cfg.finetune.get("seq_length", 1024))
        if attn_impl == "auto":
            # cp > 1: the sequence axis is sharded — use the shard_map
            # context-parallel path (O(L/cp) attention memory; the XLA path
            # materializes [L, L] scores and cannot train 32k rows).
            # Single-device long rows on TPU: the GQA-folded Pallas kernel
            # (ops/gqa_attention.py) — folds G q-heads per kv head into the
            # matmul rows, keeps the flash update VMEM-resident, and skips
            # segment-disjoint blocks, which the packed batches are mostly
            # made of. Measured on v5e (0.5B, bench_train_step): L=16384
            # step 1999 -> 968 ms (MFU 15.7% -> 32.5%), L=4096 247 -> 202 ms
            # (31.8% -> 39.0%) vs the pure-JAX blockwise kernel. Non-TPU
            # backends (CPU tests) keep blockwise — the Pallas kernel needs
            # interpret mode there. Short rows stay on the XLA path.
            import jax as _jax

            # platform of the actual device, not the backend-plugin name
            # (the tunneled dev chip registers as plugin "axon" but its
            # devices report platform "tpu"; unknown non-TPU platforms must
            # not select a Mosaic kernel)
            on_tpu = _jax.devices()[0].platform == "tpu"
            if cp > 1:
                attn_impl = "cp"
            elif seq_length >= 2048:
                attn_impl = "gqa" if on_tpu else "blockwise"
            else:
                attn_impl = "xla"
        if attn_impl == "cp":
            if self.mesh is None or cp <= 1:
                attn_impl = "xla"
            else:
                from ..parallel.cp_attention import make_cp_attention

                attn_impl = make_cp_attention(
                    self.mesh,
                    num_kv_heads=model_cfg.num_kv_heads,
                    block_kv=int(cfg.finetune.get("cp_block_kv", 1024)),
                    # "gqa" opts the cp path into the Pallas kernel (see
                    # make_cp_attention docstring for why it isn't default)
                    impl=str(cfg.finetune.get("cp_attn_impl", "blockwise")),
                )
        max_step = self.max_train_steps
        # single-device long rows: never materialize the [L, V] fp32 logits
        # (10 GB at 16k x 152k vocab — over v5e HBM); under CP the L axis is
        # GSPMD-sharded and each device already holds only L/cp of the logits
        logits_chunk = 2048 if (cp == 1 and seq_length >= 8192) else None
        # remat policy: full per-layer remat by default. "mlp" (selective:
        # MLP recomputed, attention residuals kept) is OPT-IN only — at 16k
        # single-chip with fp32 adam moments the attention residuals push
        # past v5e HBM (measured ResourceExhausted); where HBM allows it,
        # it skips the attention re-forward that is ~70% of the long-L step
        # (scripts/probe_16k.py profile)
        if remat_cfg in (True, "auto", "full", "true"):
            remat: Any = True
        elif remat_cfg == "mlp":
            remat = "mlp"
        else:
            remat = False

        lora_cfg = self.lora_cfg

        def grad_pass(params, frozen, batch, counts, step, sentinel):
            def loss_fn(p):
                full = merge_lora(frozen, p, lora_cfg) if lora_cfg.enabled else p
                return rl_loss(
                    full, model_cfg, self.loss_cfg, batch, step, max_step, sentinel,
                    remat=remat, attn_impl=attn_impl, logits_chunk=logits_chunk,
                )
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # global sample/token counts ride the SAME device reduction and
            # fetch as the other metrics — no per-pass host allgather barrier
            # (the reference piggybacks counts on device collectives,
            # finetune_loop.py:709-713; round-2 weak #8)
            metrics = dict(metrics)
            metrics["global_samples"] = counts[:, 0].sum()
            metrics["global_tokens"] = counts[:, 1].sum()
            return grads, loss, metrics

        self._grad_pass = jax.jit(grad_pass)

        train_vision = self.train_vision

        def grad_pass_vlm(
            params, frozen, vparams, batch, vin, image_mask, step, sentinel
        ):
            from ..models.vision import vision_forward

            def loss_fn(p):
                full = merge_lora(frozen, p, lora_cfg) if lora_cfg.enabled else p
                # trainable tower: encode INSIDE the differentiated function
                # so pixel gradients flow into p["vision_tower"]; frozen
                # tower: vparams is not a grad argument, so the same code
                # yields a pure feature extractor
                tower = full["vision_tower"] if train_vision else vparams
                embeds = vision_forward(
                    tower, self.vision_cfg, vin["patches"], vin["hw"],
                    vin["win_seg"], vin["full_seg"], vin["inv_perm"],
                )
                return rl_loss(
                    full, model_cfg, self.loss_cfg, batch, step, max_step, sentinel,
                    remat=remat, attn_impl="xla",  # VLM rows are unpacked [1, L]
                    image_embeds=embeds[None], image_mask=image_mask,
                )
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, loss, metrics

        self._grad_pass_vlm = jax.jit(grad_pass_vlm)
        self._accumulate = jax.jit(
            lambda acc, grads: jax.tree.map(jnp.add, acc, grads)
        )

        def apply_update(params, opt_state, grads):
            gnorm = optax.global_norm(grads)
            updates, new_opt_state = self.optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, gnorm

        self._apply_update = jax.jit(apply_update, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def publish(self, writer: StreamWriter, msg) -> None:
        # in a multi-rank trainer world only rank 0 speaks on the control
        # plane (versions are global-consistent by construction)
        if self.rank == 0:
            writer.write(msg.model_dump())

    # -- checkpoint / resume (reference checkpoints.py:225-279,331-366) ----
    def save_checkpoint(self, tokenizer=None) -> None:
        from .checkpoints import export_hf, save_training_state

        if jax.process_count() > 1:
            # multi-process world: de-shard to host numpy on every rank (a
            # collective), write from rank 0 only — single-rank orbax would
            # deadlock on its internal barriers (checkpoints.py)
            from jax.experimental import multihost_utils

            from .checkpoints import save_training_state_host

            params = multihost_utils.process_allgather(self.params, tiled=True)
            opt_state = multihost_utils.process_allgather(self.opt_state, tiled=True)
            if self.rank != 0:
                return
            save_training_state_host(
                self.checkpoint_dir, params, opt_state,
                dataclasses.asdict(self.metrics),
            )
            frozen = (
                multihost_utils.process_allgather(self.frozen_params, tiled=True)
                if self.lora_cfg.enabled
                else {}
            )
            export_params = (
                self._merge(frozen, params) if self.lora_cfg.enabled else params
            )
            export_params = {
                k: v for k, v in export_params.items() if k != "value_head"
            }
            export_hf(self.checkpoint_dir, export_params, self.model_cfg,
                      tokenizer, vision_cfg=self.vision_cfg)
            logger.info(
                "Saved checkpoint at step %d (%d samples)",
                self.metrics.completed_steps,
                self.metrics.samples,
            )
            return
        save_training_state(
            self.checkpoint_dir,
            self.params,
            self.opt_state,
            dataclasses.asdict(self.metrics),
        )
        export_params = (
            self._merge(self.frozen_params, self.params)
            if self.lora_cfg.enabled
            else self.params
        )
        export_params = {k: v for k, v in export_params.items() if k != "value_head"}
        export_hf(self.checkpoint_dir, export_params, self.model_cfg,
                  tokenizer, vision_cfg=self.vision_cfg)
        logger.info(
            "Saved checkpoint at step %d (%d samples)",
            self.metrics.completed_steps,
            self.metrics.samples,
        )

    def try_resume(self) -> bool:
        from .checkpoints import load_training_state

        restored = load_training_state(self.checkpoint_dir, self.params, self.opt_state)
        if restored is None:
            return False
        self.params, self.opt_state, metrics = restored
        for key, value in metrics.items():
            if hasattr(self.metrics, key):
                setattr(self.metrics, key, value)
        logger.info(
            "Resumed from checkpoint: step %d, %d samples",
            self.metrics.completed_steps,
            self.metrics.samples,
        )
        return True

    def train_pass(self, batch: TrainerBatch) -> dict:
        """One micro-batch gradient pass. With dp > 1, rows buffer until this
        process's share (dp / process_count) of the global [dp, L] batch is
        available; the stacked batch runs as a single sharded pass (a
        sentinel row's labels are all masked, so it contributes exactly zero
        loss). Sample/token counts are GLOBAL (allgathered across ranks) so
        every rank publishes the same weight version. Returns host metrics
        ({} while buffering)."""
        if batch.visual is not None:
            return self._vlm_pass(batch)
        self._row_buffer.append(batch)
        dp_local = max(1, self.dp // jax.process_count())
        if len(self._row_buffer) < dp_local:
            return {}
        rows, self._row_buffer = self._row_buffer, []
        stacked = {
            name: np.concatenate([r.arrays()[name] for r in rows], axis=0)
            for name in rows[0].arrays()
        }
        if self.mesh is not None:
            with self.mesh:
                arrays = self._shard_batch(stacked, self.mesh)
        else:
            arrays = {k: jnp.asarray(v) for k, v in stacked.items()}
        all_sentinel = all(r.sentinel for r in rows)
        sentinel = jnp.asarray(1.0 if all_sentinel else 0.0)
        step = jnp.asarray(self.metrics.completed_steps, jnp.float32)
        # per-row (samples, tokens) — each process contributes its rows as
        # local shards; the jitted pass reduces them on device
        local_counts = np.asarray(
            [
                [
                    0 if r.sentinel else r.num_sequences,
                    0 if r.sentinel else r.length - r.padding,
                ]
                for r in rows
            ],
            np.float32,
        )
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            counts = jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, PartitionSpec("dp", None)),
                jnp.asarray(local_counts),
            )
        else:
            counts = jnp.asarray(local_counts)
        grads, loss, metrics = self._grad_pass(
            self.params, self.frozen_params, arrays, counts, step, sentinel
        )
        if self._grad_accum is None:
            self._grad_accum = grads
        else:
            self._grad_accum = self._accumulate(self._grad_accum, grads)
        self.metrics.passes += 1
        host_metrics = {k: float(v) for k, v in metrics.items()}
        global_samples = int(round(host_metrics.pop("global_samples")))
        global_tokens = int(round(host_metrics.pop("global_tokens")))
        self.metrics.samples += global_samples
        self.metrics.tokens += global_tokens
        self.last_pass_samples = global_samples
        self.metrics.train_loss = float(loss)
        return host_metrics

    def _vlm_pass(self, batch: TrainerBatch) -> dict:
        """Gradient pass for one multimodal [1, L] row: encode pixels with
        the frozen vision tower (patch-bucketed — no recompiles across image
        sizes), splice at placeholder positions, mrope position rows."""
        from ..models.vision import prepare_vision_inputs

        if self.vision_cfg is None or (
            self.vision_params is None and not self.train_vision
        ):
            raise ValueError("multimodal batch but trainer has no vision tower")
        if self.dp > 1 or jax.process_count() > 1:
            raise ValueError(
                "VLM training currently requires dp=1 single-process "
                "(the reference trains chartqa at batch 1, launch.py:63-69)"
            )
        vin_np = prepare_vision_inputs(
            batch.visual["pixel_values"],
            batch.visual["image_grid_thw"],
            self.vision_cfg,
        )
        vin_np.pop("n_tokens")
        arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
        arrays["position_ids"] = jnp.asarray(
            batch.visual["mrope_position_ids"]
        )[:, None, :]  # [3, 1, L]
        image_mask = jnp.asarray(
            batch.input_ids == int(self.model_cfg.image_token_id)
        )
        step = jnp.asarray(self.metrics.completed_steps, jnp.float32)
        grads, loss, metrics = self._grad_pass_vlm(
            self.params,
            self.frozen_params,
            {} if self.train_vision else self.vision_params,
            arrays,
            {k: jnp.asarray(v) for k, v in vin_np.items()},
            image_mask,
            step,
            jnp.asarray(1.0 if batch.sentinel else 0.0),
        )
        if self._grad_accum is None:
            self._grad_accum = grads
        else:
            self._grad_accum = self._accumulate(self._grad_accum, grads)
        self.metrics.passes += 1
        self.metrics.samples += batch.num_sequences
        self.metrics.tokens += batch.length - batch.padding
        self.last_pass_samples = batch.num_sequences
        self.metrics.train_loss = float(loss)
        return {k: float(v) for k, v in metrics.items()}

    def optimizer_step(self) -> None:
        assert self._grad_accum is not None
        self.params, self.opt_state, gnorm = self._apply_update(
            self.params, self.opt_state, self._grad_accum
        )
        self._grad_accum = None
        self.metrics.grad_norm = float(gnorm)
        self.metrics.lr = float(self.lr_schedule(self.metrics.completed_steps))
        self.metrics.completed_steps += 1

    def maybe_push_weights(self, writer: StreamWriter, force: bool = False) -> bool:
        version = self.metrics.samples
        if (
            force
            or version - self.metrics.last_broadcasted_version
            >= self.weight_update_interval
        ):
            if self.weight_update_cb is not None:
                push = (
                    self._merge(self.frozen_params, self.params)
                    if self.lora_cfg.enabled
                    else self.params
                )
                self.weight_update_cb(push, version)
            self.publish(writer, WeightUpdateSuccess(version=version))
            self.metrics.last_broadcasted_version = version
            return True
        return False

    def run(self, max_steps: int | None = None) -> TrainingMetrics:
        """Consume the training_data stream until ``max_steps`` optimizer
        steps (or cfg max_train_steps)."""
        target_steps = min(
            self.max_train_steps, max_steps if max_steps is not None else self.max_train_steps
        )
        from ..utils.memory_debug import create_memory_debugger, create_step_profiler
        from ..utils.metrics_logger import MetricsLogger

        mlog = MetricsLogger(self.exp_path, f"trainer_{self.rank}")
        memdbg = create_memory_debugger(self.cfg, self.exp_path, self.rank)
        profiler = create_step_profiler(self.cfg, self.exp_path)
        reader = StreamReader(self.input_spec, poll_interval=0.01)
        writer = StreamWriter(
            SingleStreamSpec(exp_path=self.exp_path, topic="weight_update_request")
        )
        # prefetch: a loader thread tails the stream and decodes messages
        # into TrainerBatch off the step loop, overlapping host decode/IO
        # with device compute (reference finetune_loop.py:92-134 loader
        # thread + Queue). Bounded queue: backpressure stays intact.
        import queue as _queue

        prefetch_q: _queue.Queue = _queue.Queue(maxsize=4)
        prefetch_stop = threading.Event()

        def _loader() -> None:
            while not prefetch_stop.is_set():
                got = False
                for msg in reader.read_available(max_messages=8):
                    got = True
                    b = TrainerBatch.from_msg(msg)
                    while not prefetch_stop.is_set():
                        try:
                            prefetch_q.put(b, timeout=0.25)
                            break
                        except _queue.Full:
                            continue
                if not got:
                    time.sleep(0.005)

        loader_thread = threading.Thread(
            target=_loader, name=f"trainer-loader-{self.rank}", daemon=True
        )
        if not bool(self.cfg.get("force_restart", False)):
            self.try_resume()
        # initial broadcast so actors can start and resync after resume
        # (reference finetune_loop.py:462-490)
        self.maybe_push_weights(writer, force=True)
        self.publish(writer, SamplesProcessed(samples=self.metrics.samples))
        samples_this_step = 0
        step_metric_sums: dict[str, float] = {}
        step_lag_min, step_lag_max = float("inf"), -1
        t_start = time.monotonic()
        t_step = time.monotonic()
        loader_thread.start()
        try:
            while self.metrics.completed_steps < target_steps:
                t_wait = time.monotonic()
                try:
                    batch = prefetch_q.get(timeout=0.25)
                except _queue.Empty:
                    self.metrics.time_waiting_for_data += time.monotonic() - t_wait
                    continue
                self.metrics.time_waiting_for_data += time.monotonic() - t_wait
                if not batch.sentinel:
                    # training-time staleness: trained-samples counter vs the
                    # version the batch's samples were GENERATED under (the
                    # reference's lag min/max per batch, finetune_loop.py:680-690)
                    lag = self.metrics.samples - batch.model_version
                    step_lag_min = min(step_lag_min, lag)
                    step_lag_max = max(step_lag_max, lag)
                    if self.max_lag is not None and lag > int(self.max_lag):
                        self.metrics.samples_too_old_to_train += batch.num_sequences
                memdbg.snapshot("before_train_pass", step=self.metrics.completed_steps)
                pass_metrics = self.train_pass(batch)
                memdbg.snapshot("after_train_pass", step=self.metrics.completed_steps)
                for key, value in pass_metrics.items():
                    step_metric_sums[key] = step_metric_sums.get(key, 0.0) + value
                if pass_metrics:  # a pass ran (not dp-row buffering)
                    samples_this_step += self.last_pass_samples
                self.publish(writer, SamplesProcessed(samples=self.metrics.samples))
                if samples_this_step >= self.samples_per_step:
                    self.optimizer_step()
                    memdbg.snapshot("after_optimizer_step", step=self.metrics.completed_steps)
                    profiler.on_step(self.metrics.completed_steps)
                    # ESS from importance-ratio sums (reference
                    # finetune_loop.py:908-922) + throughput counters
                    ratio_sum = step_metric_sums.get("ratio_new_old_sum", 0.0)
                    ratio_sq = step_metric_sums.get("ratio_new_old_squared_sum", 0.0)
                    n_tok = step_metric_sums.get("num_output_tokens_sum", 0.0)
                    elapsed_step = time.monotonic() - t_step
                    t_step = time.monotonic()
                    mlog.log(
                        {
                            **{f"rl/{k}": v for k, v in step_metric_sums.items()},
                            "stats/ess": (ratio_sum**2 / ratio_sq) if ratio_sq else 0.0,
                            "stats/ess_fraction": (
                                ratio_sum**2 / (ratio_sq * n_tok) if ratio_sq and n_tok else 0.0
                            ),
                            "throughput/tokens_per_step": samples_this_step,
                            "throughput/sec_per_step": elapsed_step,
                            "throughput/tokens_per_sec": (
                                step_metric_sums.get("input_size", n_tok) / elapsed_step
                                if elapsed_step > 0
                                else 0.0
                            ),
                            "completed_steps": self.metrics.completed_steps,
                            "samples": self.metrics.samples,
                            "lr": self.metrics.lr,
                            "grad_norm": self.metrics.grad_norm,
                            "loss": step_metric_sums.get("loss", 0.0),
                            "samples_too_old_to_train": self.metrics.samples_too_old_to_train,
                            "time_waiting_for_data": self.metrics.time_waiting_for_data,
                            **(
                                {"lag/min": step_lag_min, "lag/max": step_lag_max}
                                if step_lag_max >= 0
                                else {}
                            ),
                        },
                        step=self.metrics.completed_steps,
                    )
                    step_metric_sums = {}
                    step_lag_min, step_lag_max = float("inf"), -1
                    samples_this_step = 0
                    self.maybe_push_weights(writer)
                    memdbg.snapshot("after_weight_push", step=self.metrics.completed_steps)
                    if (
                        self.save_checkpoint_steps
                        and self.metrics.completed_steps % self.save_checkpoint_steps == 0
                    ):
                        self.save_checkpoint()
                        memdbg.snapshot("after_save", step=self.metrics.completed_steps)
            elapsed = time.monotonic() - t_start
            logger.info(
                "Trainer done: %d steps, %d samples, %d tokens in %.1fs (%.0f tok/s)",
                self.metrics.completed_steps,
                self.metrics.samples,
                self.metrics.tokens,
                elapsed,
                self.metrics.tokens / max(elapsed, 1e-9),
            )
            self.maybe_push_weights(writer, force=True)
            if self.save_checkpoint_steps:
                self.save_checkpoint()
            self.publish(writer, TrainingDone())
        finally:
            prefetch_stop.set()
            loader_thread.join(timeout=5)
            profiler.stop()
            memdbg.close()
            reader.stop()
            writer.close()
            mlog.close()
        return self.metrics
