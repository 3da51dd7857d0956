"""TPU-resident continuous-batching inference engine.

This replaces the reference's vLLM server (SURVEY.md §2.4): slot-based
continuous batching under XLA *static shapes* — a fixed number of decode
slots S, per-slot contiguous KV cache of capacity T, prefill bucketed to a
few padded lengths. One compiled decode program serves every step; one
compiled prefill program per bucket.

Key differences from the reference design, by construction:

- **In-flight weight updates never pause decoding** (the reference pauses
  the vLLM engine per update, vllm1.py:155-182): ``update_params`` swaps the
  param pytree pointer between decode steps; requests in flight continue on
  the new weights, matching PipelineRL's in-flight-update semantics.
- **Token-native**: prompts arrive as token ids and completions leave as
  token ids + per-token processed logprobs, so the exact-tokenization
  round-trip the reference reconstructs from HTTP text
  (async_llm.py:215-346, ``token_id:1271`` parsing in llm.py:387-404) is
  exact by construction.

The engine runs its scheduling loop on a dedicated thread; ``submit``
returns a ``concurrent.futures.Future`` and is thread-safe.
"""

from __future__ import annotations

import logging
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import ModelConfig, decode_step_staged, forward
from ..ops.sampling import sample_fast, sample_masked

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class EngineConfig:
    max_slots: int = 8
    max_len: int = 1024  # per-slot KV capacity (prompt + completion)
    prefill_buckets: tuple[int, ...] = (64, 128, 256, 512, 1024)
    seed: int = 0
    cache_dtype: Any = jnp.bfloat16
    # decode steps per compiled window (lax.scan on device). The host syncs
    # tokens once per window, so dispatch/tunnel latency is amortized N×;
    # a slot finishing mid-window wastes ≤ N-1 speculative tokens.
    decode_window: int = 8
    # number of decode windows kept in flight before the oldest is synced;
    # depth 2 overlaps host/tunnel latency with device compute (the device
    # carry already holds the sampled tokens, so a future window needs no
    # host input). Stop detection lags by (depth-1) windows of speculation.
    window_pipeline_depth: int = 2
    # budget-aware speculation control: when the MEDIAN remaining token
    # budget across active slots fits a smaller compiled window (W/2, W/4),
    # dispatch that size instead. Measured OFF-by-default (v5e, 0.5B, S=64
    # W=32 jittered continuous batching, scripts/probe_decode.py): the
    # policy cost 18% useful throughput (8.6k vs 10.6k tok/s) while leaving
    # waste unchanged (36%) — scattered per-slot finishes keep the median
    # high, so it only fires in the tail where shrinking windows breaks the
    # host-sync amortization. Shrinking the FIXED window is the effective
    # waste control: W=16 measured waste 23% vs 37% at W=32.
    adaptive_window: bool = False
    # attention implementation for prefill/score forwards: "xla" | "flash"
    attn_impl: str = "xla"
    # decode-window cache attention: "auto" | "xla" | "ragged" (Pallas
    # kernel). Measured on v5e: the batched XLA path wins at short context
    # (3.9 vs 6.1 ms/step @ ctx<=512, BENCH r02) AND at long ragged context
    # (2.98 vs 6.11 ms/step @ 1-3.5k mixed lengths, max_len 4096, BENCH
    # r03) — the ragged kernel's per-slot grid with G=7-row matmuls
    # underuses the MXU more than its block skipping saves. "auto" therefore
    # resolves to xla; "ragged" stays available for explicit use.
    decode_attn_impl: str = "auto"
    # same-bucket admissions prefill together (batch sizes 8/4/2/1 up to
    # this cap); batch-1 prefill is weight-read-bound, so this matters
    max_prefill_batch: int = 8
    # VLM: merged-visual-token bucket sizes for the vision tower (pads join
    # their own attention segments; avoids a recompile per image size)
    vision_unit_buckets: tuple[int, ...] = (64, 256, 1024, 4096)
    # tensor parallelism: shard params (head/ffn dims) and KV caches (kv-head
    # dim) over a tp-axis mesh; GSPMD inserts the collectives in the existing
    # jitted programs (the reference's vLLM tensor-parallel-size,
    # conf/base.yaml:70)
    tp: int = 1
    # pipeline parallelism: shard the stacked layer dim of params and KV
    # caches over a pp mesh axis — weights and cache memory spread across
    # stages, GSPMD moves activations stage-to-stage inside the layer scan
    # (the reference's vLLM pipeline-parallel-size, conf/base.yaml:71)
    pp: int = 1
    # device PRNG for sampling: "rbg" (TPU-native generator — far cheaper
    # per step than threefry's bit arithmetic at [S, V] Gumbel draws) or
    # "threefry2x32" (JAX default, bit-reproducible across backends)
    rng_impl: str = "rbg"
    # host-side weight pushes up to this size are double-buffered on device
    # (atomic pointer swap); larger pushes (7B bf16 ~15 GB on a 16 GB v5e
    # cannot hold two copies) stream in bounded chunks spliced into the live
    # tree (see _transfer_loop)
    push_double_buffer_max_bytes: int = 6 << 30
    # chunk size for pushes beyond the double-buffer budget: each chunk is
    # one H2D transfer + one on-device carve; peak extra HBM ~= 2 chunks
    push_stream_chunk_bytes: int = 256 << 20
    # paced-transfer granularity and decode-utilization floor during a push.
    # On hardware where H2D transfers serialize with the execution stream
    # (the tunneled dev chip: 1.1 GB/s idle vs 28 MB/s under continuous
    # decode — round-4 probes), each chunk transfers in a brief engine-
    # granted gap (queue drained so the put runs at full link speed), and
    # the transfer thread then sleeps so decode keeps >= the target duty.
    # Per-update decode loss equals the serial transfer time either way;
    # pacing amortizes it instead of letting the push starve for ~40x
    # longer. Target <= 0 disables pacing (direct puts). 128 MB chunks
    # engage the 4-way parallel sub-stream put (see _gated_put) — ~2x on
    # per-stream-throttled links — while a single gated decode stall stays
    # ~13 ms on production PCIe DMA.
    push_pace_chunk_bytes: int = 128 << 20
    push_utilization_target: float = 0.9
    # bounded staleness: pace at the duty target only until a push has been
    # in flight this long, then finish at full link speed (duty degrades
    # instead of staleness growing without bound — on a healthy link the
    # paced span never reaches this, on a degraded one the engine still
    # converges to the new weights). <= 0 disables the deadline.
    push_max_span_s: float = 120.0
    # KV layout: "slab" reserves a contiguous [S, max_len] cache per slot;
    # "paged" allocates fixed-size pages from a shared pool (the vLLM paged
    # attention role, SURVEY.md §2.4) — HBM holds only tokens that exist,
    # GRPO forks share the prompt's full pages, and admission reserves
    # prompt+max_tokens pages up front (no mid-flight OOM / preemption).
    # "auto" currently resolves to SLAB at every max_len: slab remains the
    # simplest fastest path for the shipped RL configs, and its parked-slot
    # prefix reuse measured faster than the paged cache on the multi-turn
    # workload. Paged decode is close behind since the window-amortized
    # contiguous gather (round-5 probe: 0.88x slab tok/s at 0.5x the KV
    # bytes with 2.1x the concurrent sequences; was 0.22x with the per-step
    # table gather) — opt in with kv_layout=paged when long-tail capacity
    # or page-shared forks matter more than the last 12% of tok/s. See the
    # auto-resolution comment in __init__.
    kv_layout: str = "auto"
    kv_block_size: int = 128  # tokens per page
    # cross-request prefix reuse — the role vLLM's prefix caching plays for
    # the reference (SURVEY.md §2.4). Two implementations by layout:
    # - paged: finished transcripts' full pages are kept in a hash-keyed
    #   LRU cache; a later request extending them reattaches the pages and
    #   prefills only the tail;
    # - slab (the default layout): finished slots are PARKED in place —
    #   the slot keeps its KV rows, a later request whose prompt extends
    #   the parked transcript resumes the same slot and prefills only the
    #   tail (forward_extend against the slab prefix). Parked slots are
    #   evicted LRU whenever admission needs their capacity, so parking
    #   never reduces peak concurrency.
    prefix_cache: bool = True
    # minimum reusable prefix length for a slab park hit — shorter prefixes
    # cost more in extra compile buckets than the prefill they save
    slab_prefix_min_tokens: int = 32
    # pool size in pages; None sizes it to slab parity (S × ⌈max_len/page⌉) —
    # set smaller to cap KV memory or larger to admit more long-tail work
    kv_pool_blocks: int | None = None


@dataclass
class SamplingParams:
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    max_tokens: int = 256
    stop_token_ids: tuple[int, ...] = ()

    @property
    def needs_masking(self) -> bool:
        return self.top_p < 1.0 or self.top_k > 0


@dataclass
class GenRequest:
    prompt_ids: list[int]
    params: SamplingParams
    request_id: str = ""
    # VLM: {"pixel_values": np [N, patch_dim], "image_grid_thw": np [n, 3]};
    # prompt_ids must contain one image-placeholder token per merged visual
    # token (the HF processor convention the reference feeds vLLM)
    visual: dict | None = None
    # streaming: called from the ENGINE THREAD as tokens materialize —
    # cb(token_ids: list[int], logprobs: list[float], finish: str | None).
    # Tokens arrive once per decode window (not per step); the terminal call
    # has finish set (and may carry no tokens). Must be fast and non-blocking
    # (the server bridges it onto the asyncio loop). The reference gets SSE
    # streaming from vLLM's OpenAI server (SURVEY.md §2.4).
    stream_callback: Any = None


@dataclass
class GenResult:
    token_ids: list[int]  # completion tokens (stop token included)
    logprobs: list[float]  # processed logprob per completion token
    finish_reason: str  # "stop" | "length" | "abort"
    model_version_start: int = 0
    model_version_end: int = 0
    prompt_tokens: int = 0


@dataclass
class _Slot:
    request: GenRequest
    future: Future
    last_token: int = 0
    token_ids: list[int] = field(default_factory=list)
    logprobs: list[float] = field(default_factory=list)
    version_start: int = 0
    max_new_tokens: int = 0
    # True while the prefill-sampled first token has not yet been delivered
    # (it rides along in the next window's packed output); set False once
    # the token reaches the slot's transcript
    pending_first: bool = True
    # True once a decode window has been DISPATCHED for this occupant: only
    # the first dispatch may override the device token carry with the
    # prefill first_info — later windows chain the device carry (sync lags
    # dispatch by depth-1 windows, so pending_first alone is too stale)
    first_dispatched: bool = False
    # monotonically increasing slot-assignment id: guards pipelined windows
    # against delivering a previous occupant's tokens to a new request
    gen: int = 0
    # stamp of the park entry created for this occupant at early-retire time
    # (slab prefix reuse); lets the finishing window's sync upgrade the
    # parked transcript to the full one iff the entry is still ours
    park_stamp: int = -1


@dataclass
class _Window:
    """A dispatched-but-unsynced decode window."""

    # device int32 [2, N+1, S]: row 0 of axis 1 is the per-slot prefill
    # first-token info (token, bitcast fp32 logprob); rows 1..N are the
    # window's sampled tokens / bitcast logprobs. ONE fetch per window.
    packed: Any
    active: np.ndarray  # [S] snapshot at dispatch
    gens: np.ndarray  # [S] slot generations at dispatch
    pending: list[int]  # slots whose prefill first token rides along
    n_steps: int = 0  # window size (steps) — known at dispatch


class InferenceEngine:
    def __init__(
        self,
        params: dict,
        model_cfg: ModelConfig,
        cfg: EngineConfig,
        eos_token_id: int,
        version: int = 0,
        vision_params: dict | None = None,
        vision_cfg=None,  # models.vision.VisionConfig
    ):
        self.model_cfg = model_cfg
        self.cfg = cfg
        self.eos_token_id = eos_token_id
        self.params = params
        self.version = version
        # vision tower (models/vision.py); visual requests are refused unless
        # present. Frozen by default; when the trainer runs with
        # finetune.train_vision_tower its weight pushes carry a
        # ``vision_tower`` subtree and update_params refreshes it in-flight.
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self._pending_params: tuple[dict, int] | None = None
        self._pending_vision: dict | None = None
        self._params_lock = threading.Lock()
        # host-side (numpy-leaf) pushes are staged onto the device by a
        # dedicated transfer thread; the engine thread only pointer-swaps
        self._transfer_pending: tuple | None = None  # ("tree"|"blob", ...)
        self._transfer_event = threading.Event()
        self._transfer_thread: threading.Thread | None = None
        self._slicer_cache: dict = {}
        self.last_push_timings: dict = {}
        # supersede-starvation guard (round-4 verdict weak #3): a transfer
        # may yield to a newer push at most once in a row; after one yield
        # the next transfer runs to completion even if superseded, so the
        # engine converges to (within one push of) the latest version in
        # <= 2 transfer spans no matter how fast pushes arrive
        self._push_yields = 0
        # liveness telemetry: span of completed pushes vs arrival cadence
        self._push_arrival_prev: float | None = None
        self._push_interval_ema: float | None = None
        self._push_last_span_s: float = 0.0
        self._pushes_received = 0
        self._pushes_completed = 0
        self._pushes_superseded = 0
        # cooperative transfer gate (see EngineConfig.push_pace_chunk_bytes):
        # the transfer thread requests a slot; the scheduling thread drains
        # its in-flight windows, opens the gate, and blocks until the chunk
        # lands — so the H2D put runs against an empty execution queue
        self._transfer_gate_request = threading.Event()
        self._transfer_gate_open = threading.Event()
        self._transfer_chunk_done = threading.Event()
        # wall deadline of the in-flight push's paced phase (push_max_span_s)
        self._push_pace_deadline = float("inf")

        S, T = cfg.max_slots, cfg.max_len
        L = model_cfg.num_layers
        K, Dh = model_cfg.num_kv_heads, model_cfg.head_dim_
        # + window: staged-band merges always stay in bounds (valid tokens
        # never pass position max_len - 1; the tail is speculative scratch)
        T_alloc = T + max(1, cfg.decode_window)
        cache_shape = (L, S, T_alloc, K, Dh)

        layout = cfg.kv_layout
        if layout == "auto":
            # Slab stays the default: it is still the fastest decode path
            # and its parked-slot prefix reuse beats the paged cache on the
            # shipped multi-turn configs. The gap is now small — the
            # window-amortized contiguous gather (see _decode_window_paged_fn)
            # brought paged decode from ~0.22x to ~0.88x slab tok/s while
            # admitting 2.1x the concurrent sequences at 0.5x the KV bytes
            # (round-5 probe; driver-captured numbers land in BENCH_r05
            # `paged_*` keys). Opt in with kv_layout=paged when long-tail
            # capacity / page-shared forks matter more than ~12% tok/s.
            layout = "slab"
        self.paged = layout == "paged"

        self.mesh = None
        if cfg.tp > 1 or cfg.pp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import make_mesh, shard_params

            if L % cfg.pp != 0:
                raise ValueError(f"num_layers {L} not divisible by pp={cfg.pp}")
            self.mesh = make_mesh(n_devices=cfg.tp * cfg.pp, tp=cfg.tp, pp=cfg.pp)
            self.params = shard_params(self.params, self.mesh)
            # KV cache [L, S, T, K, Dh] / page pool [L, NB, BT, K, Dh]:
            # layer dim over pp stages, kv heads over tp (replicated when K
            # doesn't divide)
            cache_spec = P(
                "pp", None, None, "tp" if K % cfg.tp == 0 else None, None
            )
            self._cache_sharding = NamedSharding(self.mesh, cache_spec)

        if self.paged:
            from .block_pool import BlockPool, PrefixCache

            BT = cfg.kv_block_size
            maxb = -(-T_alloc // BT)
            NB = cfg.kv_pool_blocks or S * maxb
            self.block_pool = BlockPool(
                n_blocks=NB, block_size=BT, max_blocks_per_slot=maxb, n_slots=S
            )
            self.k_pool = jnp.zeros((L, NB, BT, K, Dh), cfg.cache_dtype)
            self.v_pool = jnp.zeros((L, NB, BT, K, Dh), cfg.cache_dtype)
            if self.mesh is not None:
                self.k_pool = jax.device_put(self.k_pool, self._cache_sharding)
                self.v_pool = jax.device_put(self.v_pool, self._cache_sharding)
            # per-slot page capacity in tokens (reserved at admission)
            self._slot_capacity = np.zeros(S, np.int64)
            self.prefix_cache = (
                PrefixCache(self.block_pool) if cfg.prefix_cache else None
            )
            self._prefill_extend_fns: dict[tuple[int, int, int], Any] = {}
        else:
            self.k_cache = jnp.zeros(cache_shape, cfg.cache_dtype)
            self.v_cache = jnp.zeros(cache_shape, cfg.cache_dtype)
            if self.mesh is not None:
                self.k_cache = jax.device_put(self.k_cache, self._cache_sharding)
                self.v_cache = jax.device_put(self.v_cache, self._cache_sharding)
            self.prefix_cache = None
            # slab cross-turn reuse: slot -> (transcript ids, lru stamp).
            # Parked slots keep their KV rows; admission resumes them for
            # prompts that extend the transcript, evicts them LRU otherwise.
            self._parked: dict[int, tuple[list[int], int]] = {}
            self._park_stamp = 0
            self._slab_extend_fns: dict[tuple[int, int, int], Any] = {}
            self.slab_prefix_hits = 0
        self.cache_lens = jnp.zeros((S,), jnp.int32)

        self._slots: list[_Slot | None] = [None] * S
        self._queue: deque[tuple[GenRequest, Future]] = deque()
        self._queue_lock = threading.Lock()
        self._rng = jax.random.key(cfg.seed)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._work_event = threading.Event()

        self.buckets = tuple(sorted(b for b in cfg.prefill_buckets if b <= T))
        if not self.buckets or self.buckets[-1] < T:
            self.buckets = self.buckets + (T,)

        # perf counters
        self.total_generated_tokens = 0
        self.total_prefill_tokens = 0
        # prompt tokens served by KV fork instead of recompute (GRPO groups
        # share one prompt; the reference gets this from vLLM prefix caching)
        self.prefill_reused_tokens = 0
        self.decode_steps = 0
        # speculation accounting: tokens decoded past a slot's stop/budget
        # inside a window (wasted), and slot occupancy at dispatch
        self.speculative_wasted_tokens = 0
        self.windows_dispatched = 0
        self.window_slots_dispatched = 0
        self.window_size_counts: dict[int, int] = {}
        self.aborted_requests = 0

        window = max(1, cfg.decode_window)
        self._max_window = window
        # dispatchable window sizes, ascending: W/4, W/2, W (adaptive mode)
        if cfg.adaptive_window and window >= 4:
            self._window_sizes = sorted({max(1, window // 4), max(1, window // 2), window})
        else:
            self._window_sizes = [window]
        decode_attn = cfg.decode_attn_impl
        if decode_attn == "auto":
            # xla wins at every measured context point (see EngineConfig)
            decode_attn = "xla"
        self.decode_attn_impl = decode_attn
        self._decode_attn = decode_attn
        self._decode_fns: dict[tuple[int, bool], Any] = {}
        self._rng_device = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)
        self._windows: deque[_Window] = deque()
        # early-retired occupants: (slot, gen) -> state. A slot whose
        # remaining budget is already covered by dispatched-but-unsynced
        # windows is freed for admission NOW; its results resolve at sync.
        # This removes the depth-driven detection lag for budget-bound
        # finishes — the dominant term of the round-3 23% continuous-stream
        # waste (per finish: ~W*(depth-1) pure-speculation tokens).
        self._retiring: dict[tuple[int, int], _Slot] = {}
        self._gen_counter = 0
        self._abort_ids: set[str] = set()
        self._fork_fns: dict[int, Any] = {}
        # per-slot mrope decode offset (models/mrope.py delta); 0 for text.
        # Host numpy — shipped with each window dispatch (S ints, negligible)
        self._pos_delta = np.zeros(S, np.int32)
        self._prefill_vlm_fns: dict[tuple[int, int], Any] = {}
        self._encode_vision_fns: dict[int, Any] = {}
        # per-slot (first sampled token, bitcast logprob) written by prefill on
        # device; fetched as row 0 of the packed window output (zero extra
        # device->host round trips per admission)
        self.first_info = jnp.zeros((S, 2), jnp.int32)
        # device-resident last sampled token per slot: each decode window
        # starts from the PREVIOUS window's device carry, not the host's
        # (depth-1)-stale view; fresh slots are overridden via pending_mask
        self._device_tokens = jnp.zeros((S,), jnp.int32)
        if self.paged:
            self._prefill = jax.jit(
                partial(_prefill_paged_fn, model_cfg, cfg.attn_impl),
                donate_argnums=(1, 2, 3, 4),
            )
        else:
            self._prefill = jax.jit(
                partial(_prefill_fn, model_cfg, cfg.attn_impl),
                donate_argnums=(1, 2, 3, 4),
            )
        self._score = jax.jit(partial(_score_fn, model_cfg, cfg.attn_impl))

    # ------------------------------------------------------------------
    # public API (thread-safe)
    # ------------------------------------------------------------------
    def submit(self, request: GenRequest) -> Future:
        future: Future = Future()
        prompt_len = len(request.prompt_ids)
        if prompt_len == 0 or prompt_len >= self.cfg.max_len:
            self._notify(request, [], [], "abort")
            future.set_result(
                GenResult([], [], "abort", self.version, self.version, prompt_len)
            )
            return future
        with self._queue_lock:
            self._queue.append((request, future))
        self._work_event.set()
        return future

    def abort(self, request_id: str) -> None:
        """Cancel a request by id (thread-safe). Queued requests resolve
        immediately with finish_reason="abort"; an in-flight slot is freed at
        the next scheduling step, its future resolving with the tokens
        generated so far. The reference gets abort semantics from vLLM
        (async_llm.py:61-168); here a freed slot stops occupying decode
        windows within one step."""
        if not request_id:
            return
        with self._queue_lock:
            self._abort_ids.add(request_id)
        self._work_event.set()

    def _process_aborts(self) -> bool:
        with self._queue_lock:
            if not self._abort_ids:
                return False
            ids = self._abort_ids
            self._abort_ids = set()
            kept: deque = deque()
            queued_hits = []
            for request, future in self._queue:
                if request.request_id in ids:
                    queued_hits.append((request, future))
                else:
                    kept.append((request, future))
            self._queue = kept
        did = False
        for request, future in queued_hits:
            self._notify(request, [], [], "abort")
            future.set_result(
                GenResult([], [], "abort", self.version, self.version,
                          len(request.prompt_ids))
            )
            self.aborted_requests += 1
            did = True
        for i, s in enumerate(self._slots):
            if s is not None and s.request.request_id in ids:
                self._finish_slot(i, "abort")
                self.aborted_requests += 1
                did = True
        return did

    def update_params(self, params: dict, version: int) -> None:
        """Swap weights between decode steps — no pause, no drain. Under TP
        the incoming tree is resharded onto the engine mesh (a device-to-
        device transfer — the reference's NCCL broadcast plane collapses to
        this device_put). A tree carrying a trained ``vision_tower``
        (finetune.train_vision_tower) also refreshes the engine's tower.

        HOST-side trees (numpy leaves, e.g. a deserialized HTTP push) are
        handed to a dedicated TRANSFER THREAD that stages every leaf onto
        the device (H2D DMA overlaps decode compute) and only then publishes
        the complete device-side tree for the engine thread to pointer-swap.
        Round 3 instead chunked device_put calls ON the engine thread, which
        blocked decoding for the duration of every chunk (BENCH_r03 measured
        utilization 0.008 during a 1.26 GB push; BASELINE north star >= 0.9)."""
        vision_tower = None
        if "vision_tower" in params:
            params = dict(params)
            vision_tower = params.pop("vision_tower")
        is_host_tree = all(
            isinstance(leaf, np.ndarray) for leaf in jax.tree.leaves(params)
        )
        if is_host_tree:
            self._enqueue_transfer(("tree", params, version, vision_tower))
            return
        if self.mesh is not None:
            from ..parallel import shard_params

            params = shard_params(params, self.mesh)
        with self._params_lock:
            self._pending_params = (params, version)
            if vision_tower is not None:
                self._pending_vision = vision_tower
        self._work_event.set()

    def update_params_serialized(self, body: bytes) -> int:
        """Swap weights from a PWT3 wire body (weight_transfer.py) — the hot
        cross-process push path. Each dtype group's typed run ships in paced
        transfers and is carved into leaves on-device (per-leaf device_put
        calls measurably collapse ~25x behind in-flight decode windows —
        round-4 probes). Raises ValueError on a tree that does not match the
        engine's parameter spec (a silently swapped wrong-shaped tree would
        crash or corrupt every subsequent forward). Returns the version."""
        from .weight_transfer import parse_push_header

        groups, tensors, version, base = parse_push_header(body)
        self._validate_push_spec(tensors)
        if self.mesh is not None:
            # tp/pp engines reshard through the tree path (shard_params)
            from .weight_transfer import deserialize_params

            params, version = deserialize_params(body)
            params.pop("value_head", None)
            self.update_params(params, version)
            return version
        self._enqueue_transfer(("blob", body, groups, tensors, base, version))
        return version

    def _validate_push_spec(self, tensors: list[dict]) -> None:
        """A pushed tree must match the engine's parameter spec exactly
        (names, shapes, dtypes) — value_head is trainer-only and dropped;
        vision_tower/* must match the engine's vision params when present."""
        from .weight_transfer import flatten_params

        expected = {
            name: (np.asarray(leaf).dtype.name if isinstance(leaf, np.ndarray)
                   else leaf.dtype.name, tuple(leaf.shape))
            for name, leaf in flatten_params(self.params)
        }
        if self.vision_params is not None:
            expected.update(
                {
                    f"vision_tower/{name}": (leaf.dtype.name, tuple(leaf.shape))
                    for name, leaf in flatten_params(self.vision_params)
                }
            )
        got = {
            t["name"]: (t["dtype"], tuple(int(s) for s in t["shape"]))
            for t in tensors
            if t["name"] != "value_head" and not t["name"].startswith("value_head/")
            and not (t["name"].startswith("vision_tower/")
                     and self.vision_params is None)
        }
        if set(got) != set(expected):
            missing = sorted(set(expected) - set(got))[:5]
            extra = sorted(set(got) - set(expected))[:5]
            raise ValueError(
                f"weight push tree mismatch: missing={missing} extra={extra}"
            )
        for name, spec in got.items():
            if spec != expected[name]:
                raise ValueError(
                    f"weight push tensor mismatch for {name!r}: "
                    f"pushed {spec}, engine has {expected[name]}"
                )

    def _should_yield_to_newer(self) -> bool:
        """Mid-transfer supersede policy: yield to a newer queued push at
        most once in a row (then finish unconditionally). Call with
        _params_lock NOT held."""
        with self._params_lock:
            if self._transfer_pending is None:
                return False
            if self._push_yields >= 1:
                return False  # already yielded once: finish this one
            self._push_yields += 1
            self._pushes_superseded += 1
            return True

    def _note_push_complete(self, span_s: float) -> None:
        self._push_yields = 0
        self._push_last_span_s = span_s
        self._pushes_completed += 1

    def push_counters(self) -> dict:
        """Push-plane liveness: completed/superseded counts, last completed
        span, arrival-cadence EMA, and span/interval — a ratio > 1 means the
        paced transfer is slower than the trainer's update cadence and the
        engine is serving correspondingly stale weights (the lag cost the
        round-4 verdict asked to make visible)."""
        interval = self._push_interval_ema
        return {
            "pushes_received": self._pushes_received,
            "pushes_completed": self._pushes_completed,
            "pushes_superseded": self._pushes_superseded,
            "push_last_span_s": round(self._push_last_span_s, 3),
            "push_interval_ema_s": round(interval, 3) if interval else None,
            "push_span_vs_update_interval": (
                round(self._push_last_span_s / interval, 3)
                if interval and interval > 0 else None
            ),
        }

    def _enqueue_transfer(self, job: tuple) -> None:
        now = time.monotonic()
        self._pushes_received += 1
        if self._push_arrival_prev is not None:
            dt = now - self._push_arrival_prev
            self._push_interval_ema = (
                dt if self._push_interval_ema is None
                else 0.7 * self._push_interval_ema + 0.3 * dt
            )
        self._push_arrival_prev = now
        with self._params_lock:
            self._transfer_pending = job
        if self._transfer_thread is None or not self._transfer_thread.is_alive():
            self._transfer_thread = threading.Thread(
                target=self._transfer_loop, daemon=True, name="weight-transfer"
            )
            self._transfer_thread.start()
        self._transfer_event.set()

    def _transfer_loop(self) -> None:
        """Stage host-side weight pushes device-ward off the engine thread.

        Latest push wins: a newer push arriving mid-transfer supersedes the
        one in flight (its staged arrays are dropped).

        Two modes by push size:
        - double-buffer (default): stage the COMPLETE device tree, publish
          via _pending_params; the engine thread's swap is O(pointers) and
          version-atomic.
        - leaf-streamed (pushes too large to double-buffer, e.g. 7B on a
          16 GB v5e): each leaf is staged and swapped into the live tree
          individually, bounding extra HBM to one leaf. Decode steps during
          the stream run on a MIXED old/new tree — still RL-correct, because
          every sampled token's reported logprob comes from the same logits
          that sampled it (the behavior-policy contract), and the request's
          model_version_start/end stamps bracket the transition exactly as
          they do for the atomic swap."""
        while not self._stop.is_set():
            self._transfer_event.wait(timeout=0.1)
            self._transfer_event.clear()
            with self._params_lock:
                job = self._transfer_pending
                self._transfer_pending = None
            if job is None:
                continue
            try:
                if job[0] == "blob":
                    self._transfer_blob(*job[1:])
                else:
                    self._transfer_tree(*job[1:])
            except Exception:  # noqa: BLE001 — a bad push must not kill the thread
                logger.exception("weight push failed; dropped")

    def _transfer_tree(self, params: dict, version: int, vision_tower) -> None:
        """Host-tree push (HF-checkpoint reload / tests): per-leaf staging."""
        nbytes = sum(leaf.nbytes for leaf in jax.tree.leaves(params))
        t0 = time.monotonic()
        if self.mesh is None and nbytes > self.cfg.push_double_buffer_max_bytes:
            if self._stream_leaves_inplace(params, version):
                return
            transfer_s = time.monotonic() - t0
            mode = "streamed"
            with self._params_lock:
                if vision_tower is not None:
                    self._pending_vision = jax.tree.map(jax.device_put, vision_tower)
            self._note_push_complete(transfer_s)
        else:
            if self.mesh is not None:
                from ..parallel import shard_params

                device_tree = shard_params(params, self.mesh)
            else:
                device_tree = jax.tree.map(jax.device_put, params)
            jax.block_until_ready(device_tree)
            transfer_s = time.monotonic() - t0
            mode = "double-buffer"
            with self._params_lock:
                # transfer complete — publish even if a newer push is queued
                # (it follows immediately and wins by version); only an
                # equal-or-newer fully-staged tree beats it
                if (self._pending_params is not None
                        and self._pending_params[1] >= version):
                    return
                self._pending_params = (device_tree, version)
                if vision_tower is not None:
                    self._pending_vision = jax.tree.map(jax.device_put, vision_tower)
            self._note_push_complete(transfer_s)
        self.last_push_timings = {
            "transfer_s": transfer_s,
            "bytes": nbytes,
            "gbps": nbytes / max(transfer_s, 1e-9) / 1e9,
            "mode": mode,
        }
        self._work_event.set()

    def _slicer_for(self, entries: list[tuple]):
        """Jitted group-run→leaves carver, cached per push layout: each
        tensor is a static lax.slice of its dtype group's 1-D typed run +
        reshape — one device pass (~ms), no per-leaf host round-trips and no
        byte bitcasts (a [n, 2] u8 bitcast operand gets layout-padded 64x
        on TPU)."""
        key = tuple(entries)
        fn = self._slicer_cache.get(key)
        if fn is None:

            def slicer(runs: dict):
                out = []
                for name, dtype_name, shape, elem_offset, count in entries:
                    run = runs[dtype_name]
                    arr = jax.lax.slice(run, (elem_offset,), (elem_offset + count,))
                    out.append(arr.reshape(shape))
                return out

            fn = jax.jit(slicer)
            self._slicer_cache[key] = fn
        return fn

    @staticmethod
    def _entry_specs(tensors: list[dict]) -> list[tuple]:
        specs = []
        for t in tensors:
            count = 1
            for s in t["shape"]:
                count *= int(s)
            specs.append(
                (t["name"], t["dtype"], tuple(t["shape"]), int(t["elem_offset"]), count)
            )
        return specs

    def _has_device_work(self) -> bool:
        return bool(self._windows) or any(s is not None for s in self._slots)

    def _gated_put(
        self, host_view: np.ndarray, and_then=None
    ) -> tuple[Any, float]:
        """Stage one chunk through the cooperative gate: ask the scheduling
        thread for a slot (it drains its window queue so the put runs at
        full link speed), transfer, release, then sleep so decode keeps
        >= push_utilization_target duty. Idle engines (or target <= 0) put
        directly. Returns (device array, stall seconds).

        ``and_then(dev, engine_parked)`` consumes the staged array BEFORE
        the gate releases; ``engine_parked`` is True when the scheduling
        thread is provably blocked in _serve_transfer_gate for this chunk,
        which makes donating live param buffers race-free (no dispatch can
        read a just-invalidated leaf)."""
        target = float(self.cfg.push_utilization_target)
        gated = target > 0 and self._has_device_work()
        opened = False
        if gated:
            self._transfer_gate_request.set()
            self._work_event.set()
            # an engine driven manually (tests) may step slowly; fall back
            # to an ungated put rather than deadlocking
            opened = self._transfer_gate_open.wait(timeout=5.0)
        t0 = time.monotonic()
        n = host_view.shape[0]
        if host_view.nbytes > (64 << 20):
            from .weight_transfer import parallel_device_put

            dev = parallel_device_put(host_view)
        else:
            dev = jax.device_put(host_view)
            dev.block_until_ready()
        if and_then is not None:
            and_then(dev, gated and opened)
            dev = None
        stall = time.monotonic() - t0
        if gated:
            self._transfer_gate_request.clear()
            self._transfer_chunk_done.set()
        if logger.isEnabledFor(logging.DEBUG):
            logger.debug(
                "push chunk: %d MB in %.3fs (%.2f GB/s) gated=%s opened=%s",
                host_view.nbytes >> 20, stall,
                host_view.nbytes / max(stall, 1e-9) / 1e9, gated, opened,
            )
        if opened and target < 1.0 and time.monotonic() < self._push_pace_deadline:
            # decode runs during this sleep; duty = decode/(decode+stall).
            # Past push_max_span_s the sleeps stop entirely: duty degrades
            # to the serial floor instead of staleness growing unbounded.
            time.sleep(min(stall * target / (1.0 - target), 30.0))
        return dev, stall

    def _paced_put_span(
        self, body: bytes, dt: np.dtype, base_byte: int,
        elem_lo: int, elem_hi: int, progress_cb=None,
        row_splice=None, align_elems: int = 1, should_stop=None,
    ) -> tuple[Any, float]:
        """Transfer elements [elem_lo, elem_hi) of a dtype run as a series
        of paced sub-puts bounded by push_pace_chunk_bytes each (so no
        single decode stall exceeds one sub-chunk even for a 1 GB embed
        table), concatenated on-device into one 1-D run. Returns
        (device run, total stall seconds). ``progress_cb(bytes, stall_s)``
        fires after EVERY sub-put so a long span (an atomic push moves a
        whole dtype group in one span) stays observable mid-flight.

        ``row_splice(dev_part, rel_elem_offset, parked)`` switches to
        streaming consumption: each sub-put is handed off immediately
        (bounding extra HBM to ONE pace chunk — a 15 GB push cannot afford
        a whole-tensor concat transient next to resident weights) and the
        return value is (None, stall). ``align_elems`` rounds the sub-put
        size down to a multiple (tensor rows must not split)."""
        sub_elems = max(1, int(self.cfg.push_pace_chunk_bytes) // dt.itemsize)
        if align_elems > 1:
            sub_elems = max(align_elems, (sub_elems // align_elems) * align_elems)
        parts = []
        stall_total = 0.0
        lo = elem_lo
        while lo < elem_hi:
            if should_stop is not None and should_stop():
                break  # superseded mid-span: stop paying for discarded bytes
            hi = min(lo + sub_elems, elem_hi)
            view = np.frombuffer(
                body, dt, count=hi - lo, offset=base_byte + lo * dt.itemsize
            )
            if row_splice is not None:
                consumer = partial(row_splice, rel_offset=lo - elem_lo)
                _, stall = self._gated_put(
                    view, and_then=lambda d, parked, c=consumer: c(d, parked)
                )
            else:
                dev, stall = self._gated_put(view)
                parts.append(dev)
            stall_total += stall
            if progress_cb is not None:
                progress_cb((hi - lo) * dt.itemsize, stall)
            lo = hi
        if row_splice is not None:
            return None, stall_total
        if len(parts) == 1:
            return parts[0], stall_total
        run = jnp.concatenate(parts)
        return run, stall_total

    def _transfer_blob(
        self, body: bytes, groups: list[dict], tensors: list[dict],
        base: int, version: int,
    ) -> None:
        """PWT3 push: ship each dtype group's typed run in paced sub-puts
        (see _gated_put / _paced_put_span), carve tensors on-device, and
        either publish one atomic double-buffered tree (pushes within the
        HBM budget) or splice leaves progressively per chunk (mixed-version
        transients are RL-correct -- see _transfer_tree)."""
        from .weight_transfer import _dtype_from_name, flatten_params, unflatten_params

        keep = [t for t in tensors
                if not t["name"].startswith("value_head/")
                and t["name"] != "value_head"]
        specs = self._entry_specs(keep)
        itemsize = {g["dtype"]: _dtype_from_name(g["dtype"]).itemsize for g in groups}
        total = sum(count * itemsize[dt] for _, dt, _, _, count in specs)
        atomic = total <= self.cfg.push_double_buffer_max_bytes
        t0 = time.monotonic()
        if self.cfg.push_max_span_s > 0:
            self._push_pace_deadline = t0 + self.cfg.push_max_span_s
        stall_total = 0.0
        bytes_done = 0
        staged_flat: dict = {}
        vision_flat: dict = {}

        def _progress(nbytes: int, stall: float) -> None:
            # visible after every sub-put — a paced push on a slow link can
            # span minutes; zeros until completion are useless
            nonlocal bytes_done, stall_total
            bytes_done += nbytes
            stall_total += stall
            self.last_push_timings = {
                "transfer_s": time.monotonic() - t0,
                "stall_s": stall_total,
                "bytes_done": bytes_done,
                "bytes": total,
                "in_progress": True,
                "mode": "blob" if atomic else "blob-chunked",
            }
        for g in groups:
            dt = _dtype_from_name(g["dtype"])
            g_specs = [s for s in specs if s[1] == g["dtype"]]
            if not g_specs:
                continue
            if atomic:
                # whole group as one on-device run (paced sub-puts inside)
                chunks = [g_specs]
            else:
                # splice-capable tensor-aligned chunks bounded by the
                # stream budget (peak extra HBM ~= 2 chunks)
                budget_elems = max(
                    int(self.cfg.push_stream_chunk_bytes) // dt.itemsize,
                    max(s[4] for s in g_specs),
                )
                chunks = [[]]
                acc = 0
                for s in g_specs:
                    if chunks[-1] and acc + s[4] > budget_elems:
                        chunks.append([])
                        acc = 0
                    chunks[-1].append(s)
                    acc += s[4]
            for chunk in chunks:
                lo = min(s[3] for s in chunk)
                hi = max(s[3] + s[4] for s in chunk)
                if (
                    not atomic
                    and len(chunk) == 1
                    and (hi - lo) * dt.itemsize
                    > int(self.cfg.push_stream_chunk_bytes)
                ):
                    # a single tensor larger than the stream budget (the 7B
                    # embed/lm_head are ~1.1 GB each): stream it ROW-WISE,
                    # splicing every paced sub-put straight into the live
                    # leaf — a whole-tensor concat transient next to ~15 GB
                    # of resident weights is exactly an OOM (round-5
                    # rehearsal: ResourceExhausted at this spot)
                    if self._stream_rows_inplace(
                        body, dt, base + int(g["byte_offset"]), chunk[0],
                        _progress,
                    ):
                        return  # superseded
                    continue
                run, _ = self._paced_put_span(
                    body, dt, base + int(g["byte_offset"]), lo, hi,
                    progress_cb=_progress,
                )
                rebased = [
                    (name, dtn, shape, off - lo, count)
                    for name, dtn, shape, off, count in chunk
                ]
                leaves = self._slicer_for(rebased)({g["dtype"]: run})
                del run
                staged = {name: leaf for (name, *_), leaf in zip(chunk, leaves)}
                vision_flat.update(
                    {k: v for k, v in staged.items()
                     if k.startswith("vision_tower/")}
                )
                staged = {k: v for k, v in staged.items()
                          if not k.startswith("vision_tower/")}
                if atomic:
                    staged_flat.update(staged)
                    if self._should_yield_to_newer():
                        return  # newer push wins (bounded: one yield in a row)
                else:
                    if self._should_yield_to_newer():
                        return
                    with self._params_lock:
                        if self._pending_params is not None:
                            return  # a fully-staged device push supersedes
                        if staged:
                            live = dict(flatten_params(self.params))
                            live.update(staged)
                            self.params = unflatten_params(live)
        vision = (
            unflatten_params(
                {k.removeprefix("vision_tower/"): v for k, v in vision_flat.items()}
            )
            if vision_flat
            else None
        )
        # completion: the tree is fully staged — publish it even if a newer
        # push is already queued (yielding here would discard finished work;
        # the newer push follows immediately and wins by version). Only a
        # fully-staged device tree with an equal-or-newer version beats it.
        if atomic:
            tree = unflatten_params(staged_flat)
            jax.block_until_ready(tree)
            with self._params_lock:
                if (self._pending_params is not None
                        and self._pending_params[1] >= version):
                    return
                self._pending_params = (tree, version)
                if vision is not None:
                    self._pending_vision = vision
        else:
            with self._params_lock:
                if (self._pending_params is not None
                        and self._pending_params[1] >= version):
                    return
                if version > self.version:
                    self.version = version
                if vision is not None:
                    self._pending_vision = vision
        self._note_push_complete(time.monotonic() - t0)
        self.last_push_timings = {
            "transfer_s": time.monotonic() - t0,
            "stall_s": stall_total,
            "bytes": total,
            "gbps": total / max(stall_total, 1e-9) / 1e9,
            "mode": "blob" if atomic else "blob-chunked",
        }
        self._work_event.set()

    def _stream_leaves_inplace(self, params: dict, version: int) -> bool:
        """Leaf-streamed push: stage one leaf at a time and splice it into a
        fresh tree published to ``self.params`` (engine thread reads the
        whole-tree reference once per dispatch, so each splice is atomic).
        Returns True if a newer push superseded this one mid-stream."""
        new_leaves, treedef = jax.tree.flatten(params)
        with self._params_lock:
            live_leaves, live_def = jax.tree.flatten(self.params)
        assert treedef == live_def, "pushed tree shape != engine tree shape"
        for idx, leaf in enumerate(new_leaves):
            staged = jax.device_put(leaf)
            staged.block_until_ready()
            if self._should_yield_to_newer():
                return True  # newer push wins (at most once in a row)
            with self._params_lock:
                if self._pending_params is not None:
                    return True  # fully-staged device push supersedes
                live_leaves[idx] = staged
                self.params = jax.tree.unflatten(treedef, list(live_leaves))
        with self._params_lock:
            if self._pending_params is not None and self._pending_params[1] >= version:
                return True
            if version > self.version:
                self.version = version
        return False

    def _stream_rows_inplace(
        self, body: bytes, dt: np.dtype, group_base: int, spec: tuple,
        progress_cb,
    ) -> bool:
        """Stream ONE oversized tensor into the live tree row-range by
        row-range (leaf-streamed pushes, e.g. 7B on a 16 GB chip). Each
        paced sub-put is spliced at its row offset; when the engine thread
        is parked in the transfer gate the splice donates the old leaf
        (true in-place update, no 2x transient) — otherwise it falls back
        to a copying update. Returns True if superseded by a newer push."""
        from .weight_transfer import flatten_params, unflatten_params

        name, dtype_name, shape, elem_off, count = spec
        row_elems = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        superseded = [False]

        def splice(dev_part, parked, rel_offset=0):
            if superseded[0]:
                return
            r = rel_offset // row_elems
            rr = dev_part.size // row_elems
            part = dev_part.reshape((rr,) + tuple(shape[1:]))
            with self._params_lock:
                if self._pending_params is not None:
                    superseded[0] = True
                    return
                live = dict(flatten_params(self.params))
                leaf = live.get(name)
                if leaf is None or tuple(leaf.shape) != tuple(shape):
                    superseded[0] = True
                    return
                fn = self._row_splicer_for(
                    tuple(shape), rr, str(leaf.dtype), donate=parked
                )
                live[name] = fn(leaf, part.astype(leaf.dtype), r)
                self.params = unflatten_params(live)

        self._paced_put_span(
            body, dt, group_base, elem_off, elem_off + count,
            progress_cb=progress_cb, row_splice=splice, align_elems=row_elems,
            should_stop=lambda: superseded[0],
        )
        if superseded[0]:
            return True
        return self._should_yield_to_newer()

    def _row_splicer_for(self, shape: tuple, rr: int, dtype: str, donate: bool):
        """Jitted row-range update, cached per layout. With ``donate`` the
        old leaf's buffer is reused in place — only safe while the engine
        thread is parked in the transfer gate (it cannot dispatch with the
        invalidated array)."""
        key = ("rowsplice", shape, rr, dtype, donate)
        fn = self._slicer_cache.get(key)
        if fn is None:
            nd = len(shape)

            def f(full, part, r):
                return jax.lax.dynamic_update_slice(
                    full, part, (r,) + (0,) * (nd - 1)
                )

            fn = jax.jit(f, donate_argnums=(0,) if donate else ())
            self._slicer_cache[key] = fn
        return fn

    def score_tokens(self, input_ids: Sequence[int], temperature: float = 1.0) -> list[float]:
        """Teacher-forced per-token logprobs (positions 1..n-1) under the
        current weights — the ref-logprob annotation path (reference
        preprocess.py:86-104 via /v1/completions echo+logprobs)."""
        n = len(input_ids)
        bucket = next((b for b in self.buckets if b >= n), None)
        if bucket is None:
            raise ValueError(f"sequence of {n} tokens exceeds max bucket")
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :n] = input_ids
        lp = self._score(self.params, jnp.asarray(padded), temperature)
        return np.asarray(lp)[0, : n - 1].tolist()

    def start(self) -> None:
        assert self._thread is None
        self._thread = threading.Thread(target=self._run, daemon=True, name="engine-loop")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._work_event.set()
        self._transfer_event.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self._transfer_thread is not None:
            self._transfer_thread.join(timeout=10)

    @property
    def num_active(self) -> int:
        return sum(1 for s in self._slots if s is not None)

    @property
    def num_pending(self) -> int:
        return len(self._queue)

    def perf_counters(self) -> dict:
        """Engine-side observability: prefix-reuse, speculation waste, and
        slot occupancy (reference exposes the analogues through vLLM metrics,
        SURVEY.md §5)."""
        windows = max(1, self.windows_dispatched)
        produced = max(1, self.total_generated_tokens)
        return {
            "generated_tokens": self.total_generated_tokens,
            "prefill_tokens": self.total_prefill_tokens,
            "prefill_reused_tokens": self.prefill_reused_tokens,
            "decode_steps": self.decode_steps,
            "speculative_wasted_tokens": self.speculative_wasted_tokens,
            "speculation_waste_frac": self.speculative_wasted_tokens
            / (produced + self.speculative_wasted_tokens),
            "slot_occupancy": self.window_slots_dispatched
            / (windows * self.cfg.max_slots),
            "window_size_counts": dict(self.window_size_counts),
            "aborted_requests": self.aborted_requests,
            "num_active": self.num_active,
            "num_pending": self.num_pending,
            "num_retiring": len(self._retiring),
            **({k: v for k, v in self.push_counters().items() if v is not None}
               if self._pushes_received else {}),
            **(
                {
                    "kv_pages_free": self.block_pool.free_blocks,
                    "kv_pages_total": self.block_pool.n_blocks,
                    **(
                        {
                            "prefix_cache_hits": self.prefix_cache.hits,
                            "prefix_cache_reused_tokens": self.prefix_cache.reused_tokens,
                            "prefix_cache_pages": self.prefix_cache.pages_held,
                        }
                        if self.prefix_cache is not None
                        else {}
                    ),
                }
                if self.paged
                else {
                    "prefix_cache_hits": self.slab_prefix_hits,
                    "prefix_cache_parked_slots": len(self._parked),
                }
            ),
        }

    # ------------------------------------------------------------------
    # engine loop
    # ------------------------------------------------------------------
    def _run(self) -> None:
        while not self._stop.is_set():
            did_work = self.step()
            if not did_work:
                self._work_event.wait(timeout=0.005)
                self._work_event.clear()

    def step(self) -> bool:
        """One scheduling iteration: apply weight swap, serve a paced
        transfer chunk if one is waiting, abort, retire, admit, decode."""
        self._maybe_swap_params()
        self._serve_transfer_gate()
        aborted = self._process_aborts()
        self._retire_exhausted()
        admitted = self._admit()
        decoded = self._decode()
        return aborted or admitted or decoded

    def _serve_transfer_gate(self) -> None:
        """Grant the transfer thread one chunk slot: drain in-flight windows
        (useful decode — the device finishes them while we sync) so the H2D
        put is not starved by a continuously-refilled execution queue, then
        block until the chunk lands (~chunk_bytes / link bandwidth)."""
        if not self._transfer_gate_request.is_set():
            return
        while self._windows:
            self._process_window(self._windows.popleft())
        self._transfer_chunk_done.clear()
        self._transfer_gate_open.set()
        # stay parked for as long as the transfer thread is genuinely
        # working on the chunk: the row-streamed push donates live param
        # buffers on the premise that no decode dispatch can run here, so a
        # fixed timeout (a 128 MB chunk on a collapsed link can exceed any
        # constant) would break that premise. The liveness escape hatches
        # are a dead transfer thread or a cleared gate request.
        while not self._transfer_chunk_done.wait(timeout=5):
            if self._transfer_thread is None or not self._transfer_thread.is_alive():
                break
            if not self._transfer_gate_request.is_set():
                break
        self._transfer_gate_open.clear()

    def _retire_exhausted(self) -> None:
        """Free slots whose remaining token budget is already covered by
        dispatched-but-unsynced windows (budget-bound finishes are exactly
        predictable on the host; no device sync needed). The occupant's
        state moves to the retiring registry and its future resolves at the
        finishing window's sync; the slot admits a fresh request that rides
        the very next window instead of decoding pure speculation for
        W*(depth-1) more steps. Stop-token finishes stay on the synced path
        (unpredictable)."""
        if not self._windows:
            return
        for i, s in enumerate(self._slots):
            if s is None:
                continue
            inflight = sum(
                w.n_steps
                for w in self._windows
                if w.active[i] and w.gens[i] == s.gen
            )
            if inflight == 0:
                continue
            projected = len(s.token_ids) + (1 if s.pending_first else 0) + inflight
            if projected < s.max_new_tokens:
                continue
            self._slots[i] = None
            self._retiring[(i, s.gen)] = s
            if self.paged:
                if (
                    self.prefix_cache is not None
                    and s.request.visual is None
                    and self._pos_delta[i] == 0
                    and s.token_ids
                ):
                    # register the COMMITTED prefix (a true prefix of the
                    # final transcript); in-flight writes land at positions
                    # >= the committed length, outside these full pages
                    self.prefix_cache.register(
                        s.request.prompt_ids + s.token_ids,
                        self.block_pool.table[i],
                    )
                # reallocated pages are safe for the same program-order
                # reason as _finish_slot's release
                self.block_pool.release(i)
                self._slot_capacity[i] = 0
            else:
                # park the COMMITTED transcript (a true prefix of the final
                # one — in-flight tokens are still unsynced)
                self._maybe_park(i, s)

    def _maybe_swap_params(self) -> None:
        """Pointer-swap a fully-staged device tree (published either directly
        by update_params or by the transfer thread). O(1): no bytes move on
        the engine thread."""
        # the assignment happens INSIDE the lock: the transfer thread's
        # splice paths check _pending_params under the same lock, so a
        # splice can never interleave between our pop and the swap and
        # clobber a just-swapped newer tree with mixed leaves (round-4
        # advisor finding). The version guard drops a stale push that
        # finished staging after a newer one was already applied.
        with self._params_lock:
            pending = self._pending_params
            pending_vision = self._pending_vision
            self._pending_params = None
            self._pending_vision = None
            # a stale pair (published after a newer push already applied)
            # drops TOGETHER: installing only its vision tower would leave
            # mixed-version weights serving indefinitely
            stale = pending is not None and pending[1] < self.version
            if pending is not None and not stale:
                self.params, self.version = pending
            if pending_vision is not None and not stale:
                self.vision_params = pending_vision

    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _admit(self) -> bool:
        """Admit queued requests into free slots, prefilling same-bucket
        requests TOGETHER (batch sizes 8/4/2/1): a batch-1 prefill is
        weight-read-bound (~1 ms for 0.5B on v5e regardless of length), so
        admission waves were costing as much as decoding itself. The
        reference gets this from vLLM's mixed continuous batching
        (SURVEY.md §2.4).

        Requests with IDENTICAL prompts (the 8 attempts of a GRPO group
        arrive together) are prefilled ONCE: the first request computes the
        prompt KV; the siblings' slots are populated by an on-device cache
        fork plus independent first-token samples from the saved prefill
        logits — the prefix-caching win the reference gets from vLLM."""
        parked = self._parked if not self.paged else {}
        free_slots = [
            i for i, s in enumerate(self._slots) if s is None and i not in parked
        ]
        if not free_slots and not parked:
            return False
        with self._queue_lock:
            # parked slots count toward capacity: a prefix hit resumes one
            # in place, a miss evicts LRU — parking never reduces peak
            # concurrency
            take = min(len(free_slots) + len(parked), len(self._queue))
            pairs = [self._queue.popleft() for _ in range(take)]
        if not pairs:
            return False

        def next_slot() -> int:
            if free_slots:
                return free_slots.pop(0)
            return self._evict_parked(1)[0]
        if self.paged:
            # FIFO fit check against the page pool: admit the longest prefix
            # of the queue whose reservations (prompt + max_tokens + window,
            # forks conservatively counted like primaries) fit; requeue the
            # rest in order — admission never OOMs mid-flight. Prefix-cache
            # pages are evicted LRU before giving up on an admission.
            budget = self.block_pool.free_blocks
            fit = 0
            for request, _ in pairs:
                need = self.block_pool.blocks_for(self._reserve_tokens(request))
                if need > budget and self.prefix_cache is not None:
                    before = self.block_pool.free_blocks
                    self.prefix_cache.evict_for(before + (need - budget))
                    budget += self.block_pool.free_blocks - before
                if need > budget:
                    break
                budget -= need
                fit += 1
            if fit < len(pairs):
                with self._queue_lock:
                    self._queue.extendleft(reversed(pairs[fit:]))
                pairs = pairs[:fit]
            if not pairs:
                return False
        # cluster identical prompts (insertion-ordered); one primary each.
        # VLM requests cluster on (prompt, image bytes) — a GRPO group shares
        # one image, so siblings still ride the KV fork
        clusters: dict[tuple, list[tuple]] = {}
        for pair in pairs:
            key: tuple = tuple(pair[0].prompt_ids)
            if pair[0].visual is not None:
                import zlib

                pix = np.ascontiguousarray(pair[0].visual["pixel_values"])
                key = key + ("#img", pix.shape, zlib.crc32(pix.tobytes()))
            clusters.setdefault(key, []).append(pair)
        # group primaries by prefill bucket
        by_bucket: dict[int, list] = {}
        vlm_entries: list[list] = []
        extend_entries: list[tuple] = []
        slab_extend_entries: list[tuple] = []
        for prompt, members in clusters.items():
            request, future = members[0]
            n = len(request.prompt_ids)
            bucket = next(b for b in self.buckets if b >= n)
            if request.visual is not None:
                entry = [next_slot(), request, future, members[1:],
                         [next_slot() for _ in members[1:]]]
                vlm_entries.append([bucket] + entry)
                continue
            hit = None
            slab_hit = None
            if self.paged and self.prefix_cache is not None:
                hit = self.prefix_cache.lookup(request.prompt_ids)
            elif not self.paged and self.cfg.prefix_cache:
                slab_hit = self._park_lookup(request.prompt_ids)
            if slab_hit is not None:
                primary_slot, n_prefix = slab_hit
            else:
                primary_slot = next_slot()
            entry = [primary_slot, request, future, members[1:],
                     [next_slot() for _ in members[1:]]]
            if hit is not None:
                pages, n_prefix = hit
                tail_bucket = next(
                    b for b in self.buckets if b >= n - n_prefix
                )
                pb = 1
                while pb < len(pages):
                    pb <<= 1
                extend_entries.append((entry, pages, n_prefix, tail_bucket, pb))
            elif slab_hit is not None:
                tail_bucket = next(b for b in self.buckets if b >= n - n_prefix)
                pfx_bucket = next(b for b in self.buckets if b >= n_prefix)
                if n_prefix + tail_bucket > self.k_cache.shape[2]:
                    # no room for the padded tail write: cold re-prefill,
                    # reusing the parked slot as an ordinary free one
                    self.slab_prefix_hits -= 1
                    by_bucket.setdefault(bucket, []).append(entry)
                else:
                    slab_extend_entries.append(
                        (entry, n_prefix, tail_bucket, pfx_bucket)
                    )
            else:
                by_bucket.setdefault(bucket, []).append(entry)
        # batch extends that share (tail bucket, prefix-page bucket) — the
        # common case: sibling conversation lineages advance in lockstep
        ext_groups: dict[tuple, list] = {}
        for item in extend_entries:
            ext_groups.setdefault((item[3], item[4]), []).append(item)
        for g in ext_groups.values():
            pos = 0
            while pos < len(g):
                batch = 1
                for b in (8, 4, 2, 1):
                    if b <= self.cfg.max_prefill_batch and pos + b <= len(g):
                        batch = b
                        break
                self._prefill_extend(g[pos : pos + batch])
                pos += batch
        # slab extends batch the same way, keyed by (tail, prefix) buckets
        slab_groups: dict[tuple, list] = {}
        for item in slab_extend_entries:
            slab_groups.setdefault((item[2], item[3]), []).append(item)
        for g in slab_groups.values():
            pos = 0
            while pos < len(g):
                batch = 1
                for b in (8, 4, 2, 1):
                    if b <= self.cfg.max_prefill_batch and pos + b <= len(g):
                        batch = b
                        break
                self._prefill_extend_slab(g[pos : pos + batch])
                pos += batch
        for bucket, *entry in vlm_entries:
            self._prefill_vlm(bucket, entry)
        for bucket, group in by_bucket.items():
            pos = 0
            while pos < len(group):
                batch = 1
                for b in (8, 4, 2, 1):
                    if b <= self.cfg.max_prefill_batch and pos + b <= len(group):
                        batch = b
                        break
                self._prefill_batch(bucket, group[pos : pos + batch])
                pos += batch
        return True

    def _decode_fn_for(self, n_steps: int, masked: bool):
        """Jitted decode-window program for one window size (compiled lazily,
        cached for the engine's lifetime)."""
        key = (n_steps, masked)
        fn = self._decode_fns.get(key)
        if fn is None:
            if self.paged:
                # under a tp/pp mesh the XLA paged path partitions via GSPMD
                # (the Pallas kernel is single-device); explicit "xla" also
                # honors the operator's choice
                use_xla = self.mesh is not None or self._decode_attn == "xla"
                fn = jax.jit(
                    partial(
                        _decode_window_paged_fn, self.model_cfg, masked,
                        n_steps, use_xla,
                    ),
                    donate_argnums=(1, 2),
                )
            else:
                fn = jax.jit(
                    partial(
                        _decode_window_fn, self.model_cfg, masked, n_steps,
                        self.cfg.max_len, attn_impl=self._decode_attn,
                    ),
                    donate_argnums=(1, 2),
                )
            self._decode_fns[key] = fn
        return fn

    def _reserve_tokens(self, request: GenRequest) -> int:
        """Pages reserved at admission: the prompt, the request's own token
        budget, and one window of speculative overshoot."""
        n = len(request.prompt_ids)
        max_new = min(request.params.max_tokens, self.cfg.max_len - n)
        return min(n + max_new + max(1, self.cfg.decode_window),
                   self.cfg.max_len + max(1, self.cfg.decode_window))

    def _fork_fn_for(self, n_forks: int):
        fn = self._fork_fns.get(n_forks)
        if fn is None:
            fn = jax.jit(
                partial(_fork_fn, n_forks), donate_argnums=(0, 1, 2, 3)
            )
            self._fork_fns[n_forks] = fn
        return fn

    def _fork_slots(
        self,
        src_slot: int,
        logits_row: Any,  # [V] device array — prefill last-token logits
        siblings: list[tuple[GenRequest, Future]],
        dst_slots: list[int],
    ) -> None:
        """Populate ``dst_slots`` from ``src_slot``'s freshly prefilled KV:
        one contiguous device copy per fork plus an independent first-token
        sample — no second prefill of the shared prompt."""
        F = len(dst_slots)
        temps = np.ones(F, np.float32)
        top_p = np.ones(F, np.float32)
        top_k = np.zeros(F, np.int32)
        for f, (request, _) in enumerate(siblings):
            p = request.params
            temps[f], top_p[f], top_k[f] = p.temperature, p.top_p, p.top_k
        if self.paged:
            # full prompt pages are SHARED (refcounted); only a partial tail
            # page is copied per sibling, then each sibling reserves its own
            # decode pages — the admission fit check already counted them
            n_prompt = len(siblings[0][0].prompt_ids)
            tail_pages = []
            for (request, _), dst in zip(siblings, dst_slots):
                tail, shared_tokens = self.block_pool.fork(src_slot, dst, n_prompt)
                self.block_pool.extend(dst, self._reserve_tokens(request))
                self._slot_capacity[dst] = self._reserve_tokens(request)
                if tail.size:
                    tail_pages.append(int(tail[0]))
            if tail_pages:
                src_tail = int(
                    self.block_pool.table[
                        src_slot, n_prompt // self.cfg.kv_block_size
                    ]
                )
                key = ("copy", len(tail_pages))
                fn = self._fork_fns.get(key)
                if fn is None:
                    fn = jax.jit(
                        partial(_copy_pages_fn, len(tail_pages)),
                        donate_argnums=(0, 1),
                    )
                    self._fork_fns[key] = fn
                self.k_pool, self.v_pool = fn(
                    self.k_pool,
                    self.v_pool,
                    jnp.asarray(src_tail, jnp.int32),
                    jnp.asarray(np.asarray(tail_pages, np.int32)),
                )
            key = ("sample", F)
            fn = self._fork_fns.get(key)
            if fn is None:
                fn = jax.jit(partial(_fork_sample_fn, F), donate_argnums=(0, 1))
                self._fork_fns[key] = fn
            (
                self.cache_lens,
                self.first_info,
                self._rng_device,
            ) = fn(
                self.cache_lens,
                self.first_info,
                logits_row,
                jnp.asarray(src_slot, jnp.int32),
                jnp.asarray(np.asarray(dst_slots, np.int32)),
                self._rng_device,
                jnp.asarray(temps),
                jnp.asarray(top_p),
                jnp.asarray(top_k),
            )
        else:
            (
                self.k_cache,
                self.v_cache,
                self.cache_lens,
                self.first_info,
                self._rng_device,
            ) = self._fork_fn_for(F)(
                self.k_cache,
                self.v_cache,
                self.cache_lens,
                self.first_info,
                logits_row,
                jnp.asarray(src_slot, jnp.int32),
                jnp.asarray(np.asarray(dst_slots, np.int32)),
                self._rng_device,
                jnp.asarray(temps),
                jnp.asarray(top_p),
                jnp.asarray(top_k),
            )
        for (request, future), slot in zip(siblings, dst_slots):
            n = len(request.prompt_ids)
            self.prefill_reused_tokens += n
            max_new = min(request.params.max_tokens, self.cfg.max_len - n)
            self._gen_counter += 1
            self._pos_delta[slot] = self._pos_delta[src_slot]
            self._slots[slot] = _Slot(
                request=request,
                future=future,
                version_start=self.version,
                max_new_tokens=max_new,
                pending_first=True,
                gen=self._gen_counter,
            )

    def _prefill_extend(self, group: list[tuple]) -> None:
        """Admit clusters whose prompts extend cached transcripts, BATCHED
        (callers group by tail bucket + prefix-page bucket): attach each
        shared prefix's pages (refcount++), reserve the tails' pages, and
        prefill ONLY the tails against the gathered prefix KV in ONE
        dispatch (_prefill_extend_fn). Batch-1 extends made the warm
        multi-turn path SLOWER than cold full-prompt prefills (bench r3-a:
        0.90x) — 8 lineages x 13 turns = 104 dispatches each paying the
        tunnel RTT, vs 13 batch-8 bucket prefills cold. Identical-prompt
        siblings still fork off their primary afterwards."""
        B = len(group)
        tail_bucket, pb = group[0][3], group[0][4]
        tails = np.zeros((B, tail_bucket), np.int32)
        tail_lens = np.zeros(B, np.int32)
        prefix_lens = np.zeros(B, np.int32)
        slots_arr = np.zeros(B, np.int32)
        pad_pages = np.zeros((B, pb), np.int32)
        temps = np.ones(B, np.float32)
        top_ps = np.ones(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        for i, (entry, pages, n_prefix, _tb, _pb) in enumerate(group):
            slot, request, future, siblings, sibling_slots = entry
            ids = request.prompt_ids
            tail = ids[n_prefix:]
            pages = np.asarray(pages, np.int32)
            self.block_pool.attach(slot, pages)
            reserve = self._reserve_tokens(request)
            self.block_pool.extend(slot, reserve)
            self._slot_capacity[slot] = reserve
            tails[i, : len(tail)] = tail
            tail_lens[i] = len(tail)
            prefix_lens[i] = n_prefix
            slots_arr[i] = slot
            # pad entries repeat a valid page id; masked via prefix_len
            pad_pages[i] = pages[-1]
            pad_pages[i, : len(pages)] = pages
            p = request.params
            temps[i], top_ps[i], top_ks[i] = p.temperature, p.top_p, p.top_k

        key = (tail_bucket, pb, B)
        fn = self._prefill_extend_fns.get(key)
        if fn is None:
            fn = jax.jit(
                partial(_prefill_extend_fn, self.model_cfg, pb),
                donate_argnums=(1, 2, 3, 4),
            )
            self._prefill_extend_fns[key] = fn
        (
            self.k_pool,
            self.v_pool,
            self.cache_lens,
            self.first_info,
            last_logits,
            self._rng_device,
        ) = fn(
            self.params,
            self.k_pool,
            self.v_pool,
            self.cache_lens,
            self.first_info,
            jnp.asarray(tails),
            jnp.asarray(tail_lens),
            jnp.asarray(prefix_lens),
            jnp.asarray(slots_arr),
            jnp.asarray(pad_pages),
            jnp.asarray(self.block_pool.table[slots_arr]),
            self._rng_device,
            jnp.asarray(temps),
            jnp.asarray(top_ps),
            jnp.asarray(top_ks),
        )
        for i, (entry, pages, n_prefix, _tb, _pb) in enumerate(group):
            slot, request, future, siblings, sibling_slots = entry
            self.total_prefill_tokens += int(tail_lens[i])
            self.prefill_reused_tokens += n_prefix
            max_new = min(
                request.params.max_tokens, self.cfg.max_len - len(request.prompt_ids)
            )
            self._gen_counter += 1
            self._pos_delta[slot] = 0
            self._slots[slot] = _Slot(
                request=request,
                future=future,
                version_start=self.version,
                max_new_tokens=max_new,
                pending_first=True,
                gen=self._gen_counter,
            )
            if siblings:
                self._fork_slots(slot, last_logits[i], siblings, sibling_slots)

    def _prefill_extend_slab(self, group: list[tuple]) -> None:
        """Resume parked slab slots whose transcripts the prompts extend,
        BATCHED by (tail bucket, prefix bucket): gather the parked KV rows,
        prefill only the tails against them, and write the tail K/V back at
        the prefix offset — the slab analogue of the paged
        ``_prefill_extend`` (the vLLM prefix-cache role, SURVEY.md §2.4)."""
        B = len(group)
        tail_bucket, pfx_bucket = group[0][2], group[0][3]
        tails = np.zeros((B, tail_bucket), np.int32)
        tail_lens = np.zeros(B, np.int32)
        prefix_lens = np.zeros(B, np.int32)
        slots_arr = np.zeros(B, np.int32)
        temps = np.ones(B, np.float32)
        top_ps = np.ones(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        for i, (entry, n_prefix, _tb, _pb) in enumerate(group):
            slot, request, future, siblings, sibling_slots = entry
            tail = request.prompt_ids[n_prefix:]
            tails[i, : len(tail)] = tail
            tail_lens[i] = len(tail)
            prefix_lens[i] = n_prefix
            slots_arr[i] = slot
            p = request.params
            temps[i], top_ps[i], top_ks[i] = p.temperature, p.top_p, p.top_k
        key = (tail_bucket, pfx_bucket, B)
        fn = self._slab_extend_fns.get(key)
        if fn is None:
            fn = jax.jit(
                partial(_prefill_extend_slab_fn, self.model_cfg, pfx_bucket),
                donate_argnums=(1, 2, 3, 4),
            )
            self._slab_extend_fns[key] = fn
        (
            self.k_cache,
            self.v_cache,
            self.cache_lens,
            self.first_info,
            last_logits,
            self._rng_device,
        ) = fn(
            self.params,
            self.k_cache,
            self.v_cache,
            self.cache_lens,
            self.first_info,
            jnp.asarray(tails),
            jnp.asarray(tail_lens),
            jnp.asarray(prefix_lens),
            jnp.asarray(slots_arr),
            self._rng_device,
            jnp.asarray(temps),
            jnp.asarray(top_ps),
            jnp.asarray(top_ks),
        )
        for i, (entry, n_prefix, _tb, _pb) in enumerate(group):
            slot, request, future, siblings, sibling_slots = entry
            self.total_prefill_tokens += int(tail_lens[i])
            self.prefill_reused_tokens += n_prefix
            max_new = min(
                request.params.max_tokens, self.cfg.max_len - len(request.prompt_ids)
            )
            self._gen_counter += 1
            self._pos_delta[slot] = 0
            self._slots[slot] = _Slot(
                request=request,
                future=future,
                version_start=self.version,
                max_new_tokens=max_new,
                pending_first=True,
                gen=self._gen_counter,
            )
            if siblings:
                self._fork_slots(slot, last_logits[i], siblings, sibling_slots)

    def _prefill_vlm(self, bucket: int, entry: list) -> None:
        """Admit one VLM cluster: encode pixels with the frozen vision tower,
        prefill the primary slot with spliced visual tokens + mrope
        positions, then KV-fork identical siblings (a GRPO group shares one
        image). Patch counts are bucketed so image-size variety does not
        recompile the tower (pads form their own attention segments and the
        extra merged tokens are never spliced)."""
        from ..models.mrope import mrope_positions
        from ..models.vision import prepare_vision_inputs

        slot, request, future, siblings, sibling_slots = entry
        vcfg = self.vision_cfg
        if self.vision_params is None or vcfg is None:
            exc = RuntimeError("engine has no vision tower but got a visual request")
            for _, f in [(request, future)] + list(siblings):
                f.set_exception(exc)
            return
        vis = request.visual
        grid = np.asarray(vis["image_grid_thw"], np.int64).reshape(-1, 3)
        vin = prepare_vision_inputs(
            vis["pixel_values"], grid, vcfg, self.cfg.vision_unit_buckets
        )
        N_b = vin["patches"].shape[0]

        ids = request.prompt_ids
        n = len(ids)
        pos3, delta = mrope_positions(
            ids, grid, self.model_cfg.image_token_id, vcfg.spatial_merge_size,
            tokens_per_second=vcfg.tokens_per_second,
        )
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :n] = ids
        pos_p = np.zeros((3, 1, bucket), np.int32)
        pos_p[:, 0, :n] = pos3
        pos_p[:, 0, n:] = pos3.max() + 1 + np.arange(bucket - n, dtype=np.int32)
        image_mask = padded == int(self.model_cfg.image_token_id)

        p = request.params
        common_tail = (
            jnp.asarray(pos_p),
            jnp.asarray(vin["patches"]),
            jnp.asarray(vin["hw"]),
            jnp.asarray(vin["win_seg"]),
            jnp.asarray(vin["full_seg"]),
            jnp.asarray(vin["inv_perm"]),
            jnp.asarray(image_mask),
            self._rng_device,
            jnp.asarray([p.temperature], np.float32),
            jnp.asarray([p.top_p], np.float32),
            jnp.asarray([p.top_k], np.int32),
        )
        if self.paged:
            reserve = self._reserve_tokens(request)
            self.block_pool.allocate(slot, reserve)
            self._slot_capacity[slot] = reserve
            key = ("paged", bucket, N_b)
            fn = self._prefill_vlm_fns.get(key)
            if fn is None:
                fn = jax.jit(
                    partial(
                        _prefill_vlm_paged_fn, self.model_cfg,
                        self.cfg.attn_impl, vcfg,
                    ),
                    donate_argnums=(2, 3, 4, 5),
                )
                self._prefill_vlm_fns[key] = fn
            (
                self.k_pool,
                self.v_pool,
                self.cache_lens,
                self.first_info,
                last_logits,
                self._rng_device,
            ) = fn(
                self.params,
                self.vision_params,
                self.k_pool,
                self.v_pool,
                self.cache_lens,
                self.first_info,
                jnp.asarray(padded),
                jnp.asarray(np.asarray([n], np.int32)),
                jnp.asarray(np.asarray([slot], np.int32)),
                jnp.asarray(self.block_pool.table[[slot]]),
                *common_tail,
            )
        else:
            key = (bucket, N_b)
            fn = self._prefill_vlm_fns.get(key)
            if fn is None:
                fn = jax.jit(
                    partial(_prefill_vlm_fn, self.model_cfg, self.cfg.attn_impl, vcfg),
                    donate_argnums=(2, 3, 4, 5),
                )
                self._prefill_vlm_fns[key] = fn
            (
                self.k_cache,
                self.v_cache,
                self.cache_lens,
                self.first_info,
                last_logits,
                self._rng_device,
            ) = fn(
                self.params,
                self.vision_params,
                self.k_cache,
                self.v_cache,
                self.cache_lens,
                self.first_info,
                jnp.asarray(padded),
                jnp.asarray(np.asarray([n], np.int32)),
                jnp.asarray(np.asarray([slot], np.int32)),
                *common_tail,
            )
        self.total_prefill_tokens += n
        max_new = min(p.max_tokens, self.cfg.max_len - n)
        self._gen_counter += 1
        self._pos_delta[slot] = delta
        self._slots[slot] = _Slot(
            request=request,
            future=future,
            version_start=self.version,
            max_new_tokens=max_new,
            pending_first=True,
            gen=self._gen_counter,
        )
        if siblings:
            self._fork_slots(slot, last_logits[0], siblings, sibling_slots)

    def _prefill_batch(self, bucket: int, group: list[list]) -> None:
        """Dispatch one padded-batch prefill WITHOUT any host sync — each
        request's first sampled token stays on device and is materialized
        with the next decode window. ``group`` rows are
        [slot, request, future, sibling_pairs, sibling_slots]; siblings share
        the row's prompt and are populated by a KV fork after the prefill."""
        B = len(group)
        padded = np.zeros((B, bucket), np.int32)
        lengths = np.zeros(B, np.int32)
        slots = np.zeros(B, np.int32)
        temps = np.ones(B, np.float32)
        top_p = np.ones(B, np.float32)
        top_k = np.zeros(B, np.int32)
        for b, (slot, request, _, _, _) in enumerate(group):
            n = len(request.prompt_ids)
            padded[b, :n] = request.prompt_ids
            lengths[b] = n
            slots[b] = slot
            p = request.params
            temps[b], top_p[b], top_k[b] = p.temperature, p.top_p, p.top_k
        if self.paged:
            # reserve every page the request can ever touch up front
            # (_admit's fit check guarantees this succeeds)
            for b, (slot, request, _, _, _) in enumerate(group):
                reserve = self._reserve_tokens(request)
                self.block_pool.allocate(slot, reserve)
                self._slot_capacity[slot] = reserve
            table_rows = self.block_pool.table[slots]
            (
                self.k_pool,
                self.v_pool,
                self.cache_lens,
                self.first_info,
                last_logits,
                self._rng_device,
            ) = self._prefill(
                self.params,
                self.k_pool,
                self.v_pool,
                self.cache_lens,
                self.first_info,
                jnp.asarray(padded),
                jnp.asarray(lengths),
                jnp.asarray(slots),
                jnp.asarray(table_rows),
                self._rng_device,
                jnp.asarray(temps),
                jnp.asarray(top_p),
                jnp.asarray(top_k),
            )
        else:
            (
                self.k_cache,
                self.v_cache,
                self.cache_lens,
                self.first_info,
                last_logits,
                self._rng_device,
            ) = self._prefill(
                self.params,
                self.k_cache,
                self.v_cache,
                self.cache_lens,
                self.first_info,
                jnp.asarray(padded),
                jnp.asarray(lengths),
                jnp.asarray(slots),
                self._rng_device,
                jnp.asarray(temps),
                jnp.asarray(top_p),
                jnp.asarray(top_k),
            )
        for b, (slot, request, future, siblings, sibling_slots) in enumerate(group):
            n = len(request.prompt_ids)
            self.total_prefill_tokens += n
            max_new = min(request.params.max_tokens, self.cfg.max_len - n)
            self._gen_counter += 1
            self._pos_delta[slot] = 0
            self._slots[slot] = _Slot(
                request=request,
                future=future,
                version_start=self.version,
                max_new_tokens=max_new,
                pending_first=True,
                gen=self._gen_counter,
            )
            if siblings:
                self._fork_slots(slot, last_logits[b], siblings, sibling_slots)

    def _stop_tokens(self, p: SamplingParams) -> tuple[int, ...]:
        return (self.eos_token_id,) + tuple(p.stop_token_ids)

    def _maybe_finish(self, slot: int, token: int) -> None:
        state = self._slots[slot]
        assert state is not None
        p = state.request.params
        finish = None
        if token in self._stop_tokens(p):
            finish = "stop"
        elif len(state.token_ids) >= state.max_new_tokens:
            finish = "length"
        if finish is not None:
            self._finish_slot(slot, finish)

    @staticmethod
    def _notify(
        request: GenRequest,
        tokens: list[int],
        logprobs: list[float],
        finish: str | None,
    ) -> None:
        """Invoke a request's stream callback (engine thread); exceptions are
        logged, never propagated into the scheduling loop."""
        cb = request.stream_callback
        if cb is None:
            return
        try:
            cb(tokens, logprobs, finish)
        except Exception:  # noqa: BLE001 — user callback must not kill the loop
            logger.exception("stream callback failed for %s", request.request_id)

    def _maybe_park(self, slot: int, state: "_Slot") -> None:
        """Slab cross-turn reuse: keep a finished slot's KV rows in place and
        remember the transcript, so the conversation's next turn resumes the
        slot and prefills only its tail. In-flight window writes past the
        committed length land BEFORE any later extension prefill in device
        program order (same argument as slot reallocation), so the parked
        prefix rows are never torn."""
        if not self.cfg.prefix_cache:
            return
        if state.request.visual is not None or self._pos_delta[slot] != 0:
            return
        # A token's KV row is written only when the token is FED as a later
        # decode step's input; the FINAL sampled token (stop token, budget
        # cap on a window boundary, abort point) may never be fed, so its
        # row can be garbage. Park the transcript MINUS that last token —
        # every earlier token was the input of the step that sampled its
        # successor (and the whole prompt was written by prefill), so all
        # parked rows are guaranteed committed. Costs one extra prefilled
        # token per resumed turn.
        transcript = state.request.prompt_ids + state.token_ids[:-1]
        if (
            len(transcript) < self.cfg.slab_prefix_min_tokens
            or len(transcript) >= self.cfg.max_len
        ):
            return
        self._park_stamp += 1
        state.park_stamp = self._park_stamp
        self._parked[slot] = (transcript, self._park_stamp)

    def _park_lookup(self, prompt_ids: list[int]) -> tuple[int, int] | None:
        """Longest parked transcript that is a proper prefix of the prompt →
        (slot, n_prefix); the hit is removed from the parked set."""
        best_slot, best_len = -1, 0
        n = len(prompt_ids)
        for slot, (transcript, _) in self._parked.items():
            t = len(transcript)
            if t >= n or t <= best_len or t < self.cfg.slab_prefix_min_tokens:
                continue
            if transcript == prompt_ids[:t]:
                best_slot, best_len = slot, t
        if best_slot < 0:
            return None
        del self._parked[best_slot]
        self.slab_prefix_hits += 1
        return best_slot, best_len

    def _evict_parked(self, n: int) -> list[int]:
        """Free the n least-recently-parked slots (their KV is abandoned)."""
        by_age = sorted(self._parked.items(), key=lambda kv: kv[1][1])
        freed = []
        for slot, _ in by_age[:n]:
            del self._parked[slot]
            freed.append(slot)
        return freed

    def _finish_slot(self, slot: int, finish: str) -> None:
        state = self._slots[slot]
        assert state is not None
        self._slots[slot] = None
        if self.paged:
            if (
                self.prefix_cache is not None
                and state.request.visual is None
                and self._pos_delta[slot] == 0
                and state.token_ids
            ):
                # register the transcript's full pages for cross-request
                # reuse (in-flight windows only touch positions past the true
                # length — never inside registered full pages)
                self.prefix_cache.register(
                    state.request.prompt_ids + state.token_ids,
                    self.block_pool.table[slot],
                )
            # safe while windows are in flight: they captured the table at
            # dispatch and anything written to reallocated pages lands before
            # (device program order) the new occupant's prefill
            self.block_pool.release(slot)
            self._slot_capacity[slot] = 0
        else:
            self._maybe_park(slot, state)
        self._notify(state.request, [], [], finish)
        state.future.set_result(
            GenResult(
                token_ids=state.token_ids,
                logprobs=state.logprobs,
                finish_reason=finish,
                model_version_start=state.version_start,
                model_version_end=self.version,
                prompt_tokens=len(state.request.prompt_ids),
            )
        )

    def _decode(self) -> bool:
        """Dispatch one decode window and sync/process the oldest once the
        pipeline is full. A request's tokens only reach its future after the
        sync, (depth-1) windows behind dispatch."""
        S = self.cfg.max_slots
        active = np.zeros(S, np.bool_)
        gens = np.zeros(S, np.int64)
        temperature = np.ones(S, np.float32)
        top_p = np.ones(S, np.float32)
        top_k = np.zeros(S, np.int32)
        needs_masking = False
        pending: list[int] = []
        fresh: list[int] = []
        remainings: list[int] = []
        for i, s in enumerate(self._slots):
            if s is None:
                continue
            active[i] = True
            gens[i] = s.gen
            if s.pending_first:
                pending.append(i)
            if not s.first_dispatched:
                fresh.append(i)
                s.first_dispatched = True
            # remaining token budget (tokens in in-flight windows not yet
            # counted — the consume path enforces the exact cut). A pending
            # prefill-sampled first token is already produced but not yet in
            # token_ids; it rides this window's packed output, so it spends
            # one budget unit before any of this window's steps land.
            remainings.append(
                s.max_new_tokens - len(s.token_ids) - (1 if s.pending_first else 0)
            )
            p = s.request.params
            temperature[i] = p.temperature
            top_p[i] = p.top_p
            top_k[i] = p.top_k
            needs_masking = needs_masking or p.needs_masking
        if not active.any():
            # nothing to dispatch: drain any in-flight windows
            did = False
            while self._windows:
                self._process_window(self._windows.popleft())
                did = True
            return did

        pending_mask = np.zeros(S, np.bool_)
        pending_mask[fresh] = True

        # budget-aware window size: cover the MEDIAN slot's remaining budget
        # with the smallest compiled size — near-finish slots recycle a
        # window sooner (occupancy) and budget overshoot shrinks, while the
        # long-lived majority keeps large host-sync amortization. Sizing to
        # the MINIMUM (round-3 first cut) let one near-done slot shrink
        # everyone's window and, combined with pipeline drains, cost ~25%
        # throughput on the jittered bench — the drain is gone and the
        # percentile keeps both effects bounded.
        window = self._window_sizes[-1]
        if len(self._window_sizes) > 1 and remainings:
            med = sorted(remainings)[len(remainings) // 2]
            if med < window:
                window = next(
                    (w for w in self._window_sizes if w >= med),
                    self._window_sizes[-1],
                )
        fn = self._decode_fn_for(window, needs_masking)
        if self.paged:
            # Slice the table snapshot to the pow2-bucketed max pages any
            # ACTIVE slot holds: the jitted window gathers a contiguous
            # [L, S, maxb*BT, ...] view once per window, so the view (and
            # its attention reads) should cover the active working set, not
            # the pool-wide MAX_BLOCKS. jit re-traces per bucket — at most
            # log2(MAX_BLOCKS) variants per window size, compile-cached.
            table = self.block_pool.table
            active_idx = np.flatnonzero(active)
            mb = 1
            if active_idx.size:
                mb = max(1, int(self.block_pool.slot_blocks[active_idx].max()))
            b = 1
            while b < mb:
                b *= 2
            table = table[:, : min(b, table.shape[1])]
            (
                packed,
                self.k_pool,
                self.v_pool,
                self.cache_lens,
                self._rng_device,
                self._device_tokens,
            ) = fn(
                self.params,
                self.k_pool,
                self.v_pool,
                self._device_tokens,
                jnp.asarray(active),
                jnp.asarray(pending_mask),
                self.first_info,
                self.cache_lens,
                jnp.asarray(self._pos_delta),
                self._rng_device,
                jnp.asarray(temperature),
                jnp.asarray(top_p),
                jnp.asarray(top_k),
                jnp.asarray(table),
                jnp.asarray(self._slot_capacity.astype(np.int32)),
            )
        else:
            (
                packed,
                self.k_cache,
                self.v_cache,
                self.cache_lens,
                self._rng_device,
                self._device_tokens,
            ) = fn(
                self.params,
                self.k_cache,
                self.v_cache,
                self._device_tokens,
                jnp.asarray(active),
                jnp.asarray(pending_mask),
                self.first_info,
                self.cache_lens,
                jnp.asarray(self._pos_delta),
                self._rng_device,
                jnp.asarray(temperature),
                jnp.asarray(top_p),
                jnp.asarray(top_k),
            )
        self.windows_dispatched += 1
        self.window_slots_dispatched += int(active.sum())
        self.window_size_counts[window] = self.window_size_counts.get(window, 0) + 1
        self._windows.append(_Window(packed, active, gens, pending, n_steps=window))
        while len(self._windows) >= max(1, self.cfg.window_pipeline_depth):
            self._process_window(self._windows.popleft())
        return True

    def _process_window(self, w: _Window) -> None:
        # THE single device->host fetch per window
        packed = np.asarray(w.packed)  # [2, N+1, S] int32
        win_tokens = packed[0, 1:]  # [N, S]
        win_logprobs = packed[1, 1:].view(np.float32)
        first_tokens = packed[0, 0]  # [S]
        first_logprobs = packed[1, 0].view(np.float32)
        n_steps = win_tokens.shape[0]
        self.decode_steps += n_steps
        for i in w.pending:
            s = self._slots[i]
            if s is None or s.gen != w.gens[i]:
                s = self._retiring.get((i, int(w.gens[i])))
            if s is None or not s.pending_first:
                continue
            s.pending_first = False
            token = int(first_tokens[i])
            s.last_token = token
            s.token_ids.append(token)
            s.logprobs.append(float(first_logprobs[i]))
            self.total_generated_tokens += 1
            self._notify(s.request, [token], [float(first_logprobs[i])], None)
            if self._slots[i] is s:
                self._maybe_finish(i, token)
            elif (
                token in self._stop_tokens(s.request.params)
                or len(s.token_ids) >= s.max_new_tokens
            ):
                finish = (
                    "stop" if token in self._stop_tokens(s.request.params) else "length"
                )
                self._resolve_retired((i, int(w.gens[i])), s, finish)
        # vectorized per-slot consume: find the cut (first stop token or
        # length budget), then bulk-extend — the naive token-by-token Python
        # loop cost ~1.7 ms/step of host time at batch 64, dwarfing the
        # 3 ms/step device time
        for i in range(len(self._slots)):
            if not w.active[i]:
                continue
            s = self._slots[i]
            retired = False
            if s is None or s.gen != w.gens[i]:
                s = self._retiring.get((i, int(w.gens[i])))
                retired = s is not None
            if s is None:
                # the window's occupant finished/aborted before this sync —
                # everything it decoded here was speculation
                self.speculative_wasted_tokens += n_steps
                continue
            col = win_tokens[:, i]
            stops = self._stop_tokens(s.request.params)
            stop_mask = (
                (col == stops[0]) if len(stops) == 1 else np.isin(col, stops)
            )
            budget = s.max_new_tokens - len(s.token_ids)
            stop_hits = np.flatnonzero(stop_mask)
            finish = None
            cut = n_steps
            if stop_hits.size and int(stop_hits[0]) + 1 <= budget:
                cut = int(stop_hits[0]) + 1  # stop token included
                finish = "stop"
            elif budget <= n_steps:
                cut = budget
                finish = "length"
            if cut > 0:
                chunk = col[:cut].tolist()
                chunk_lps = win_logprobs[:cut, i].tolist()
                s.token_ids.extend(chunk)
                s.logprobs.extend(chunk_lps)
                s.last_token = int(col[cut - 1])
                self.total_generated_tokens += cut
                self._notify(s.request, chunk, chunk_lps, None)
            if finish is not None:
                self.speculative_wasted_tokens += n_steps - cut
                if retired:
                    self._resolve_retired((i, int(w.gens[i])), s, finish)
                else:
                    self._finish_slot(i, finish)

    def _resolve_retired(self, key: tuple[int, int], state: _Slot, finish: str) -> None:
        """Resolve an early-retired occupant's future at its finishing
        window's sync (the slot itself was freed at retire time)."""
        self._retiring.pop(key, None)
        if not self.paged and state.park_stamp >= 0:
            # upgrade the park entry (created with the committed-only
            # transcript at retire time) to the full transcript MINUS the
            # final token (its KV row may never be written — it is only
            # written when fed as a later step's input), but only if the
            # entry is still ours — the slot may have been evicted or
            # re-parked by a later occupant meanwhile.
            cur = self._parked.get(key[0])
            if cur is not None and cur[1] == state.park_stamp:
                full = state.request.prompt_ids + state.token_ids[:-1]
                if self.cfg.slab_prefix_min_tokens <= len(full) < self.cfg.max_len:
                    self._parked[key[0]] = (full, cur[1])
        self._notify(state.request, [], [], finish)
        state.future.set_result(
            GenResult(
                token_ids=state.token_ids,
                logprobs=state.logprobs,
                finish_reason=finish,
                model_version_start=state.version_start,
                model_version_end=self.version,
                prompt_tokens=len(state.request.prompt_ids),
            )
        )


# ---------------------------------------------------------------------------
# jitted step functions (pure; engine state threaded explicitly)
# ---------------------------------------------------------------------------


def _merge_staged(
    cache: jnp.ndarray,  # [L, S, T_alloc, K, Dh]
    staged: jnp.ndarray,  # [L, W, S, K, Dh]
    base_lens: jnp.ndarray,  # [S]
) -> jnp.ndarray:
    """Write each slot's staged band at its base length — ONE windowed
    scatter per decode window instead of one scatter per step (the per-step
    scatter cost 1.37 ms/step on v5e, ~1750× the bytes-moved floor; see
    scripts/probe_window.py). T_alloc = capacity + W keeps every window
    write in bounds, so XLA's drop-out-of-bounds scatter semantics never
    discard real tokens."""
    L, S, T_alloc, K, Dh = cache.shape
    W = staged.shape[1]  # staged layout [L, W, S, K, Dh]
    # one update row per slot: [S, L, W, K, Dh]; window starts at (s, base_s).
    # update window dims (1,2,3,4) map to operand window dims (0=L, 2=T, 3=K,
    # 4=Dh) in ascending operand order; operand dim 1 (S) is the indexed dim.
    updates = staged.transpose(2, 0, 1, 3, 4)
    starts = jnp.stack(
        [jnp.arange(S, dtype=jnp.int32), jnp.minimum(base_lens, T_alloc - W)], axis=-1
    )
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1, 2),
    )
    return jax.lax.scatter(
        cache,
        starts,
        updates,
        dimension_numbers=dnums,
        indices_are_sorted=True,
        unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )


def _decode_window_fn(
    model_cfg: ModelConfig,
    use_masking: bool,
    n_steps: int,
    capacity: int,  # slab token capacity T (static; T_alloc = T + max window)
    params: dict,
    k_cache: jnp.ndarray,  # [L, S, T_alloc, K, Dh]; capacity = T_alloc - n_steps
    v_cache: jnp.ndarray,
    tokens: jnp.ndarray,  # [S] — device carry of last sampled tokens
    active: jnp.ndarray,  # [S] bool
    pending_mask: jnp.ndarray,  # [S] bool — slots whose true last token is first_info
    first_info: jnp.ndarray,  # [S, 2] int32 — prefill (token, bitcast logprob)
    cache_lens: jnp.ndarray,  # [S]
    pos_delta: jnp.ndarray,  # [S] — mrope decode offset (0 for text slots)
    rng: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
    attn_impl: str = "xla",
):
    """``n_steps`` decode steps fully on device (lax.scan): the sampled token
    feeds the next step without a host round trip. New K/V accumulate in a
    [L, S, W, K, Dh] staging band (uniform-index dynamic_update_slice per
    step) and merge into the big cache ONCE at window end; attention reads
    frozen cache + band (ops/attention.decode_attention_staged). Returns a
    single packed int32 [2, N+1, S] output (ONE device->host fetch per
    window) plus the advanced engine state."""
    S = tokens.shape[0]
    T_alloc = k_cache.shape[2]
    L = k_cache.shape[0]
    K, Dh = k_cache.shape[3], k_cache.shape[4]
    tokens = jnp.where(pending_mask, first_info[:, 0], tokens)
    base_lens = cache_lens  # frozen for the whole window
    # staged layout [L, W, S, K, Dh]: the per-step write at a uniform w is a
    # near-contiguous dynamic_update_slice (L chunks of S*K*Dh), not a scatter
    k_staged = jnp.zeros((L, n_steps, S, K, Dh), k_cache.dtype)
    v_staged = jnp.zeros((L, n_steps, S, K, Dh), v_cache.dtype)

    def body(carry, step):
        tokens, k_staged, v_staged, rng = carry
        rng, sub = jax.random.split(rng)
        # pos_delta shifts the rope value only (mrope text continuation after
        # images — all three mrope rows equal ⇒ 1D rope at base+step+delta);
        # cache indexing stays at base+step
        positions = jnp.minimum(base_lens + step, T_alloc - 1) + pos_delta
        logits, k_new, v_new = decode_step_staged(
            params, model_cfg, tokens, positions, k_cache, v_cache,
            base_lens, k_staged, v_staged, step, attn_impl=attn_impl,
        )
        k_staged = jax.lax.dynamic_update_slice(
            k_staged, k_new.astype(k_staged.dtype)[:, None], (0, step, 0, 0, 0)
        )
        v_staged = jax.lax.dynamic_update_slice(
            v_staged, v_new.astype(v_staged.dtype)[:, None], (0, step, 0, 0, 0)
        )
        if use_masking:
            new_tokens, logprobs = sample_masked(logits, sub, temperature, top_p, top_k)
        else:
            new_tokens, logprobs = sample_fast(logits, sub, temperature)
        new_tokens = jnp.where(active, new_tokens, tokens)
        return (new_tokens, k_staged, v_staged, rng), (new_tokens, logprobs)

    (tokens, k_staged, v_staged, rng), (win_tokens, win_logprobs) = jax.lax.scan(
        body,
        (tokens, k_staged, v_staged, rng),
        jnp.arange(n_steps, dtype=jnp.int32),
    )
    k_cache = _merge_staged(k_cache, k_staged, base_lens)
    v_cache = _merge_staged(v_cache, v_staged, base_lens)
    cache_lens = jnp.where(
        active, jnp.minimum(base_lens + n_steps, capacity - 1), base_lens
    )
    # pack (first_info row, then the window) into one int32 array
    lp_bits = jax.lax.bitcast_convert_type(win_logprobs.astype(jnp.float32), jnp.int32)
    tok_rows = jnp.concatenate([first_info[None, :, 0], win_tokens], axis=0)
    lp_rows = jnp.concatenate([first_info[None, :, 1], lp_bits], axis=0)
    packed = jnp.stack([tok_rows, lp_rows])  # [2, N+1, S]
    # ``tokens`` is the final carry: the DEVICE-side last token per slot.
    # The next window must start from it — the host's view is (depth-1)
    # windows stale while the pipeline is full (round-3 regression find:
    # depth-2 continuations silently restarted each window from the
    # previous window's input, corrupting every multi-window generation).
    return packed, k_cache, v_cache, cache_lens, rng, tokens


def _prefill_last_logits(params, model_cfg, normed_hidden, lengths):
    """[B, V] fp32 logits of each row's LAST prompt token. Prefill runs the
    lm_head at ONE position per row — the full [B, P, V] fp32 unembed was
    the dominant prefill cost (20 GB at bucket 4096 x batch 8, over v5e
    HBM; round-3 bench OOM)."""
    from ..models.transformer import lm_head_logits

    last = jnp.take_along_axis(
        normed_hidden, (lengths - 1)[:, None, None], axis=1
    )[:, 0]  # [B, D]
    return lm_head_logits(params, model_cfg, last)


def _sample_first_tokens(
    first_info, last_logits, slots, rng, temperature, top_p, top_k
):
    """Sample each prefilled row's first token on device; returns the
    updated first_info (identical-prompt siblings later sample their own
    first token from the same last_logits after a KV fork, _fork_fn)."""
    rng, sub = jax.random.split(rng)
    tokens, logprobs = sample_masked(last_logits, sub, temperature, top_p, top_k)
    lp_bits = jax.lax.bitcast_convert_type(logprobs.astype(jnp.float32), jnp.int32)
    first_info = first_info.at[slots].set(
        jnp.stack([tokens.astype(jnp.int32), lp_bits], axis=-1)
    )
    return first_info, rng


def _prefill_commit(
    k_cache, v_cache, cache_lens, first_info,
    last_logits, k_new, v_new, lengths, slots, rng, temperature, top_p, top_k,
):
    """Shared prefill tail: write each row's K/V into its slot's cache
    prefix, record lengths, sample the first token per row on device."""
    B = last_logits.shape[0]
    k_block = k_new.astype(k_cache.dtype)
    v_block = v_new.astype(v_cache.dtype)
    for b in range(B):  # B is static (8/4/2/1); unrolled contiguous writes
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_block[:, b : b + 1], (0, slots[b], 0, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_block[:, b : b + 1], (0, slots[b], 0, 0, 0)
        )
    cache_lens = cache_lens.at[slots].set(lengths)
    first_info, rng = _sample_first_tokens(
        first_info, last_logits, slots, rng, temperature, top_p, top_k
    )
    return k_cache, v_cache, cache_lens, first_info, last_logits, rng


def _prefill_fn(
    model_cfg: ModelConfig,
    attn_impl: str,
    params: dict,
    k_cache: jnp.ndarray,  # [L, S, T, K, Dh]
    v_cache: jnp.ndarray,
    cache_lens: jnp.ndarray,  # [S]
    first_info: jnp.ndarray,  # [S, 2] int32
    input_ids: jnp.ndarray,  # [B, P] (padded bucket, batched admissions)
    lengths: jnp.ndarray,  # [B] — true prompt lengths
    slots: jnp.ndarray,  # [B]
    rng: jax.Array,
    temperature: jnp.ndarray,  # [B]
    top_p: jnp.ndarray,  # [B]
    top_k: jnp.ndarray,  # [B]
):
    B, P = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(P)[None, :], (B, P))
    segments = jnp.zeros((B, P), jnp.int32)
    normed, (k_new, v_new) = forward(
        params, model_cfg, input_ids, positions, segments, return_kv=True,
        attn_impl=attn_impl, skip_unembed=True,
    )
    last_logits = _prefill_last_logits(params, model_cfg, normed, lengths)
    return _prefill_commit(
        k_cache, v_cache, cache_lens, first_info,
        last_logits, k_new, v_new, lengths, slots, rng, temperature, top_p, top_k,
    )


def _prefill_vlm_fn(
    model_cfg: ModelConfig,
    attn_impl: str,
    vision_cfg,
    params: dict,
    vision_params: dict,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cache_lens: jnp.ndarray,
    first_info: jnp.ndarray,
    input_ids: jnp.ndarray,  # [1, P]
    lengths: jnp.ndarray,  # [1]
    slots: jnp.ndarray,  # [1]
    positions3: jnp.ndarray,  # [3, 1, P] mrope rows
    patches: jnp.ndarray,  # [N_b, patch_dim] window-permuted, padded
    hw: jnp.ndarray,  # [N_b, 2]
    win_seg: jnp.ndarray,  # [N_b]
    full_seg: jnp.ndarray,  # [N_b]
    inv_perm: jnp.ndarray,  # [U_b]
    image_mask: jnp.ndarray,  # [1, P] bool — placeholder positions
    rng: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
):
    """Single-row VLM prefill: encode the image with the vision tower, splice
    the visual tokens at the placeholder positions, run the language forward
    with mrope positions (one jit per (prompt bucket, patch bucket) pair —
    the reference serves chartqa through vLLM at batch 1, SURVEY.md §2.6)."""
    from ..models.vision import vision_forward

    embeds = vision_forward(
        vision_params, vision_cfg, patches, hw, win_seg, full_seg, inv_perm
    )  # [U_b, D]
    segments = jnp.zeros_like(input_ids)
    normed, (k_new, v_new) = forward(
        params, model_cfg, input_ids, positions3, segments, return_kv=True,
        attn_impl=attn_impl, image_embeds=embeds[None], image_mask=image_mask,
        skip_unembed=True,
    )
    last_logits = _prefill_last_logits(params, model_cfg, normed, lengths)
    return _prefill_commit(
        k_cache, v_cache, cache_lens, first_info,
        last_logits, k_new, v_new, lengths, slots, rng, temperature, top_p, top_k,
    )


def _prefill_vlm_paged_fn(
    model_cfg: ModelConfig,
    attn_impl: str,
    vision_cfg,
    params: dict,
    vision_params: dict,
    k_pool: jnp.ndarray,  # [L, NB, BT, K, Dh]
    v_pool: jnp.ndarray,
    cache_lens: jnp.ndarray,
    first_info: jnp.ndarray,
    input_ids: jnp.ndarray,  # [1, P]
    lengths: jnp.ndarray,  # [1]
    slots: jnp.ndarray,  # [1]
    table_rows: jnp.ndarray,  # [1, MAXB]
    positions3: jnp.ndarray,  # [3, 1, P]
    patches: jnp.ndarray,
    hw: jnp.ndarray,
    win_seg: jnp.ndarray,
    full_seg: jnp.ndarray,
    inv_perm: jnp.ndarray,
    image_mask: jnp.ndarray,
    rng: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
):
    """VLM prefill into the paged pool (same tower+splice forward as
    ``_prefill_vlm_fn``, paged commit instead of slab writes)."""
    from ..models.vision import vision_forward

    embeds = vision_forward(
        vision_params, vision_cfg, patches, hw, win_seg, full_seg, inv_perm
    )
    segments = jnp.zeros_like(input_ids)
    normed, (k_new, v_new) = forward(
        params, model_cfg, input_ids, positions3, segments, return_kv=True,
        attn_impl=attn_impl, image_embeds=embeds[None], image_mask=image_mask,
        skip_unembed=True,
    )
    last_logits = _prefill_last_logits(params, model_cfg, normed, lengths)
    return _prefill_commit_paged(
        k_pool, v_pool, cache_lens, first_info,
        last_logits, k_new, v_new, lengths, slots, table_rows,
        rng, temperature, top_p, top_k,
    )


def _prefill_extend_fn(
    model_cfg: ModelConfig,
    n_pages: int,  # prefix pages per row (static bucket)
    params: dict,
    k_pool: jnp.ndarray,  # [L, NB, BT, K, Dh]
    v_pool: jnp.ndarray,
    cache_lens: jnp.ndarray,  # [S]
    first_info: jnp.ndarray,  # [S, 2]
    tail_ids: jnp.ndarray,  # [B, Tb] — prompt tokens past the cached prefixes
    tail_len: jnp.ndarray,  # [B]
    prefix_len: jnp.ndarray,  # [B] — tokens covered by each row's prefix pages
    slots: jnp.ndarray,  # [B]
    prefix_pages: jnp.ndarray,  # [B, n_pages] physical page ids (pad = repeat)
    table_rows: jnp.ndarray,  # [B, MAXB] — each slot's full table (for append)
    rng: jax.Array,
    temperature: jnp.ndarray,  # [B]
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
):
    """Prefix-reuse prefill, batched over B rows: gather each row's cached
    prefix pages, run the tails through ``forward_extend`` (attention over
    [prefix | tail]), append the tail K/V at ``prefix_len``, sample first
    tokens. Turn N+1 of a conversation pays only for its new tokens (vLLM
    prefix-cache role, SURVEY.md §2.4); same-turn lineages share a dispatch."""
    from ..models.transformer import forward_extend
    from ..ops.paged_attention import paged_append

    BT = k_pool.shape[2]
    B, Tb = tail_ids.shape
    k_pre = jnp.take(k_pool, prefix_pages, axis=1)  # [L, B, P, BT, K, Dh]
    v_pre = jnp.take(v_pool, prefix_pages, axis=1)
    L = k_pre.shape[0]
    K, Dh = k_pre.shape[4], k_pre.shape[5]
    k_pre = k_pre.reshape(L, B, n_pages * BT, K, Dh)
    v_pre = v_pre.reshape(L, B, n_pages * BT, K, Dh)

    positions = prefix_len[:, None] + jnp.arange(Tb)[None, :]
    normed, (k_new, v_new) = forward_extend(
        params, model_cfg, tail_ids, positions,
        k_pre, v_pre, prefix_len,
        skip_unembed=True,
    )
    write = jax.vmap(
        lambda pool, rows: paged_append(
            pool, rows.astype(pool.dtype), table_rows, prefix_len, count=tail_len
        )
    )
    k_pool = write(k_pool, k_new)
    v_pool = write(v_pool, v_new)
    total = prefix_len + tail_len
    cache_lens = cache_lens.at[slots].set(total)
    last_logits = _prefill_last_logits(params, model_cfg, normed, tail_len)
    first_info, rng = _sample_first_tokens(
        first_info, last_logits, slots, rng, temperature, top_p, top_k
    )
    return k_pool, v_pool, cache_lens, first_info, last_logits, rng


def _prefill_extend_slab_fn(
    model_cfg: ModelConfig,
    pfx_bucket: int,  # parked-prefix rows gathered per slot (static bucket)
    params: dict,
    k_cache: jnp.ndarray,  # [L, S, T_alloc, K, Dh]
    v_cache: jnp.ndarray,
    cache_lens: jnp.ndarray,  # [S]
    first_info: jnp.ndarray,  # [S, 2]
    tails: jnp.ndarray,  # [B, Tb]
    tail_lens: jnp.ndarray,  # [B]
    prefix_lens: jnp.ndarray,  # [B]
    slots: jnp.ndarray,  # [B]
    rng: jax.Array,
    temperature: jnp.ndarray,  # [B]
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
):
    """Slab prefix-reuse prefill: gather each parked slot's cached rows,
    run the tails through ``forward_extend`` (attention over
    [prefix | tail]), write the tail K/V at ``prefix_len``, sample first
    tokens. Turn N+1 of a conversation pays only for its new tokens. Tail
    pad rows beyond ``tail_len`` hold pad-token K/V but sit at positions
    >= the recorded cache length — decode overwrites them before any read."""
    from ..models.transformer import forward_extend

    B, Tb = tails.shape
    k_pre = jnp.take(k_cache, slots, axis=1)[:, :, :pfx_bucket]
    v_pre = jnp.take(v_cache, slots, axis=1)[:, :, :pfx_bucket]
    positions = prefix_lens[:, None] + jnp.arange(Tb)[None, :]
    normed, (k_tail, v_tail) = forward_extend(
        params, model_cfg, tails, positions, k_pre, v_pre, prefix_lens,
        skip_unembed=True,
    )
    last_logits = _prefill_last_logits(params, model_cfg, normed, tail_lens)
    k_blk = k_tail.astype(k_cache.dtype)
    v_blk = v_tail.astype(v_cache.dtype)
    for b in range(B):  # B is static (8/4/2/1); contiguous row writes
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_blk[:, b : b + 1], (0, slots[b], prefix_lens[b], 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_blk[:, b : b + 1], (0, slots[b], prefix_lens[b], 0, 0)
        )
    cache_lens = cache_lens.at[slots].set(prefix_lens + tail_lens)
    first_info, rng = _sample_first_tokens(
        first_info, last_logits, slots, rng, temperature, top_p, top_k
    )
    return k_cache, v_cache, cache_lens, first_info, last_logits, rng


def _fork_fn(
    n_forks: int,
    k_cache: jnp.ndarray,  # [L, S, T_alloc, K, Dh]
    v_cache: jnp.ndarray,
    cache_lens: jnp.ndarray,  # [S]
    first_info: jnp.ndarray,  # [S, 2]
    last_logits: jnp.ndarray,  # [V] — prefill logits of the source slot
    src: jnp.ndarray,  # scalar int32
    dsts: jnp.ndarray,  # [F] int32, F == n_forks (all distinct)
    rng: jax.Array,
    temperature: jnp.ndarray,  # [F]
    top_p: jnp.ndarray,  # [F]
    top_k: jnp.ndarray,  # [F]
):
    """Clone a freshly prefilled slot's KV into ``n_forks`` sibling slots and
    sample each sibling's independent first token from the shared prefill
    logits — prefix reuse for GRPO groups (the role vLLM's prefix cache plays
    for the reference, SURVEY.md §2.4)."""
    row_k = jax.lax.dynamic_slice_in_dim(k_cache, src, 1, axis=1)
    row_v = jax.lax.dynamic_slice_in_dim(v_cache, src, 1, axis=1)
    for f in range(n_forks):  # F is static; contiguous row copies
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, row_k, (0, dsts[f], 0, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, row_v, (0, dsts[f], 0, 0, 0)
        )
    cache_lens = cache_lens.at[dsts].set(cache_lens[src])
    logits = jnp.broadcast_to(last_logits[None, :], (n_forks, last_logits.shape[0]))
    rng, sub = jax.random.split(rng)
    tokens, logprobs = sample_masked(logits, sub, temperature, top_p, top_k)
    lp_bits = jax.lax.bitcast_convert_type(logprobs.astype(jnp.float32), jnp.int32)
    first_info = first_info.at[dsts].set(
        jnp.stack([tokens.astype(jnp.int32), lp_bits], axis=-1)
    )
    return k_cache, v_cache, cache_lens, first_info, rng


def _decode_window_paged_fn(
    model_cfg: ModelConfig,
    use_masking: bool,
    n_steps: int,
    use_xla_attn: bool,
    params: dict,
    k_pool: jnp.ndarray,  # [L, NB, BT, K, Dh] page pools
    v_pool: jnp.ndarray,
    tokens: jnp.ndarray,  # [S] — device carry of last sampled tokens
    active: jnp.ndarray,  # [S] bool
    pending_mask: jnp.ndarray,  # [S] bool
    first_info: jnp.ndarray,  # [S, 2]
    cache_lens: jnp.ndarray,  # [S]
    pos_delta: jnp.ndarray,  # [S]
    rng: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
    block_table: jnp.ndarray,  # [S, MAXB] — host snapshot at dispatch
    capacity: jnp.ndarray,  # [S] — reserved tokens per slot
):
    """Paged-layout decode window: same staged-band scan as
    ``_decode_window_fn`` but attention reads the shared page pool — via a
    once-per-window contiguous gather on the XLA path (amortizing the table
    indirection over all n_steps) or through the block table per step on
    the Pallas path — and the window-end merge appends through the table
    (ops/paged_attention.paged_append). Inactive slots append nothing —
    their table rows may already be released."""
    from ..ops.paged_attention import paged_append, paged_decode_attention

    S = tokens.shape[0]
    NB, BT = k_pool.shape[1], k_pool.shape[2]
    MAXB = block_table.shape[1]
    L, K, Dh = k_pool.shape[0], k_pool.shape[3], k_pool.shape[4]
    tokens = jnp.where(pending_mask, first_info[:, 0], tokens)
    base_lens = cache_lens

    if use_xla_attn:
        # Window-amortized contiguous view: gather each slot's pages ONCE
        # per window into a slab-shaped [L, S, T, K, Dh] buffer and run the
        # standard staged attention over it. The pool is frozen for the
        # whole window (new tokens ride the staged band), so the gather is
        # loop-invariant; amortized over n_steps its cost is ~1/W of the
        # per-step table gather the round-3/4 paged path paid — that gather
        # was the measured 0.22x-of-slab throughput cliff (BENCH_r04 era).
        # The host dispatch slices block_table to the pow2-bucketed max
        # pages any active slot holds, so T is the active working set, not
        # the pool-wide max (inactive rows gather arbitrary pages and are
        # fully masked by their lens / discarded by `active`).
        table = jnp.clip(block_table, 0, NB - 1)
        kc = jnp.take(k_pool, table, axis=1).reshape(L, S, MAXB * BT, K, Dh)
        vc = jnp.take(v_pool, table, axis=1).reshape(L, S, MAXB * BT, K, Dh)
        cache_k, cache_v, attn_impl = kc, vc, "xla"
    else:
        def paged_attn(q, k, v, kc, vc, lens, ks, vs, step):
            return paged_decode_attention(
                q, k, v, kc, vc, block_table, lens, ks, vs, step
            )

        cache_k, cache_v, attn_impl = k_pool, v_pool, paged_attn

    k_staged = jnp.zeros((L, n_steps, S, K, Dh), k_pool.dtype)
    v_staged = jnp.zeros((L, n_steps, S, K, Dh), v_pool.dtype)

    def body(carry, step):
        tokens, k_staged, v_staged, rng = carry
        rng, sub = jax.random.split(rng)
        positions = jnp.minimum(base_lens + step, MAXB * BT - 1) + pos_delta
        logits, k_new, v_new = decode_step_staged(
            params, model_cfg, tokens, positions, cache_k, cache_v,
            base_lens, k_staged, v_staged, step, attn_impl=attn_impl,
        )
        k_staged = jax.lax.dynamic_update_slice(
            k_staged, k_new.astype(k_staged.dtype)[:, None], (0, step, 0, 0, 0)
        )
        v_staged = jax.lax.dynamic_update_slice(
            v_staged, v_new.astype(v_staged.dtype)[:, None], (0, step, 0, 0, 0)
        )
        if use_masking:
            new_tokens, logprobs = sample_masked(logits, sub, temperature, top_p, top_k)
        else:
            new_tokens, logprobs = sample_fast(logits, sub, temperature)
        new_tokens = jnp.where(active, new_tokens, tokens)
        return (new_tokens, k_staged, v_staged, rng), (new_tokens, logprobs)

    (tokens, k_staged, v_staged, rng), (win_tokens, win_logprobs) = jax.lax.scan(
        body,
        (tokens, k_staged, v_staged, rng),
        jnp.arange(n_steps, dtype=jnp.int32),
    )
    count = jnp.where(active, n_steps, 0).astype(jnp.int32)
    merge = jax.vmap(
        lambda pool, staged: paged_append(
            pool, staged.transpose(1, 0, 2, 3), block_table, base_lens, count=count
        )
    )
    k_pool = merge(k_pool, k_staged)
    v_pool = merge(v_pool, v_staged)
    cache_lens = jnp.where(
        active, jnp.minimum(base_lens + n_steps, capacity - 1), base_lens
    )
    lp_bits = jax.lax.bitcast_convert_type(win_logprobs.astype(jnp.float32), jnp.int32)
    tok_rows = jnp.concatenate([first_info[None, :, 0], win_tokens], axis=0)
    lp_rows = jnp.concatenate([first_info[None, :, 1], lp_bits], axis=0)
    packed = jnp.stack([tok_rows, lp_rows])  # [2, N+1, S]
    # final carry = device-side last token per slot (see _decode_window_fn)
    return packed, k_pool, v_pool, cache_lens, rng, tokens


def _prefill_paged_fn(
    model_cfg: ModelConfig,
    attn_impl: str,
    params: dict,
    k_pool: jnp.ndarray,  # [L, NB, BT, K, Dh]
    v_pool: jnp.ndarray,
    cache_lens: jnp.ndarray,  # [S]
    first_info: jnp.ndarray,  # [S, 2]
    input_ids: jnp.ndarray,  # [B, P]
    lengths: jnp.ndarray,  # [B]
    slots: jnp.ndarray,  # [B]
    table_rows: jnp.ndarray,  # [B, MAXB] — the admitted rows' fresh pages
    rng: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
):
    """Paged prefill: forward as in ``_prefill_fn``, then append each row's
    prompt K/V into its freshly allocated pages."""
    from ..ops.paged_attention import paged_append

    B, P = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(P)[None, :], (B, P))
    segments = jnp.zeros((B, P), jnp.int32)
    normed, (k_new, v_new) = forward(
        params, model_cfg, input_ids, positions, segments, return_kv=True,
        attn_impl=attn_impl, skip_unembed=True,
    )
    last_logits = _prefill_last_logits(params, model_cfg, normed, lengths)
    return _prefill_commit_paged(
        k_pool, v_pool, cache_lens, first_info,
        last_logits, k_new, v_new, lengths, slots, table_rows,
        rng, temperature, top_p, top_k,
    )


def _prefill_commit_paged(
    k_pool, v_pool, cache_lens, first_info,
    last_logits, k_new, v_new, lengths, slots, table_rows,
    rng, temperature, top_p, top_k,
):
    """Shared paged prefill tail: append each row's K/V into its freshly
    allocated pages, record lengths, sample the first token per row."""
    from ..ops.paged_attention import paged_append

    zero = jnp.zeros_like(lengths)
    write = jax.vmap(
        lambda pool, rows: paged_append(
            pool, rows.astype(pool.dtype), table_rows, zero, count=lengths
        )
    )
    k_pool = write(k_pool, k_new)  # k_new: [L, B, P, K, Dh]
    v_pool = write(v_pool, v_new)
    cache_lens = cache_lens.at[slots].set(lengths)
    first_info, rng = _sample_first_tokens(
        first_info, last_logits, slots, rng, temperature, top_p, top_k
    )
    return k_pool, v_pool, cache_lens, first_info, last_logits, rng


def _copy_pages_fn(
    n_forks: int,
    k_pool: jnp.ndarray,  # [L, NB, BT, K, Dh]
    v_pool: jnp.ndarray,
    src_page: jnp.ndarray,  # scalar int32
    dst_pages: jnp.ndarray,  # [F]
):
    """Copy one physical page to F destinations (the fork's partial-tail
    copy — full pages are shared by refcount, block_pool.fork)."""
    row_k = jax.lax.dynamic_slice_in_dim(k_pool, src_page, 1, axis=1)
    row_v = jax.lax.dynamic_slice_in_dim(v_pool, src_page, 1, axis=1)
    for f in range(n_forks):
        k_pool = jax.lax.dynamic_update_slice_in_dim(
            k_pool, row_k, dst_pages[f], axis=1
        )
        v_pool = jax.lax.dynamic_update_slice_in_dim(
            v_pool, row_v, dst_pages[f], axis=1
        )
    return k_pool, v_pool


def _fork_sample_fn(
    n_forks: int,
    cache_lens: jnp.ndarray,  # [S]
    first_info: jnp.ndarray,  # [S, 2]
    last_logits: jnp.ndarray,  # [V]
    src: jnp.ndarray,  # scalar
    dsts: jnp.ndarray,  # [F]
    rng: jax.Array,
    temperature: jnp.ndarray,  # [F]
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
):
    """Fork bookkeeping minus cache copies (paged layout shares pages via
    the host block table): copy lengths, sample independent first tokens."""
    cache_lens = cache_lens.at[dsts].set(cache_lens[src])
    logits = jnp.broadcast_to(last_logits[None, :], (n_forks, last_logits.shape[0]))
    rng, sub = jax.random.split(rng)
    tokens, logprobs = sample_masked(logits, sub, temperature, top_p, top_k)
    lp_bits = jax.lax.bitcast_convert_type(logprobs.astype(jnp.float32), jnp.int32)
    first_info = first_info.at[dsts].set(
        jnp.stack([tokens.astype(jnp.int32), lp_bits], axis=-1)
    )
    return cache_lens, first_info, rng


def _score_fn(model_cfg: ModelConfig, attn_impl: str, params: dict, input_ids: jnp.ndarray, temperature: float):
    P = input_ids.shape[1]
    positions = jnp.arange(P)[None, :]
    segments = jnp.zeros((1, P), jnp.int32)
    logits = forward(params, model_cfg, input_ids, positions, segments, attn_impl=attn_impl)
    from ..train.rl_loss import token_logprobs_from_logits

    return token_logprobs_from_logits(logits, input_ids, temperature)
