"""Functional decoder-only transformer for the Qwen2/Qwen3/Llama families.

TPU-first design decisions (vs the reference's HF-transformers torch models,
/root/reference/pipelinerl/finetune/checkpoints.py:151-222):

- **Pure pytree params + ``lax.scan`` over stacked layers**: one compiled
  layer body regardless of depth; layer params carry a leading layer dim.
- **Packed rows, static shapes**: the training/prefill forward consumes
  [B, L] with segment ids; positions restart per sequence. No attention-mask
  tensors — masking is derived from segment/position ids inside the op.
- **FP32 output head**: the final ``lm_head`` matmul and logits are fp32 on
  both trainer and sampler, reproducing the reference's bf16-with-fp32-head
  contract (vllm_quantization.py:128-209, finetune/checkpoints.py:44-105) so
  sampling logprobs match training logprobs bit-for-bit across stages.
- **Decode is scatter-free inside the layer scan**: the new token's K/V ride
  alongside the cache (see ops/attention.decode_attention); the engine
  scatters the stacked per-layer K/V into the cache once per step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import decode_attention, mha_packed


@dataclass(frozen=True)
class ModelConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int | None = None
    rope_theta: float = 10_000.0
    rms_norm_eps: float = 1e-6
    attention_bias: bool = False  # True for Qwen2-family q/k/v projections
    qk_norm: bool = False  # True for Qwen3 per-head q/k RMSNorm
    tie_word_embeddings: bool = False
    dtype: Any = jnp.bfloat16
    # name of the HF architecture this config was imported from (if any)
    hf_architecture: str | None = None
    # multimodal rotary sections (t, h, w) over head_dim/2 channels — set for
    # Qwen2.5-VL-family models; None means standard 1D rope
    mrope_section: tuple[int, ...] | None = None
    # VLM special tokens (image placeholder expansion / mrope indexing)
    image_token_id: int | None = None
    vision_start_token_id: int | None = None
    vision_end_token_id: int | None = None
    # tokenizer entry count when smaller than vocab_size (padded checkpoints
    # like Qwen2.5: 151,936 logit rows vs ~151,643 tokenizer entries). The
    # sampler excludes ids >= valid_vocab from the candidate set so an
    # untrained padding row can never be emitted (reference patches them
    # post-hoc instead: preprocess.py:107 replace_oov_tokens_with_the).
    valid_vocab: int | None = None

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim_

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim_


def init_params(rng: jax.Array, cfg: ModelConfig) -> dict:
    """Random init (scaled normal) — used by tests and from-scratch training."""
    keys = jax.random.split(rng, 12)
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    L, Dh = cfg.num_layers, cfg.head_dim_
    dt = cfg.dtype

    def normal(key, shape, scale):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dt)

    layers = {
        "ln1": jnp.ones((L, D), dt),
        "ln2": jnp.ones((L, D), dt),
        "wq": normal(keys[0], (L, D, cfg.q_dim), D**-0.5),
        "wk": normal(keys[1], (L, D, cfg.kv_dim), D**-0.5),
        "wv": normal(keys[2], (L, D, cfg.kv_dim), D**-0.5),
        "wo": normal(keys[3], (L, cfg.q_dim, D), cfg.q_dim**-0.5),
        "wgate": normal(keys[4], (L, D, F), D**-0.5),
        "wup": normal(keys[5], (L, D, F), D**-0.5),
        "wdown": normal(keys[6], (L, F, D), F**-0.5),
    }
    if cfg.attention_bias:
        layers["bq"] = jnp.zeros((L, cfg.q_dim), dt)
        layers["bk"] = jnp.zeros((L, cfg.kv_dim), dt)
        layers["bv"] = jnp.zeros((L, cfg.kv_dim), dt)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, Dh), dt)
        layers["k_norm"] = jnp.ones((L, Dh), dt)
    params = {
        "embed": normal(keys[7], (V, D), 0.02 / 0.02 * 0.02),
        "layers": layers,
        "final_norm": jnp.ones((D,), dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = normal(keys[8], (D, V), D**-0.5)
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [.., head_dim] in the HF rotate-half layout."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., Dh/2]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def mrope_cos_sin(
    positions: jnp.ndarray,  # [3, ...] — (t, h, w) position rows
    head_dim: int,
    theta: float,
    section: tuple[int, ...],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multimodal 3D rope (Qwen2.5-VL): rotary channels are partitioned into
    (t, h, w) sections of ``section`` channels each (per cos/sin half); text
    tokens carry equal rows so this reduces to standard rope. Returns
    cos/sin [...  , head_dim] matching ``apply_rope``'s rotate-half layout."""
    cos3, sin3 = rope_cos_sin(positions, head_dim, theta)  # [3, ..., Dh]
    sel = np.zeros((3, head_dim), np.float32)
    offset = 0
    for i, width in enumerate(list(section) * 2):
        sel[i % 3, offset : offset + width] = 1.0
        offset += width
    assert offset == head_dim, f"mrope sections {section} do not fill head_dim {head_dim}"
    sel_arr = jnp.asarray(sel)
    shape = (3,) + (1,) * (cos3.ndim - 2) + (head_dim,)
    cos = jnp.sum(cos3 * sel_arr.reshape(shape), axis=0)
    sin = jnp.sum(sin3 * sel_arr.reshape(shape), axis=0)
    return cos, sin


def positional_cos_sin(
    cfg: "ModelConfig", position_ids: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch standard vs multimodal rope on the position-id rank: a
    leading axis of size 3 carries (t, h, w) mrope rows."""
    if cfg.mrope_section is not None and position_ids.ndim >= 2 and position_ids.shape[0] == 3:
        return mrope_cos_sin(position_ids, cfg.head_dim_, cfg.rope_theta, cfg.mrope_section)
    return rope_cos_sin(position_ids, cfg.head_dim_, cfg.rope_theta)


def splice_image_embeds(
    x: jnp.ndarray,  # [B, L, D] token embeddings
    image_embeds: jnp.ndarray,  # [B, M, D] visual tokens (padded)
    image_mask: jnp.ndarray,  # [B, L] bool — image placeholder positions
) -> jnp.ndarray:
    """Replace embeddings at placeholder positions with visual tokens, in
    order (k-th masked position ← k-th visual token). Static-shape scatter:
    a cumulative count over the mask indexes the visual rows."""
    idx = jnp.cumsum(image_mask.astype(jnp.int32), axis=1) - 1  # [B, L]
    idx = jnp.clip(idx, 0, image_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(
        image_embeds.astype(x.dtype), idx[..., None], axis=1
    )
    return jnp.where(image_mask[..., None], gathered, x)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """x: [..., heads, Dh]; cos/sin: broadcastable [..., Dh] (no head dim)."""
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    return (xf * cos + rotated * sin).astype(x.dtype)


def _project_qkv(layer: dict, cfg: ModelConfig, x: jnp.ndarray):
    """x: [..., D] → q [..., H, Dh], k/v [..., K, Dh]."""
    q = x @ layer["wq"]
    k = x @ layer["wk"]
    v = x @ layer["wv"]
    if "bq" in layer:
        q = q + layer["bq"]
        k = k + layer["bk"]
        v = v + layer["bv"]
    Dh = cfg.head_dim_
    q = q.reshape(*x.shape[:-1], cfg.num_heads, Dh)
    k = k.reshape(*x.shape[:-1], cfg.num_kv_heads, Dh)
    v = v.reshape(*x.shape[:-1], cfg.num_kv_heads, Dh)
    if cfg.qk_norm:
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    return q, k, v


def _mlp(layer: dict, x: jnp.ndarray) -> jnp.ndarray:
    return (jax.nn.silu(x @ layer["wgate"]) * (x @ layer["wup"])) @ layer["wdown"]


def lm_head_logits(params: dict, cfg: ModelConfig, x_normed: jnp.ndarray) -> jnp.ndarray:
    """FP32 lm_head over already-final-norm'd hidden states.

    ``cfg.valid_vocab``: padded-checkpoint logit rows (ids >= tokenizer
    entries) are masked to a large negative here — the single funnel every
    consumer shares (engine sampler, engine score_tokens, trainer rl_loss),
    so sampler and trainer logprobs stay exactly consistent while untrained
    padding ids can never be sampled (reference analogue:
    preprocess.py:107 replace_oov_tokens_with_the)."""
    if cfg.tie_word_embeddings:
        w = params["embed"].astype(jnp.float32).T
    else:
        w = params["lm_head"].astype(jnp.float32)
    logits = jnp.dot(x_normed.astype(jnp.float32), w, preferred_element_type=jnp.float32)
    if cfg.valid_vocab is not None and cfg.valid_vocab < cfg.vocab_size:
        logits = jnp.where(
            jnp.arange(cfg.vocab_size) < cfg.valid_vocab, logits, -1e30
        )
    return logits


def unembed(params: dict, cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Final norm + FP32 lm_head. Returns fp32 logits."""
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return lm_head_logits(params, cfg, x)


# ---------------------------------------------------------------------------
# forward (training / prefill)
# ---------------------------------------------------------------------------


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,  # [B, L]
    position_ids: jnp.ndarray,  # [B, L], or [3, B, L] for mrope (VLM)
    segment_ids: jnp.ndarray,  # [B, L]
    return_kv: bool = False,
    remat: bool | str = False,  # True=full per-layer; "mlp"=selective (MLP only)
    return_hidden: bool = False,
    attn_impl: str = "xla",  # "xla" | "flash" (Pallas splash kernel)
    image_embeds: jnp.ndarray | None = None,  # [B, M, D] visual tokens
    image_mask: jnp.ndarray | None = None,  # [B, L] bool placeholder positions
    skip_unembed: bool = False,
):
    """Full forward over a packed row. Returns fp32 logits [B, L, V]; with
    ``return_kv`` also the per-layer keys/values [L, B, T, K, Dh] (prefill).

    ``skip_unembed`` returns the final-norm'd HIDDEN [B, L, D] in the logits
    slot instead: prefill callers only need one position's logits, and the
    full [B, L, V] fp32 unembed is the dominant memory/FLOP cost at long
    buckets (a [8, 4096, 152k] fp32 tensor is 20 GB — over v5e HBM)."""
    x = jnp.take(params["embed"], input_ids, axis=0)
    if image_embeds is not None:
        x = splice_image_embeds(x, image_embeds, image_mask)
    cos, sin = positional_cos_sin(cfg, position_ids)

    if callable(attn_impl):
        _attn = attn_impl  # e.g. parallel.cp_attention.make_cp_attention(...)
    elif attn_impl == "flash":
        from ..ops.flash_attention import mha_packed_flash as _attn
    elif attn_impl == "blockwise":
        from ..ops.blockwise_attention import mha_packed_blockwise_simple as _attn
    elif attn_impl == "gqa":
        from ..ops.gqa_attention import mha_packed_gqa_simple as _attn
    else:
        _attn = mha_packed

    # attention masking wants the [B, L] token-order positions; mrope's
    # 3-row positions are only a rope concern
    if position_ids.ndim == 3:
        position_ids = position_ids[0]

    def layer_fn(h, layer):
        normed = rms_norm(h, layer["ln1"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(layer, cfg, normed)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = _attn(q, k, v, segment_ids, position_ids)
        attn_flat = attn.reshape(*h.shape[:-1], cfg.q_dim)
        h = h + attn_flat @ layer["wo"]
        if remat == "mlp":
            # selective remat: recompute only the MLP (the dominant
            # activation memory: [L, intermediate] silu/gate products) and
            # keep the attention sublayer's residuals — re-running the
            # blockwise attention forward in the backward pass costs
            # ~20 ms/layer at L=16k (70% of the step was attention;
            # scripts/probe_16k.py), while its residuals are only
            # ~100 MB/layer at 16k
            mlp_fn = jax.checkpoint(
                lambda hh, ly: _mlp(ly, rms_norm(hh, ly["ln2"], cfg.rms_norm_eps))
            )
            h = h + mlp_fn(h, layer)
        else:
            h = h + _mlp(layer, rms_norm(h, layer["ln2"], cfg.rms_norm_eps))
        return h, (k, v) if return_kv else None

    if remat is True:
        layer_fn = jax.checkpoint(layer_fn)
    x, kv = jax.lax.scan(layer_fn, x, params["layers"])
    hidden = x
    if skip_unembed:
        logits = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    else:
        logits = unembed(params, cfg, x)
    outs = [logits]
    if return_kv:
        outs.append(kv)
    if return_hidden:
        outs.append(hidden)
    return outs[0] if len(outs) == 1 else tuple(outs)


def forward_extend(
    params: dict,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,  # [B, Lt] — tail tokens (padded bucket)
    position_ids: jnp.ndarray,  # [B, Lt] — absolute positions (prefix_len + i)
    k_prefix: jnp.ndarray,  # [L, B, Pfx, K, Dh] — cached prefix K (rope applied)
    v_prefix: jnp.ndarray,
    prefix_len: jnp.ndarray,  # [B] — valid prefix tokens (rest of Pfx is pad)
    block_kv: int = 512,
    skip_unembed: bool = False,
):
    """Chunked prefill against a cached prefix (cross-request prefix reuse,
    the role vLLM's prefix cache plays for the reference, SURVEY.md §2.4):
    compute only the tail's layers, attending over [prefix | tail].

    Masking rides the blockwise kernel's segment+flat-index contract: tail
    queries sit at global indices Pfx..Pfx+Lt (``q_offset=Pfx``), so every
    prefix key (index < Pfx) is visible and tail causality is exact; prefix
    PAD keys (index >= prefix_len) are masked by a segment mismatch. Tail pad
    tokens sit after valid ones — causally invisible to them.

    Returns (fp32 logits [B, Lt, V], (k_tail, v_tail) [L, B, Lt, K, Dh])."""
    from ..ops.blockwise_attention import mha_packed_blockwise

    B, Lt = input_ids.shape
    Pfx = k_prefix.shape[2]
    x = jnp.take(params["embed"], input_ids, axis=0)
    cos, sin = positional_cos_sin(cfg, position_ids)

    q_seg = jnp.zeros((B, Lt), jnp.int32)
    pre_seg = jnp.where(
        jnp.arange(Pfx)[None, :] < prefix_len[:, None], 0, 1
    ).astype(jnp.int32)
    kv_seg = jnp.concatenate([pre_seg, q_seg], axis=1)  # [B, Pfx+Lt]

    def layer_fn(h, inputs):
        layer, k_pre, v_pre = inputs
        normed = rms_norm(h, layer["ln1"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(layer, cfg, normed)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k_all = jnp.concatenate([k_pre.astype(k.dtype), k], axis=1)
        v_all = jnp.concatenate([v_pre.astype(v.dtype), v], axis=1)
        attn = mha_packed_blockwise(
            q, k_all, v_all, q_seg, kv_seg, Pfx, None, block_kv
        )
        h = h + attn.reshape(*h.shape[:-1], cfg.q_dim) @ layer["wo"]
        h = h + _mlp(layer, rms_norm(h, layer["ln2"], cfg.rms_norm_eps))
        return h, (k, v)

    x, kv = jax.lax.scan(layer_fn, x, (params["layers"], k_prefix, v_prefix))
    if skip_unembed:
        return rms_norm(x, params["final_norm"], cfg.rms_norm_eps), kv
    return unembed(params, cfg, x), kv


# ---------------------------------------------------------------------------
# decode step (inference hot path)
# ---------------------------------------------------------------------------


def decode_step(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [S] — current token per slot
    positions: jnp.ndarray,  # [S] — its position per slot
    k_cache: jnp.ndarray,  # [L, S, T, K, Dh]
    v_cache: jnp.ndarray,  # [L, S, T, K, Dh]
    cache_lens: jnp.ndarray,  # [S] — number of cached tokens per slot
):
    """One decode step for all slots. Returns (fp32 logits [S, V],
    k_new [L, S, K, Dh], v_new [L, S, K, Dh]); the caller scatters the new
    K/V into the cache at ``cache_lens`` and bumps the lengths."""
    x = jnp.take(params["embed"], tokens, axis=0)  # [S, D]
    cos, sin = rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta)  # [S, Dh]

    def layer_fn(h, inputs):
        layer, kc, vc = inputs
        normed = rms_norm(h, layer["ln1"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(layer, cfg, normed)  # [S, H/K, Dh]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = decode_attention(q, k, v, kc, vc, cache_lens)
        h = h + attn.reshape(h.shape[0], cfg.q_dim) @ layer["wo"]
        h = h + _mlp(layer, rms_norm(h, layer["ln2"], cfg.rms_norm_eps))
        return h, (k, v)

    x, (k_new, v_new) = jax.lax.scan(layer_fn, x, (params["layers"], k_cache, v_cache))
    logits = unembed(params, cfg, x)
    return logits, k_new, v_new


def decode_step_staged(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [S]
    positions: jnp.ndarray,  # [S] — base_lens + step
    k_cache: jnp.ndarray,  # [L, S, T, K, Dh] — frozen during the window
    v_cache: jnp.ndarray,
    base_lens: jnp.ndarray,  # [S] — cache lengths at window start
    k_staged: jnp.ndarray,  # [L, W, S, K, Dh] — this window's earlier tokens
    v_staged: jnp.ndarray,
    step: jnp.ndarray,  # scalar — index within the window
    attn_impl="xla",  # "xla" | "ragged" (Pallas) | callable with the same
    # signature as ops/attention.decode_attention_staged (the engine's paged
    # layout closes a block table over it, inference/engine.py)
):
    """One decode step attending over frozen cache + staged band (see
    ops/attention.decode_attention_staged). Returns (fp32 logits [S, V],
    k_new [L, S, K, Dh], v_new [L, S, K, Dh]); the caller stages the new
    K/V and merges the band into the cache once per window."""
    from ..ops.attention import decode_attention_staged

    x = jnp.take(params["embed"], tokens, axis=0)  # [S, D]
    cos, sin = rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta)  # [S, Dh]

    if callable(attn_impl):
        _attn = attn_impl
    elif attn_impl == "ragged":
        from ..ops.decode_attention import decode_attention_staged_ragged as _attn
    else:
        _attn = decode_attention_staged

    def layer_fn(h, inputs):
        layer, kc, vc, ks, vs = inputs
        normed = rms_norm(h, layer["ln1"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(layer, cfg, normed)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = _attn(q, k, v, kc, vc, base_lens, ks, vs, step)
        h = h + attn.reshape(h.shape[0], cfg.q_dim) @ layer["wo"]
        h = h + _mlp(layer, rms_norm(h, layer["ln2"], cfg.rms_norm_eps))
        return h, (k, v)

    x, (k_new, v_new) = jax.lax.scan(
        layer_fn, x, (params["layers"], k_cache, v_cache, k_staged, v_staged)
    )
    logits = unembed(params, cfg, x)
    return logits, k_new, v_new


def param_count(params: dict) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# value head (PPO actor-critic; reference finetune/value_model.py:40-211)
# ---------------------------------------------------------------------------


def init_value_head(rng: jax.Array, cfg: ModelConfig) -> dict:
    """A linear head over the final hidden state → scalar value per token."""
    w = (jax.random.normal(rng, (cfg.hidden_size, 1), jnp.float32) * cfg.hidden_size**-0.5)
    return {"w": w.astype(cfg.dtype), "b": jnp.zeros((1,), cfg.dtype)}


def value_predictions(value_head: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """hidden [B, L, D] → values [B, L] (fp32)."""
    out = hidden.astype(jnp.float32) @ value_head["w"].astype(jnp.float32)
    return out[..., 0] + value_head["b"].astype(jnp.float32)[0]
