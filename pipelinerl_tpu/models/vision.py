"""Qwen2.5-VL vision tower as a functional JAX program.

Replaces the torch vision encoder the reference reaches through HF
transformers for the chartqa VLM domain (reference:
pipelinerl/domains/chartqa/chartqa.py:63-83 feeds base64 images to vLLM;
pipelinerl/async_llm.py:242-289 extracts ``pixel_values``/``image_grid_thw``
for the trainer). Architecture facts (patch embed, 2D rotary, window/full
attention schedule, spatial merger) follow the public Qwen2.5-VL model so HF
checkpoints import directly; the implementation is TPU-first:

- **Stacked layer pytree + ``lax.scan``**: one compiled block regardless of
  depth; the window/full attention alternation is a per-layer boolean rider
  on the scan xs selecting between two precomputed segment-id vectors.
- **Window attention = segment-masked attention**: the reference path
  (HF/vLLM) splits the sequence per window and runs varlen flash attention;
  here windows are segment ids over a statically-shaped [N, N] mask —
  identical math, XLA-friendly shapes, no host loop.
- **Host/device split**: the window permutation, rotary (h, w) indices and
  segment ids are tiny integer arrays computed once per image on the host
  (numpy); the jitted tower consumes already-permuted patches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30


@dataclass(frozen=True)
class VisionConfig:
    hidden_size: int
    intermediate_size: int
    num_heads: int
    depth: int
    out_hidden_size: int
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    in_channels: int = 3
    rope_theta: float = 10_000.0
    rms_norm_eps: float = 1e-6
    tokens_per_second: int = 4
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2


def init_vision_params(rng: jax.Array, cfg: VisionConfig) -> dict:
    keys = jax.random.split(rng, 10)
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.depth
    U = cfg.merge_unit * D
    dt = cfg.dtype

    def normal(key, shape, scale):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dt)

    return {
        "patch_embed": normal(keys[0], (cfg.patch_dim, D), cfg.patch_dim**-0.5),
        "layers": {
            "ln1": jnp.ones((L, D), dt),
            "ln2": jnp.ones((L, D), dt),
            "wqkv": normal(keys[1], (L, D, 3 * D), D**-0.5),
            "bqkv": jnp.zeros((L, 3 * D), dt),
            "wo": normal(keys[2], (L, D, D), D**-0.5),
            "bo": jnp.zeros((L, D), dt),
            "wgate": normal(keys[3], (L, D, F), D**-0.5),
            "bgate": jnp.zeros((L, F), dt),
            "wup": normal(keys[4], (L, D, F), D**-0.5),
            "bup": jnp.zeros((L, F), dt),
            "wdown": normal(keys[5], (L, F, D), F**-0.5),
            "bdown": jnp.zeros((L, D), dt),
        },
        "merger": {
            "ln": jnp.ones((D,), dt),
            "w1": normal(keys[6], (U, U), U**-0.5),
            "b1": jnp.zeros((U,), dt),
            "w2": normal(keys[7], (U, cfg.out_hidden_size), U**-0.5),
            "b2": jnp.zeros((cfg.out_hidden_size,), dt),
        },
    }


# ---------------------------------------------------------------------------
# host-side geometry: window permutation, rotary indices, segment ids
# ---------------------------------------------------------------------------


@dataclass
class VisionMeta:
    """Per-batch-of-images geometry, computed host-side in numpy.

    All patch-indexed arrays are in the *window-permuted* order the tower
    consumes; ``inv_perm`` maps merged-token outputs back to raster order.
    """

    perm: np.ndarray  # [n_units] permutation of merge units (raster → window)
    inv_perm: np.ndarray  # [n_units]
    hw: np.ndarray  # [N, 2] (h, w) rotary indices per patch, permuted order
    win_seg: np.ndarray  # [N] window segment id per patch
    full_seg: np.ndarray  # [N] image segment id per patch
    n_patches: int
    n_tokens: int  # n_patches // merge_unit


def vision_meta(grid_thw: np.ndarray, cfg: VisionConfig) -> VisionMeta:
    """Geometry for a batch of images/videos described by [n, 3] (t, h, w)
    patch grids. Mirrors the semantics of the public Qwen2.5-VL
    ``rot_pos_emb``/``get_window_index`` (raster patches are grouped into
    spatial_merge_size² units; units are tiled into window_size//patch_size
    spatial windows per frame, truncated at image edges)."""
    m = cfg.spatial_merge_size
    unit = cfg.merge_unit
    win = cfg.window_size // m // cfg.patch_size  # units per window side

    perms: list[np.ndarray] = []
    hw_list: list[np.ndarray] = []
    win_seg: list[np.ndarray] = []
    full_seg: list[np.ndarray] = []
    unit_base = 0
    window_id = 0
    frame_id = 0
    for t, h, w in np.asarray(grid_thw).reshape(-1, 3):
        gh, gw = h // m, w // m  # merged-token grid
        # (h, w) rotary indices per patch in unit-grouped order: units scan
        # (gh, gw); patches inside a unit scan (m, m).
        hpos = np.broadcast_to(np.arange(h).reshape(gh, m, 1, 1), (gh, m, gw, m))
        wpos = np.broadcast_to(np.arange(w).reshape(1, 1, gw, m), (gh, m, gw, m))
        hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
        wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
        hw = np.stack([hpos, wpos], axis=-1)  # [h*w, 2]
        hw_list.append(np.tile(hw, (int(t), 1)))

        # window tiling over the merged-token grid, truncated at edges
        nwh, nww = -(-gh // win), -(-gw // win)
        unit_index = np.arange(t * gh * gw).reshape(t, gh, gw)
        for ti in range(int(t)):
            for wh in range(nwh):
                for ww in range(nww):
                    block = unit_index[
                        ti, wh * win : (wh + 1) * win, ww * win : (ww + 1) * win
                    ].reshape(-1)
                    perms.append(block + unit_base)
                    win_seg.append(np.full(block.size * unit, window_id))
                    window_id += 1
            # full attention spans one temporal frame (reference cu_seqlens
            # repeat h*w per t)
            full_seg.append(np.full(gh * gw * unit, frame_id))
            frame_id += 1
        unit_base += int(t) * gh * gw

    perm = np.concatenate(perms)
    inv_perm = np.argsort(perm)
    hw_raster = np.concatenate(hw_list)  # unit-grouped raster order
    n_units = perm.size
    # permute patch-level arrays by unit
    patch_perm = (perm[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    return VisionMeta(
        perm=perm,
        inv_perm=inv_perm,
        hw=hw_raster[patch_perm],
        win_seg=np.concatenate(win_seg),
        full_seg=np.concatenate(full_seg)[patch_perm],
        n_patches=n_units * unit,
        n_tokens=n_units,
    )


def permute_patches(patches: np.ndarray, meta: VisionMeta, cfg: VisionConfig) -> np.ndarray:
    """Reorder raster-order patches [N, patch_dim] into window order."""
    unit = cfg.merge_unit
    n_units = patches.shape[0] // unit
    grouped = patches.reshape(n_units, unit, -1)
    return grouped[meta.perm].reshape(patches.shape[0], -1)


def prepare_vision_inputs(
    pixels: np.ndarray,  # [N, patch_dim] raster order (HF pixel_values)
    grid_thw: np.ndarray,  # [n_images, 3]
    cfg: VisionConfig,
    unit_buckets: tuple[int, ...] = (64, 256, 1024, 4096),
) -> dict:
    """Host prep for the jitted tower with STATIC shapes: window-permute the
    patches, then pad to a merged-token bucket so image-size variety does not
    recompile (pad patches form their own attention segments, id −1, and the
    pad output tokens are never consumed). Returns the tower's array inputs
    plus ``n_tokens`` (real merged tokens). Used by both the engine prefill
    and the trainer forward."""
    grid_thw = np.asarray(grid_thw, np.int64).reshape(-1, 3)
    meta = vision_meta(grid_thw, cfg)
    permuted = permute_patches(np.asarray(pixels, np.float32), meta, cfg)
    unit = cfg.merge_unit
    u_bucket = meta.n_tokens
    for b in unit_buckets:
        if b >= meta.n_tokens:
            u_bucket = b
            break
    N_b = u_bucket * unit
    patches_p = np.zeros((N_b, permuted.shape[1]), np.float32)
    patches_p[: meta.n_patches] = permuted
    hw_p = np.zeros((N_b, 2), np.int32)
    hw_p[: meta.n_patches] = meta.hw
    win_p = np.full(N_b, -1, np.int32)
    win_p[: meta.n_patches] = meta.win_seg
    full_p = np.full(N_b, -1, np.int32)
    full_p[: meta.n_patches] = meta.full_seg
    inv_p = np.arange(u_bucket, dtype=np.int32)
    inv_p[: meta.n_tokens] = meta.inv_perm
    return {
        "patches": patches_p,
        "hw": hw_p,
        "win_seg": win_p,
        "full_seg": full_p,
        "inv_perm": inv_p,
        "n_tokens": meta.n_tokens,
    }


# ---------------------------------------------------------------------------
# jitted tower
# ---------------------------------------------------------------------------


def _rms_norm(x, weight, eps):
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def _vision_rope(hw: jnp.ndarray, head_dim: int, theta: float):
    """2D rotary: half the rotary channels carry the h index, half the w
    index. hw [N, 2] → cos/sin [N, head_dim] in rotate-half layout."""
    dim = head_dim // 2  # rotary dim per (cos, sin) copy
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    fh = hw[:, 0].astype(jnp.float32)[:, None] * inv_freq  # [N, dim/2]
    fw = hw[:, 1].astype(jnp.float32)[:, None] * inv_freq
    freqs = jnp.concatenate([fh, fw], axis=-1)  # [N, dim]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [N, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x, cos, sin):
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * cos[:, None, :] + rotated * sin[:, None, :]).astype(x.dtype)


def _segment_attention(q, k, v, seg, scale):
    """Non-causal attention masked to same-segment pairs.
    q/k/v [N, H, Dh], seg [N] → [N, H, Dh]."""
    mask = seg[:, None] == seg[None, :]
    scores = jnp.einsum(
        "nhd,mhd->hnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask[None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "hnm,mhd->nhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def vision_forward(
    params: dict,
    cfg: VisionConfig,
    patches: jnp.ndarray,  # [N, patch_dim] — window-permuted order
    hw: jnp.ndarray,  # [N, 2] int32
    win_seg: jnp.ndarray,  # [N] int32
    full_seg: jnp.ndarray,  # [N] int32
    inv_perm: jnp.ndarray,  # [n_units] int32
) -> jnp.ndarray:
    """Encode patches → merged visual tokens [N // merge_unit, out_hidden],
    in raster order (ready to splice into the language model)."""
    D, H = cfg.hidden_size, cfg.num_heads
    Dh = cfg.head_dim
    x = (patches.astype(jnp.float32) @ params["patch_embed"].astype(jnp.float32)).astype(
        cfg.dtype
    )
    cos, sin = _vision_rope(hw, Dh, cfg.rope_theta)
    is_full = (
        jnp.zeros((cfg.depth,), bool)
        .at[np.asarray(cfg.fullatt_block_indexes, np.int32)]
        .set(True)
    )
    scale = Dh**-0.5

    def layer_fn(h, inputs):
        layer, full = inputs
        seg = jnp.where(full, full_seg, win_seg)
        normed = _rms_norm(h, layer["ln1"], cfg.rms_norm_eps)
        qkv = normed @ layer["wqkv"] + layer["bqkv"]
        q, k, v = [
            t.reshape(-1, H, Dh) for t in jnp.split(qkv, 3, axis=-1)
        ]
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        attn = _segment_attention(q, k, v, seg, scale).reshape(-1, D)
        h = h + attn @ layer["wo"] + layer["bo"]
        normed2 = _rms_norm(h, layer["ln2"], cfg.rms_norm_eps)
        mlp = (
            jax.nn.silu(normed2 @ layer["wgate"] + layer["bgate"])
            * (normed2 @ layer["wup"] + layer["bup"])
        ) @ layer["wdown"] + layer["bdown"]
        return h + mlp, None

    x, _ = jax.lax.scan(layer_fn, x, (params["layers"], is_full))

    # merger: per-patch RMSNorm, group merge_unit patches, 2-layer MLP
    x = _rms_norm(x, params["merger"]["ln"], 1e-6)
    x = x.reshape(-1, cfg.merge_unit * D)
    x = jax.nn.gelu(x @ params["merger"]["w1"] + params["merger"]["b1"], approximate=False)
    x = x @ params["merger"]["w2"] + params["merger"]["b2"]
    return jnp.take(x, inv_perm, axis=0)  # back to raster order


def encode_images(
    params: dict,
    cfg: VisionConfig,
    patches: np.ndarray,  # [N, patch_dim] raster order (HF pixel_values layout)
    grid_thw: np.ndarray,  # [n_images, 3]
) -> jnp.ndarray:
    """Host-convenience wrapper: geometry + permutation + jitted tower."""
    meta = vision_meta(grid_thw, cfg)
    permuted = permute_patches(np.asarray(patches), meta, cfg)
    return vision_forward(
        params,
        cfg,
        jnp.asarray(permuted),
        jnp.asarray(meta.hw, jnp.int32),
        jnp.asarray(meta.win_seg, jnp.int32),
        jnp.asarray(meta.full_seg, jnp.int32),
        jnp.asarray(meta.inv_perm, jnp.int32),
    )
