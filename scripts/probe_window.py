"""Single-compile decode-window ablation: VARIANT env var picks one modified
32-step window; report (wall - RTT)/steps. Variants:

  base       — exact engine window
  bf16attn   — attention QK/PV on bf16 MXU path (f32 accumulate)
  noscatter  — skip the per-step KV cache writes
  nounembed  — skip unembed+sampling (feed back a fake token)
  nosample   — unembed, but argmax instead of sample_fast
  noattn     — skip attention entirely (matmul skeleton + unembed + sample)
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pipelinerl_tpu.models.transformer import (
    ModelConfig, _mlp, _project_qkv, apply_rope, init_params, rms_norm,
    rope_cos_sin, unembed)
from pipelinerl_tpu.ops.sampling import sample_fast

S, T, WINDOW = 64, 328, 32
L, K, Dh = 24, 2, 64
VARIANT = os.environ.get("VARIANT", "base")

model_cfg = ModelConfig(
    vocab_size=151_936, hidden_size=896, intermediate_size=4864,
    num_layers=24, num_heads=14, num_kv_heads=2, head_dim=64,
    rope_theta=1e6, attention_bias=True, dtype=jnp.bfloat16,
)

_NEG_INF = -1e30


def attn_f32(q, k_new, v_new, kc, vc, cache_lens):
    Sq, H, _ = q.shape
    G = H // K
    qh = q.reshape(Sq, K, G, Dh).astype(jnp.float32) * Dh**-0.5
    scores = jnp.einsum("skgd,stkd->skgt", qh, kc.astype(jnp.float32))
    valid = jnp.arange(T)[None, :] < cache_lens[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, _NEG_INF)
    s_self = jnp.einsum("skgd,skd->skg", qh, k_new.astype(jnp.float32))
    all_scores = jnp.concatenate([scores, s_self[..., None]], axis=-1)
    probs = jax.nn.softmax(all_scores, axis=-1)
    out = jnp.einsum("skgt,stkd->skgd", probs[..., :T], vc.astype(jnp.float32)) \
        + probs[..., T:] * v_new[:, :, None, :].astype(jnp.float32)
    return out.reshape(Sq, H, Dh).astype(q.dtype)


def attn_bf16(q, k_new, v_new, kc, vc, cache_lens):
    Sq, H, _ = q.shape
    G = H // K
    qh = (q.astype(jnp.float32) * Dh**-0.5).astype(jnp.bfloat16).reshape(Sq, K, G, Dh)
    scores = jnp.einsum("skgd,stkd->skgt", qh, kc,
                        preferred_element_type=jnp.float32)
    valid = jnp.arange(T)[None, :] < cache_lens[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, _NEG_INF)
    s_self = jnp.einsum("skgd,skd->skg", qh.astype(jnp.float32),
                        k_new.astype(jnp.float32))
    m = jnp.maximum(jnp.max(scores, axis=-1), s_self)
    p = jnp.exp(scores - m[..., None])
    p_self = jnp.exp(s_self - m)
    denom = jnp.sum(p, axis=-1) + p_self
    out = jnp.einsum("skgt,stkd->skgd", p.astype(jnp.bfloat16), vc,
                     preferred_element_type=jnp.float32)
    out = out + p_self[..., None] * v_new[:, :, None, :].astype(jnp.float32)
    out = out / denom[..., None]
    return out.reshape(Sq, H, Dh).astype(q.dtype)


def window(params, k_cache, v_cache, tokens, cache_lens, rng, temp):
    idx = jnp.arange(S)

    def body(carry, _):
        tokens, cache_lens, k_cache, v_cache, rng = carry
        rng, sub = jax.random.split(rng)
        x = jnp.take(params["embed"], tokens, axis=0)
        cos, sin = rope_cos_sin(cache_lens, Dh, model_cfg.rope_theta)

        def layer_fn(h, inputs):
            layer, kc, vc = inputs
            normed = rms_norm(h, layer["ln1"], model_cfg.rms_norm_eps)
            q, k, v = _project_qkv(layer, model_cfg, normed)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if VARIANT == "noattn":
                attn = jnp.repeat(v, model_cfg.num_heads // K, axis=1)
            elif VARIANT == "bf16attn":
                attn = attn_bf16(q, k, v, kc, vc, cache_lens)
            else:
                attn = attn_f32(q, k, v, kc, vc, cache_lens)
            h = h + attn.reshape(h.shape[0], model_cfg.q_dim) @ layer["wo"]
            h = h + _mlp(layer, rms_norm(h, layer["ln2"], model_cfg.rms_norm_eps))
            return h, (k, v)

        x, (k_new, v_new) = jax.lax.scan(
            layer_fn, x, (params["layers"], k_cache, v_cache))

        if VARIANT != "noscatter":
            wp = jnp.clip(cache_lens, 0, T - 1)
            k_cache = k_cache.at[:, idx, wp].set(k_new.astype(k_cache.dtype))
            v_cache = v_cache.at[:, idx, wp].set(v_new.astype(v_cache.dtype))

        if VARIANT == "nounembed":
            new_tokens = (tokens + x[:, 0].astype(jnp.int32) % 7 + 1) % 151000
            lps = jnp.zeros((S,), jnp.float32)
        else:
            logits = unembed(params, model_cfg, x)
            if VARIANT == "nosample":
                new_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                lps = jnp.max(logits, axis=-1)
            else:
                new_tokens, lps = sample_fast(logits, sub, temp)
        cache_lens = jnp.minimum(cache_lens + 1, T - 1)
        return (new_tokens, cache_lens, k_cache, v_cache, rng), (new_tokens, lps)

    (tokens, cache_lens, k_cache, v_cache, rng), (wt, wl) = jax.lax.scan(
        body, (tokens, cache_lens, k_cache, v_cache, rng), None, length=WINDOW)
    return wt, k_cache, v_cache, cache_lens, rng


def main():
    params = init_params(jax.random.key(0), model_cfg)
    k_cache = jnp.zeros((L, S, T, K, Dh), jnp.bfloat16)
    v_cache = jnp.zeros((L, S, T, K, Dh), jnp.bfloat16)
    tokens = jnp.zeros((S,), jnp.int32)
    cache_lens = jnp.full((S,), 200, jnp.int32)
    rng = jax.random.key(1)
    temp = jnp.ones((S,), jnp.float32)

    fn = jax.jit(window, donate_argnums=(1, 2))
    t0 = time.monotonic()
    out = fn(params, k_cache, v_cache, tokens, cache_lens, rng, temp)
    np.asarray(out[0])
    print(f"[{VARIANT}] compile+first: {time.monotonic()-t0:.1f}s", flush=True)

    best = 1e9
    for _ in range(6):
        wt, k, v, lens, rng = out
        lens = jnp.full((S,), 200, jnp.int32)  # keep window in-bounds
        t0 = time.monotonic()
        out = fn(params, k, v, tokens, lens, rng, temp)
        np.asarray(out[0])
        best = min(best, time.monotonic() - t0)
    rtt = 25.6e-3
    print(f"[{VARIANT}] window: {best*1e3:.1f} ms  ->  "
          f"{(best-rtt)/WINDOW*1e3:.3f} ms/step (device)", flush=True)


if __name__ == "__main__":
    main()
