"""Decode-path profiling probe: where do the ms/step go?

The axon tunnel RTT is ~25 ms, so every ablation is wrapped in a
lax.scan of N iterations inside ONE dispatch; per-step cost =
(t(2N) - t(N)) / N to cancel dispatch+fetch overhead.
Run ALONE on the TPU (tunnel discipline — see .claude/skills/verify).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from pipelinerl_tpu.models.transformer import (
    ModelConfig, _mlp, _project_qkv, apply_rope, init_params, rms_norm,
    rope_cos_sin, unembed)
from pipelinerl_tpu.ops.attention import decode_attention
from pipelinerl_tpu.ops.sampling import sample_fast

S, T = 64, 328
L, K, Dh = 24, 2, 64

model_cfg = ModelConfig(
    vocab_size=151_936, hidden_size=896, intermediate_size=4864,
    num_layers=24, num_heads=14, num_kv_heads=2, head_dim=64,
    rope_theta=1e6, attention_bias=True, dtype=jnp.bfloat16,
)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.monotonic()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    return best


def scanned(body, init, n):
    def run(carry):
        return jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=n)[0]
    return jax.jit(run), init


def per_step(body, init, n=8):
    f1, init1 = scanned(body, init, n)
    f2, _ = scanned(body, init, 2 * n)
    t1, t2 = timed(f1, init1), timed(f2, init1)
    return (t2 - t1) / n


def main():
    import os
    sections = set(os.environ.get("PROBE", "fwd,noattn,unembed,sample,scatter,attn").split(","))
    params = init_params(jax.random.key(0), model_cfg)
    k_cache = jnp.zeros((L, S, T, K, Dh), jnp.bfloat16)
    v_cache = jnp.zeros((L, S, T, K, Dh), jnp.bfloat16)
    cache_lens = jnp.full((S,), 200, jnp.int32)
    tokens = jnp.zeros((S,), jnp.int32)
    rng = jax.random.key(1)
    temp = jnp.ones((S,), jnp.float32)

    cos, sin = rope_cos_sin(cache_lens, model_cfg.head_dim_, model_cfg.rope_theta)

    # --- full layer stack (attention + matmuls), no unembed -----------------
    def fwd(x):
        def layer_fn(h, inputs):
            layer, kc, vc = inputs
            normed = rms_norm(h, layer["ln1"], model_cfg.rms_norm_eps)
            q, k, v = _project_qkv(layer, model_cfg, normed)
            q = apply_rope(q, cos, sin); k = apply_rope(k, cos, sin)
            attn = decode_attention(q, k, v, kc, vc, cache_lens)
            h = h + attn.reshape(h.shape[0], model_cfg.q_dim) @ layer["wo"]
            h = h + _mlp(layer, rms_norm(h, layer["ln2"], model_cfg.rms_norm_eps))
            return h, None
        x, _ = jax.lax.scan(layer_fn, x, (params["layers"], k_cache, v_cache))
        return x

    x0 = jnp.zeros((S, model_cfg.hidden_size), jnp.bfloat16)
    if "fwd" in sections: print(f"layers fwd:       {per_step(fwd, x0)*1e3:7.3f} ms/step", flush=True)

    # --- layer stack without attention (pure matmuls) -----------------------
    def fwd_noattn(x):
        def layer_fn(h, layer):
            normed = rms_norm(h, layer["ln1"], model_cfg.rms_norm_eps)
            q, k, v = _project_qkv(layer, model_cfg, normed)
            attn = jnp.repeat(v, model_cfg.num_heads // K, axis=1)  # fake
            h = h + attn.reshape(h.shape[0], model_cfg.q_dim) @ layer["wo"]
            h = h + _mlp(layer, rms_norm(h, layer["ln2"], model_cfg.rms_norm_eps))
            return h, None
        x, _ = jax.lax.scan(layer_fn, x, params["layers"])
        return x

    if "noattn" in sections: print(f"layers no-attn:   {per_step(fwd_noattn, x0)*1e3:7.3f} ms/step", flush=True)

    # --- unembed + sample ----------------------------------------------------
    def unemb(x):
        logits = unembed(params, model_cfg, x)
        return (x + logits[:, :model_cfg.hidden_size].astype(x.dtype) * 1e-6)

    if "unembed" in sections: print(f"unembed:          {per_step(unemb, x0)*1e3:7.3f} ms/step", flush=True)

    logits0 = jnp.zeros((S, model_cfg.vocab_size), jnp.float32)

    def samp(carry):
        lg, rng = carry
        rng, sub = jax.random.split(rng)
        toks, lps = sample_fast(lg, sub, temp)
        return (lg + lps[:, None] * 1e-9, rng)

    if "sample" in sections: print(f"sample_fast:      {per_step(samp, (logits0, rng))*1e3:7.3f} ms/step", flush=True)

    # --- cache scatter --------------------------------------------------------
    idx = jnp.arange(S)
    k_new = jnp.zeros((L, S, K, Dh), jnp.bfloat16)

    def scat(carry):
        kc, vc, lens = carry
        wp = jnp.clip(lens, 0, T - 1)
        kc = kc.at[:, idx, wp].set(k_new)
        vc = vc.at[:, idx, wp].set(k_new)
        return (kc, vc, (lens + 1) % (T - 1))

    if "scatter" in sections: print(f"kv scatter:       {per_step(scat, (k_cache, v_cache, cache_lens))*1e3:7.3f} ms/step", flush=True)

    # --- attention only -------------------------------------------------------
    q0 = jnp.zeros((S, model_cfg.num_heads, Dh), jnp.bfloat16)
    kn0 = jnp.zeros((S, K, Dh), jnp.bfloat16)

    def attn_only(q):
        def body(qq, inputs):
            kc, vc = inputs
            o = decode_attention(qq, kn0, kn0, kc, vc, cache_lens)
            return o.astype(qq.dtype), None
        o, _ = jax.lax.scan(body, q, (k_cache, v_cache))
        return o

    if "attn" in sections: print(f"attn x24 layers:  {per_step(attn_only, q0)*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
