"""Probe: where the 16k train step spends its time (VERDICT r03 weak #6:
train16k_mfu 15.0% vs 29.8% at 4k, no profile).

Phases isolated at L=16384 on the 0.5B bench shape:
  1. attention kernel alone (fwd+bwd) across block_q x block_kv tiles
  2. transformer forward+backward WITHOUT the unembed (skip_unembed)
  3. chunked unembed+logsumexp alone across logits_chunk sizes
  4. full rl_loss grad+adamw step for the best candidates

Accounting note: the bench MFU formula counts 6N FLOPs/token; at 16k the
causal attention (~2.8 GF/tok incl. remat) and remat re-forward (~1.3)
roughly double the true work, so even a perfectly efficient step reads as
~21% "MFU" at the 4k step's hardware efficiency. This probe separates real
kernel regressions from that accounting artifact.

Run ALONE on the TPU: python scripts/probe_16k.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

L = 16384


def timeit(fn, *args, n=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from pipelinerl_tpu.models.transformer import ModelConfig, forward, init_params
    from pipelinerl_tpu.ops.blockwise_attention import mha_packed_blockwise
    from pipelinerl_tpu.train.rl_loss import RLLossConfig, rl_loss
    from pipelinerl_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model_cfg = ModelConfig(
        vocab_size=151_936, hidden_size=896, intermediate_size=4864,
        num_layers=24, num_heads=14, num_kv_heads=2, head_dim=64,
        rope_theta=1e6, attention_bias=True, dtype=jnp.bfloat16,
    )
    params = init_params(jax.random.key(0), model_cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model {n_params/1e9:.2f}B params", flush=True)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 100_000, (1, L)).astype(np.int32)
    seg = (np.arange(L) // (L // 8)).astype(np.int32)[None]
    pos = (np.arange(L) % (L // 8)).astype(np.int32)[None]

    # ---- phase 1: attention kernel alone (fwd+bwd) ----------------------
    H, K, Dh = 14, 2, 64
    q = jnp.asarray(rng.normal(size=(1, L, H, Dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, L, K, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, L, K, Dh)), jnp.bfloat16)
    segj = jnp.asarray(seg)

    for bq, bkv in [(256, 512), (512, 512), (512, 1024), (1024, 1024),
                    (256, 1024), (128, 512)]:
        def attn_loss(q_, k_, v_):
            o = mha_packed_blockwise(q_, k_, v_, segj, segj, 0, None, bkv, bq)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(attn_loss, argnums=(0, 1, 2)))
        dt = timeit(g, q, k, v)
        # per-layer fwd+bwd attention flops (causal ~L/2 avg)
        fl = 2 * 4 * (L / 2) * L * H * Dh * 3  # qk+pv fwd x3 for bwd
        print(f"attn bq={bq} bkv={bkv}: {dt*1e3:.1f} ms  (~{fl/dt/1e12:.1f} TF/s)",
              flush=True)

    # ---- phase 2: trunk fwd+bwd without unembed -------------------------
    def trunk_loss(p):
        h = forward(
            p, model_cfg, jnp.asarray(ids), jnp.asarray(pos), segj,
            remat=True, attn_impl="blockwise", skip_unembed=True,
        )
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g2 = jax.jit(jax.grad(trunk_loss))
    dt = timeit(g2, params, n=2)
    print(f"trunk grad (no unembed, remat, blockwise): {dt*1e3:.1f} ms", flush=True)

    # ---- phase 3: chunked unembed+logsumexp alone -----------------------
    h = jnp.asarray(rng.normal(size=(1, L, 896)), jnp.bfloat16)
    labels = jnp.asarray(ids)

    for chunk in (1024, 2048, 4096, 8192):
        def head_loss(p, h_):
            from pipelinerl_tpu.models.transformer import lm_head_logits

            def body(carry, xs):
                hc, lc = xs
                logits = lm_head_logits(p, model_cfg, hc)
                lse = jax.nn.logsumexp(logits, axis=-1)
                sel = jnp.take_along_axis(logits, lc[..., None], axis=-1)[..., 0]
                return carry + jnp.sum(sel - lse), None

            hs = h_.reshape(-1, chunk, 896)
            ls = labels.reshape(-1, chunk)
            tot, _ = jax.lax.scan(
                jax.checkpoint(body), jnp.zeros((), jnp.float32), (hs, ls)
            )
            return tot

        g3 = jax.jit(jax.grad(head_loss, argnums=(0, 1)))
        dt = timeit(g3, params, h, n=2)
        print(f"unembed chunk={chunk}: {dt*1e3:.1f} ms", flush=True)

    # ---- phase 4: full step for candidate configs -----------------------
    loss_cfg = RLLossConfig(policy_loss="reinforce", batch_size=8, max_segments=64)
    optimizer = optax.adamw(1e-5)
    opt_state = jax.jit(optimizer.init)(params)
    batch = {
        "input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids),
        "position_ids": jnp.asarray(pos), "segment_ids": segj,
        "rewards": jnp.ones((1, L), jnp.float32),
        "advantages": jnp.ones((1, L), jnp.float32),
        "ref_logprobs": jnp.zeros((1, L), jnp.float32),
        "old_logprobs": jnp.full((1, L), -1.0, jnp.float32),
        "group_tokens": jnp.full((1, L), float(L // 8), jnp.float32),
        "num_labels": jnp.full((1, L), float(L // 8), jnp.float32),
        "overflow": jnp.zeros((1, L), jnp.float32),
    }

    def make_attn(bq, bkv):
        def attn(q_, k_, v_, seg_, pos_=None, scale=None):
            return mha_packed_blockwise(q_, k_, v_, seg_, seg_, 0, scale, bkv, bq)

        return attn

    for label, impl, chunk in [
        ("blockwise-default, chunk 2048", "blockwise", 2048),
        ("blockwise-default, chunk 4096", "blockwise", 4096),
        ("bq512-bkv1024, chunk 4096", make_attn(512, 1024), 4096),
        ("bq1024-bkv1024, chunk 4096", make_attn(1024, 1024), 4096),
    ]:
        @jax.jit
        def step(p, o, b, _impl=impl, _chunk=chunk):
            def loss_fn(pp):
                return rl_loss(
                    pp, model_cfg, loss_cfg, b, jnp.zeros(()), 100, jnp.zeros(()),
                    remat=True, attn_impl=_impl, logits_chunk=_chunk,
                )

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, o2 = optimizer.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, loss

        t0 = time.monotonic()
        p2, o2, loss = step(params, opt_state, batch)
        jax.block_until_ready(loss)
        compile_s = time.monotonic() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            p2, o2, loss = step(p2, o2, batch)
            jax.block_until_ready(loss)
            best = min(best, time.monotonic() - t0)
        mfu = (L / best) * 6 * n_params / (197.0e12)
        print(
            f"full step [{label}]: {best*1e3:.1f} ms  ({L/best:.0f} tok/s, "
            f"counted-MFU {100*mfu:.1f}%)  [compile {compile_s:.0f}s]",
            flush=True,
        )
        del p2, o2


if __name__ == "__main__":
    main()
