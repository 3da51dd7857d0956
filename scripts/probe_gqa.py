"""Real-chip probe: GQA-folded Pallas kernel vs pure-JAX blockwise at the
0.5B trainer geometry (H=14, K=2, Dh=64), forward+backward, L=4k/16k."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pipelinerl_tpu.ops.blockwise_attention import mha_packed_blockwise
from pipelinerl_tpu.ops.gqa_attention import mha_packed_gqa
from pipelinerl_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def bench(fn, q, k, v, seg, label):
    def loss(q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t0 = time.monotonic()
    r = g(q, k, v)
    jax.block_until_ready(r)
    compile_s = time.monotonic() - t0
    best = float("inf")
    for _ in range(6):
        t0 = time.monotonic()
        r = g(q, k, v)
        jax.block_until_ready(r)
        best = min(best, time.monotonic() - t0)
    # value fetch guards against deferred-error stale buffers on this backend
    float(jnp.sum(r[0]).astype(jnp.float32))
    print(f"{label}: {1000 * best:.1f} ms f+b (compile {compile_s:.0f}s)", flush=True)
    return best


def main():
    H, K, Dh = 14, 2, 64
    for L in (4096, 16384):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(1, L, H, Dh)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, L, K, Dh)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, L, K, Dh)), jnp.bfloat16)
        seg = jnp.asarray((np.arange(L) // (L // 8)).astype(np.int32))[None]

        t_blk = bench(
            lambda q, k, v: mha_packed_blockwise(q, k, v, seg, seg, 0),
            q, k, v, seg, f"L={L} blockwise",
        )
        for bq, mb in ((256, 512), (512, 256), (256, 256), (128, 512)):
            try:
                t_gqa = bench(
                    lambda q, k, v, bq=bq, mb=mb: mha_packed_gqa(
                        q, k, v, seg, seg, 0, block_q=bq, block_kv=mb
                    ),
                    q, k, v, seg, f"L={L} gqa bq={bq} m={mb}",
                )
                print(f"  -> speedup vs blockwise: {t_blk / t_gqa:.2f}x", flush=True)
            except Exception as e:
                print(f"L={L} gqa bq={bq} m={mb} FAILED: {type(e).__name__}: {e}",
                      flush=True)

        # numeric parity on-chip at 4k
        if L == 4096:
            a = mha_packed_blockwise(q, k, v, seg, seg, 0)
            b = mha_packed_gqa(q, k, v, seg, seg, 0)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
            print(f"L={L} max |blockwise - gqa| = {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
