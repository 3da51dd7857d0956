"""Logit parity of the functional JAX transformer vs HuggingFace torch models.

Tiny randomly-initialized checkpoints are saved with transformers and loaded
through pipelinerl_tpu.models.hf_loader; fp32 end-to-end so differences are
pure implementation error (target: <1e-3 max abs diff on logits).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pipelinerl_tpu.models import load_hf_model
from pipelinerl_tpu.models.transformer import decode_step, forward

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _make_hf_checkpoint(tmp_path, arch: str, tie: bool):
    kwargs = dict(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=tie,
    )
    if arch == "qwen2":
        config = transformers.Qwen2Config(**kwargs)
        model_cls = transformers.Qwen2ForCausalLM
    elif arch == "qwen3":
        config = transformers.Qwen3Config(**kwargs, head_dim=16)
        model_cls = transformers.Qwen3ForCausalLM
    elif arch == "llama":
        config = transformers.LlamaConfig(**kwargs, attention_bias=False)
        model_cls = transformers.LlamaForCausalLM
    else:
        raise ValueError(arch)
    torch.manual_seed(0)
    model = model_cls(config)
    model.eval()
    out_dir = tmp_path / f"hf_{arch}"
    model.save_pretrained(out_dir, safe_serialization=True)
    return model, out_dir


@pytest.mark.parametrize(
    "arch,tie",
    [("qwen2", False), ("qwen2", True), ("qwen3", False), ("llama", False)],
)
def test_forward_matches_hf(tmp_path, arch, tie):
    hf_model, out_dir = _make_hf_checkpoint(tmp_path, arch, tie)
    params, cfg = load_hf_model(out_dir, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    T = 24
    input_ids = rng.integers(0, cfg.vocab_size, size=(1, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(input_ids)).logits.float().numpy()

    position_ids = np.arange(T)[None, :]
    segment_ids = np.zeros((1, T), dtype=np.int32)
    logits = np.asarray(
        forward(params, cfg, jnp.asarray(input_ids), jnp.asarray(position_ids), jnp.asarray(segment_ids))
    )
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=1e-3)


def test_packed_forward_equals_separate(tmp_path):
    """Packing two sequences into one row must give the same logits as running
    them separately — the segment-mask contract."""
    _, out_dir = _make_hf_checkpoint(tmp_path, "qwen2", tie=False)
    params, cfg = load_hf_model(out_dir, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    a = rng.integers(0, cfg.vocab_size, size=10)
    b = rng.integers(0, cfg.vocab_size, size=14)

    def single(ids):
        T = len(ids)
        return np.asarray(
            forward(
                params,
                cfg,
                jnp.asarray(ids)[None, :],
                jnp.arange(T)[None, :],
                jnp.zeros((1, T), jnp.int32),
            )
        )[0]

    logits_a, logits_b = single(a), single(b)

    packed_ids = np.concatenate([a, b])[None, :]
    packed_pos = np.concatenate([np.arange(10), np.arange(14)])[None, :]
    packed_seg = np.concatenate([np.zeros(10), np.ones(14)])[None, :].astype(np.int32)
    packed = np.asarray(
        forward(params, cfg, jnp.asarray(packed_ids), jnp.asarray(packed_pos), jnp.asarray(packed_seg))
    )[0]
    np.testing.assert_allclose(packed[:10], logits_a, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(packed[10:], logits_b, atol=1e-3, rtol=1e-3)


def test_decode_matches_forward(tmp_path):
    """Prefill + token-by-token decode must reproduce the full-forward logits."""
    _, out_dir = _make_hf_checkpoint(tmp_path, "qwen2", tie=False)
    params, cfg = load_hf_model(out_dir, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    T = 12
    ids = rng.integers(0, cfg.vocab_size, size=T)
    full_logits = np.asarray(
        forward(
            params,
            cfg,
            jnp.asarray(ids)[None, :],
            jnp.arange(T)[None, :],
            jnp.zeros((1, T), jnp.int32),
        )
    )[0]

    # prefill the first 6 tokens, then decode the rest one at a time
    n_prefill = 6
    prefill_logits, kv = forward(
        params,
        cfg,
        jnp.asarray(ids[:n_prefill])[None, :],
        jnp.arange(n_prefill)[None, :],
        jnp.zeros((1, n_prefill), jnp.int32),
        return_kv=True,
    )
    k_pre, v_pre = kv  # [L, 1, n_prefill, K, Dh]
    S, T_max = 2, 32  # two slots; put our sequence in slot 1
    L, K, Dh = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim_
    k_cache = jnp.zeros((L, S, T_max, K, Dh), jnp.float32)
    v_cache = jnp.zeros((L, S, T_max, K, Dh), jnp.float32)
    k_cache = k_cache.at[:, 1, :n_prefill].set(k_pre[:, 0])
    v_cache = v_cache.at[:, 1, :n_prefill].set(v_pre[:, 0])
    cache_lens = jnp.array([0, n_prefill], jnp.int32)

    np.testing.assert_allclose(
        np.asarray(prefill_logits)[0], full_logits[:n_prefill], atol=1e-3, rtol=1e-3
    )

    for t in range(n_prefill, T):
        tokens = jnp.array([0, ids[t]], jnp.int32)
        positions = jnp.array([0, t], jnp.int32)
        logits, k_new, v_new = decode_step(
            params, cfg, tokens, positions, k_cache, v_cache, cache_lens
        )
        np.testing.assert_allclose(
            np.asarray(logits)[1], full_logits[t], atol=1e-3, rtol=1e-3
        )
        # engine-side cache write
        k_cache = k_cache.at[:, jnp.arange(S), cache_lens].set(k_new)
        v_cache = v_cache.at[:, jnp.arange(S), cache_lens].set(v_new)
        cache_lens = cache_lens + jnp.array([0, 1])
