import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.models.transformer import ModelConfig, forward, init_params
from pipelinerl_tpu.models.hf_loader import load_hf_model
from pipelinerl_tpu.train.checkpoints import (
    export_hf,
    load_training_state,
    save_training_state,
)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, attention_bias=True, dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), cfg)
    return params, cfg


def test_training_state_roundtrip(tmp_path, model):
    params, cfg = model
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    metrics = {"completed_steps": 7, "samples": 123}
    save_training_state(tmp_path, params, opt_state, metrics)

    like_p = jax.tree.map(jnp.zeros_like, params)
    like_o = jax.tree.map(jnp.zeros_like, opt_state)
    restored = load_training_state(tmp_path, like_p, like_o)
    assert restored is not None
    r_params, r_opt, r_metrics = restored
    assert r_metrics == metrics
    chex_all = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), params, r_params
    )
    assert all(jax.tree.leaves(chex_all))
    # overwrite with new state is atomic and reloadable
    save_training_state(tmp_path, r_params, r_opt, {"completed_steps": 8})
    again = load_training_state(tmp_path, like_p, like_o)
    assert again is not None and again[2]["completed_steps"] == 8


def test_load_missing_returns_none(tmp_path, model):
    params, _ = model
    assert load_training_state(tmp_path, params, None) is None


def test_hf_export_roundtrip(tmp_path, model):
    params, cfg = model
    out = export_hf(tmp_path, params, cfg)
    assert (out / "model.safetensors").exists()
    re_params, re_cfg = load_hf_model(out, dtype=jnp.float32)
    assert re_cfg.vocab_size == cfg.vocab_size
    assert re_cfg.attention_bias == cfg.attention_bias

    ids = jnp.asarray(np.arange(1, 9)[None, :], jnp.int32)
    pos = jnp.arange(8)[None, :]
    seg = jnp.zeros((1, 8), jnp.int32)
    a = np.asarray(forward(params, cfg, ids, pos, seg))
    b = np.asarray(forward(re_params, re_cfg, ids, pos, seg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_hf_export_readable_by_transformers(tmp_path, model):
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    params, cfg = model
    out = export_hf(tmp_path, params, cfg)
    hf_model = transformers.AutoModelForCausalLM.from_pretrained(out)
    ids = np.arange(1, 9)[None, :]
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.float().numpy()
    ours = np.asarray(
        forward(
            params, cfg, jnp.asarray(ids), jnp.arange(8)[None, :], jnp.zeros((1, 8), jnp.int32)
        )
    )
    np.testing.assert_allclose(ours, hf_logits, atol=2e-3, rtol=1e-3)
