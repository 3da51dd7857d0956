"""Import HuggingFace checkpoints (config.json + safetensors) into the
functional param pytree — no torch involved; tensors are read directly from
safetensors into numpy and stacked along the layer dim.

Supports the families the reference trains (Qwen2/Qwen2.5, Qwen3, Llama —
reference default ``model_path: Qwen/Qwen2.5-7B``, conf/base.yaml:91).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np
from safetensors import safe_open

from .transformer import ModelConfig

_SUPPORTED_ARCHS = {
    "Qwen2ForCausalLM": {"attention_bias": True, "qk_norm": False},
    "Qwen3ForCausalLM": {"attention_bias": False, "qk_norm": True},
    "LlamaForCausalLM": {"attention_bias": False, "qk_norm": False},
    "MistralForCausalLM": {"attention_bias": False, "qk_norm": False},
}


def load_model_config(model_dir: str | Path, dtype: Any = jnp.bfloat16) -> ModelConfig:
    with open(Path(model_dir) / "config.json") as f:
        hf = json.load(f)
    arch = (hf.get("architectures") or ["?"])[0]
    if arch not in _SUPPORTED_ARCHS:
        raise ValueError(
            f"Unsupported architecture {arch!r}; supported: {sorted(_SUPPORTED_ARCHS)}"
        )
    flags = _SUPPORTED_ARCHS[arch]
    return ModelConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf.get("head_dim"),
        rope_theta=hf.get("rope_theta", 10_000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        attention_bias=hf.get("attention_bias", flags["attention_bias"]),
        qk_norm=flags["qk_norm"],
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        dtype=dtype,
        hf_architecture=arch,
    )


def _read_all_tensors(model_dir: Path) -> dict[str, np.ndarray]:
    tensors: dict[str, np.ndarray] = {}
    files = sorted(model_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"No *.safetensors under {model_dir}")
    for file in files:
        with safe_open(file, framework="numpy") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)
    return tensors


def load_hf_model(
    model_dir: str | Path, dtype: Any = jnp.bfloat16
) -> tuple[dict, ModelConfig]:
    """Load an HF checkpoint directory → (params pytree, ModelConfig)."""
    model_dir = Path(model_dir)
    cfg = load_model_config(model_dir, dtype)
    raw = _read_all_tensors(model_dir)

    def cast(x: np.ndarray) -> jnp.ndarray:
        # Raw tensors may be bf16 (numpy can't represent it — safetensors
        # numpy framework returns them via a uint16 view fallback in older
        # versions; current versions use ml_dtypes bfloat16) — jnp handles it.
        return jnp.asarray(x).astype(dtype)

    def get(name: str) -> np.ndarray:
        if name not in raw:
            raise KeyError(f"Missing tensor {name!r} in checkpoint {model_dir}")
        return raw[name]

    L = cfg.num_layers

    def stack(fmt: str, transpose: bool = False) -> jnp.ndarray:
        mats = [get(fmt.format(i=i)) for i in range(L)]
        arr = np.stack([m.T if transpose else m for m in mats])
        return cast(arr)

    p = "model.layers.{i}."
    layers = {
        "ln1": stack(p + "input_layernorm.weight"),
        "ln2": stack(p + "post_attention_layernorm.weight"),
        # HF linear weights are [out, in]; the pytree stores [in, out].
        "wq": stack(p + "self_attn.q_proj.weight", transpose=True),
        "wk": stack(p + "self_attn.k_proj.weight", transpose=True),
        "wv": stack(p + "self_attn.v_proj.weight", transpose=True),
        "wo": stack(p + "self_attn.o_proj.weight", transpose=True),
        "wgate": stack(p + "mlp.gate_proj.weight", transpose=True),
        "wup": stack(p + "mlp.up_proj.weight", transpose=True),
        "wdown": stack(p + "mlp.down_proj.weight", transpose=True),
    }
    if cfg.attention_bias:
        layers["bq"] = stack(p + "self_attn.q_proj.bias")
        layers["bk"] = stack(p + "self_attn.k_proj.bias")
        layers["bv"] = stack(p + "self_attn.v_proj.bias")
    if cfg.qk_norm:
        layers["q_norm"] = stack(p + "self_attn.q_norm.weight")
        layers["k_norm"] = stack(p + "self_attn.k_norm.weight")

    params = {
        "embed": cast(get("model.embed_tokens.weight")),
        "layers": layers,
        "final_norm": cast(get("model.norm.weight")),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = cast(get("lm_head.weight").T)
    return params, cfg
