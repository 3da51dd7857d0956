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
    # VLM: Qwen2 language trunk + vision tower (models/vision.py); the
    # reference serves it through vLLM for chartqa (SURVEY.md §2.6)
    "Qwen2_5_VLForConditionalGeneration": {"attention_bias": True, "qk_norm": False},
}
_VLM_ARCHS = {"Qwen2_5_VLForConditionalGeneration"}


def load_model_config(model_dir: str | Path, dtype: Any = jnp.bfloat16) -> ModelConfig:
    with open(Path(model_dir) / "config.json") as f:
        hf = json.load(f)
    arch = (hf.get("architectures") or ["?"])[0]
    if arch not in _SUPPORTED_ARCHS:
        raise ValueError(
            f"Unsupported architecture {arch!r}; supported: {sorted(_SUPPORTED_ARCHS)}"
        )
    flags = _SUPPORTED_ARCHS[arch]
    # VLM checkpoints either nest the language config under text_config
    # (current transformers) or keep it flat beside vision_config (original
    # Qwen2.5-VL releases)
    text = {**hf, **hf.get("text_config", {})}
    rope_scaling = text.get("rope_scaling") or {}
    mrope = rope_scaling.get("mrope_section") if rope_scaling.get("type") in (
        "mrope",
        "default",
    ) else None
    return ModelConfig(
        vocab_size=text["vocab_size"],
        hidden_size=text["hidden_size"],
        intermediate_size=text["intermediate_size"],
        num_layers=text["num_hidden_layers"],
        num_heads=text["num_attention_heads"],
        num_kv_heads=text.get("num_key_value_heads", text["num_attention_heads"]),
        head_dim=text.get("head_dim"),
        rope_theta=text.get("rope_theta", 10_000.0),
        rms_norm_eps=text.get("rms_norm_eps", 1e-6),
        attention_bias=text.get("attention_bias", flags["attention_bias"]),
        qk_norm=flags["qk_norm"],
        tie_word_embeddings=text.get("tie_word_embeddings", False),
        mrope_section=tuple(mrope) if mrope else None,
        image_token_id=hf.get("image_token_id"),
        vision_start_token_id=hf.get("vision_start_token_id"),
        vision_end_token_id=hf.get("vision_end_token_id"),
        dtype=dtype,
        hf_architecture=arch,
    )


def load_vision_config(model_dir: str | Path, dtype: Any = jnp.bfloat16):
    """VisionConfig from a VLM checkpoint's config.json (None if text-only)."""
    from .vision import VisionConfig

    with open(Path(model_dir) / "config.json") as f:
        hf = json.load(f)
    vc = hf.get("vision_config")
    if not vc:
        return None
    return VisionConfig(
        hidden_size=vc["hidden_size"],
        intermediate_size=vc["intermediate_size"],
        num_heads=vc["num_heads"],
        depth=vc["depth"],
        out_hidden_size=vc["out_hidden_size"],
        patch_size=vc.get("patch_size", 14),
        temporal_patch_size=vc.get("temporal_patch_size", 2),
        spatial_merge_size=vc.get("spatial_merge_size", 2),
        window_size=vc.get("window_size", 112),
        fullatt_block_indexes=tuple(vc.get("fullatt_block_indexes", (7, 15, 23, 31))),
        in_channels=vc.get("in_channels", 3),
        tokens_per_second=vc.get("tokens_per_second", 4),
        dtype=dtype,
    )


def _normalize_key(name: str) -> str:
    """Map the VLM checkpoint-layout variants onto one canonical scheme:
    language trunk at ``model.layers...``, vision tower at ``visual...``
    (original Qwen2.5-VL releases) — current transformers re-exports them as
    ``model.language_model...`` / ``model.visual...``."""
    if name.startswith("model.language_model."):
        return "model." + name[len("model.language_model.") :]
    if name.startswith("model.visual."):
        return name[len("model.") :]
    return name


def _read_all_tensors(model_dir: Path) -> dict[str, np.ndarray]:
    tensors: dict[str, np.ndarray] = {}
    files = sorted(model_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"No *.safetensors under {model_dir}")
    for file in files:
        with safe_open(file, framework="numpy") as f:
            for name in f.keys():
                tensors[_normalize_key(name)] = f.get_tensor(name)
    return tensors


class _LazyTensors:
    """On-demand safetensors reader: holds only the shard INDEX (name → file)
    and open file handles — each tensor's bytes are read when requested and
    released when the caller drops them. This bounds host-RAM staging to one
    stacked parameter at a time, so a 15 GB 7B checkpoint loads through a
    host with far less free RAM than the checkpoint size (the reference
    leans on HF from_pretrained + vLLM's own sharded loader for this)."""

    def __init__(self, model_dir: Path):
        files = sorted(model_dir.glob("*.safetensors"))
        if not files:
            raise FileNotFoundError(f"No *.safetensors under {model_dir}")
        self._index: dict[str, tuple[Path, str]] = {}
        for file in files:
            with safe_open(file, framework="numpy") as f:
                for name in f.keys():
                    self._index[_normalize_key(name)] = (file, name)
        self._handles: dict[Path, Any] = {}

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def get(self, name: str) -> np.ndarray:
        if name not in self._index:
            raise KeyError(f"Missing tensor {name!r} in checkpoint")
        file, raw_name = self._index[name]
        h = self._handles.get(file)
        if h is None:
            h = self._handles[file] = safe_open(file, framework="numpy")
        return h.get_tensor(raw_name)


def load_hf_model(
    model_dir: str | Path, dtype: Any = jnp.bfloat16
) -> tuple[dict, ModelConfig]:
    """Load an HF checkpoint directory → (params pytree, ModelConfig).

    Tensors stream from disk one stacked parameter at a time (_LazyTensors):
    each layer-stacked matrix is read, stacked on host, put on device, and
    its host copy dropped before the next — peak host staging is one
    parameter (~1 GB for a 7B embed table), not the checkpoint size."""
    model_dir = Path(model_dir)
    cfg = load_model_config(model_dir, dtype)
    raw = _LazyTensors(model_dir)

    def cast(x: np.ndarray) -> jnp.ndarray:
        # Raw tensors may be bf16 (numpy can't represent it — safetensors
        # numpy framework returns them via a uint16 view fallback in older
        # versions; current versions use ml_dtypes bfloat16) — jnp handles it.
        if x.nbytes > (128 << 20):
            from ..inference.weight_transfer import parallel_device_put

            return parallel_device_put(x).astype(dtype)
        return jnp.asarray(x).astype(dtype)

    def get(name: str) -> np.ndarray:
        return raw.get(name)

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


def load_hf_vision(model_dir: str | Path, dtype: Any = jnp.bfloat16):
    """Vision-tower params + VisionConfig from a Qwen2.5-VL checkpoint
    (None, None for text-only models). Weight layout follows the public
    Qwen2.5-VL release: ``visual.blocks.{i}.attn.qkv`` fused projections,
    gated MLP with biases, Conv3d patch embed flattened to a matmul (the
    processor flattens each patch in the same (C, T, P, P) order), RMSNorm
    merger with a 2-layer MLP."""
    model_dir = Path(model_dir)
    vcfg = load_vision_config(model_dir, dtype)
    if vcfg is None:
        return None, None
    raw = _read_all_tensors(model_dir)

    def cast(x: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(x).astype(dtype)

    def get(name: str) -> np.ndarray:
        if name not in raw:
            raise KeyError(f"Missing tensor {name!r} in checkpoint {model_dir}")
        return raw[name]

    L = vcfg.depth

    def stack(fmt: str, transpose: bool = False) -> jnp.ndarray:
        mats = [get(fmt.format(i=i)) for i in range(L)]
        return cast(np.stack([m.T if transpose else m for m in mats]))

    b = "visual.blocks.{i}."
    params = {
        # Conv3d [D, C, T, P, P] → [patch_dim, D] matmul
        "patch_embed": cast(
            get("visual.patch_embed.proj.weight").reshape(vcfg.hidden_size, -1).T
        ),
        "layers": {
            "ln1": stack(b + "norm1.weight"),
            "ln2": stack(b + "norm2.weight"),
            "wqkv": stack(b + "attn.qkv.weight", transpose=True),
            "bqkv": stack(b + "attn.qkv.bias"),
            "wo": stack(b + "attn.proj.weight", transpose=True),
            "bo": stack(b + "attn.proj.bias"),
            "wgate": stack(b + "mlp.gate_proj.weight", transpose=True),
            "bgate": stack(b + "mlp.gate_proj.bias"),
            "wup": stack(b + "mlp.up_proj.weight", transpose=True),
            "bup": stack(b + "mlp.up_proj.bias"),
            "wdown": stack(b + "mlp.down_proj.weight", transpose=True),
            "bdown": stack(b + "mlp.down_proj.bias"),
        },
        "merger": {
            "ln": cast(get("visual.merger.ln_q.weight")),
            "w1": cast(get("visual.merger.mlp.0.weight").T),
            "b1": cast(get("visual.merger.mlp.0.bias")),
            "w2": cast(get("visual.merger.mlp.2.weight").T),
            "b2": cast(get("visual.merger.mlp.2.bias")),
        },
    }
    return params, vcfg
