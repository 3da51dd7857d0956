"""Checkpointing: orbax training state + HF-format export.

Reference analogue: /root/reference/pipelinerl/finetune/checkpoints.py —
(a) ``finetune/current`` HF-format weights consumable by the inference
engine on restart (checkpoints.py:331-366, atomic tmp+rename), and
(b) ``finetune/training_state`` with optimizer state + counters
(checkpoints.py:225-279). Here (b) is an orbax checkpoint of the
{params, opt_state, metrics} pytree; (a) is a safetensors export in HF
tensor naming (exact inverse of models/hf_loader.py) so any HF consumer —
including our own loader — can read it.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..models.transformer import ModelConfig

_STATE_DIR = "training_state"
_CURRENT_DIR = "current"


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_training_state(
    out_dir: str | Path,
    params: dict,
    opt_state: Any,
    metrics: dict[str, Any],
) -> None:
    """Atomic save of the full training state (orbax)."""
    import orbax.checkpoint as ocp

    out_dir = Path(out_dir).resolve()
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / _STATE_DIR
    tmp = out_dir / (_STATE_DIR + "~tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, {"params": params, "opt_state": opt_state})
        ckptr.wait_until_finished()
    (tmp / "metrics.json").write_text(json.dumps(metrics))
    if path.exists():
        shutil.rmtree(path)
    os.replace(tmp, path)


def save_training_state_host(
    out_dir: str | Path,
    params_np: dict,
    opt_state_np: Any,
    metrics: dict[str, Any],
) -> None:
    """Multi-process save path: the caller has already allgathered the
    sharded trees to host numpy (a collective on every rank); ONE rank
    writes a pickle atomically. Orbax's StandardCheckpointer runs internal
    cross-process barriers, so a single-rank orbax save deadlocks a
    jax.distributed world — hence this host-side format."""
    import pickle

    out_dir = Path(out_dir).resolve()
    path = out_dir / _STATE_DIR
    path.mkdir(parents=True, exist_ok=True)
    tmp = path / "state.pkl~tmp"
    with open(tmp, "wb") as f:
        pickle.dump(
            {"params": params_np, "opt_state": opt_state_np, "metrics": metrics}, f
        )
    os.replace(tmp, path / "state.pkl")
    (path / "metrics.json").write_text(json.dumps(metrics))


def _restore_like(np_tree, like_tree):
    """Put host numpy leaves back onto the template leaves' shardings
    (multi-process safe: global arrays assemble from each process's
    addressable shards)."""

    def put(np_leaf, like_leaf):
        if isinstance(like_leaf, jax.Array) and like_leaf.sharding is not None:
            return jax.make_array_from_callback(
                np_leaf.shape, like_leaf.sharding, lambda idx: np_leaf[idx]
            )
        return np_leaf

    return jax.tree.map(put, np_tree, like_tree)


def load_training_state(
    out_dir: str | Path, params_like: dict, opt_state_like: Any
) -> tuple[dict, Any, dict[str, Any]] | None:
    """Restore (params, opt_state, metrics) or None when absent. The
    ``*_like`` trees provide structure/shape/dtype/sharding templates.
    Reads either the orbax layout or the multi-process pickle layout."""
    path = Path(out_dir).resolve() / _STATE_DIR
    if not path.exists():
        return None
    pkl = path / "state.pkl"
    if pkl.exists():
        import pickle

        with open(pkl, "rb") as f:
            state = pickle.load(f)
        params = _restore_like(state["params"], params_like)
        opt_state = _restore_like(state["opt_state"], opt_state_like)
        return params, opt_state, state["metrics"]
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path, {"params": params_like, "opt_state": opt_state_like}
        )
    metrics = json.loads((path / "metrics.json").read_text())
    return restored["params"], restored["opt_state"], metrics


def export_hf(
    out_dir: str | Path,
    params: dict,
    model_cfg: ModelConfig,
    tokenizer: Any | None = None,
    vision_cfg: Any = None,  # models.vision.VisionConfig, for VLM exports
) -> Path:
    """Write HF-format safetensors + config.json to ``out_dir/current``
    (atomic tmp+rename). Inverse of models/hf_loader.load_hf_model. If
    ``params`` carries a trained ``vision_tower`` (finetune.train_vision_tower),
    its tensors are written under the Qwen2.5-VL ``visual.*`` names so
    models/hf_loader.load_hf_vision round-trips them (the patch embed is
    stored flat [D, patch_dim] — the loader's reshape accepts either the
    Conv3d or the flat layout)."""
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    tmp = out_dir / (_CURRENT_DIR + "~tmp")
    final = out_dir / _CURRENT_DIR
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)

    np_params = _to_numpy_tree(params)
    vision_tower = np_params.pop("vision_tower", None)
    tensors: dict[str, np.ndarray] = {}

    def put(name: str, arr: np.ndarray, transpose: bool = False):
        tensors[name] = np.ascontiguousarray(arr.T if transpose else arr)

    put("model.embed_tokens.weight", np_params["embed"])
    put("model.norm.weight", np_params["final_norm"])
    if "lm_head" in np_params:
        put("lm_head.weight", np_params["lm_head"], transpose=True)
    layers = np_params["layers"]
    mapping = [
        ("input_layernorm.weight", "ln1", False),
        ("post_attention_layernorm.weight", "ln2", False),
        ("self_attn.q_proj.weight", "wq", True),
        ("self_attn.k_proj.weight", "wk", True),
        ("self_attn.v_proj.weight", "wv", True),
        ("self_attn.o_proj.weight", "wo", True),
        ("mlp.gate_proj.weight", "wgate", True),
        ("mlp.up_proj.weight", "wup", True),
        ("mlp.down_proj.weight", "wdown", True),
        ("self_attn.q_proj.bias", "bq", False),
        ("self_attn.k_proj.bias", "bk", False),
        ("self_attn.v_proj.bias", "bv", False),
        ("self_attn.q_norm.weight", "q_norm", False),
        ("self_attn.k_norm.weight", "k_norm", False),
    ]
    for i in range(model_cfg.num_layers):
        for hf_name, our_name, transpose in mapping:
            if our_name not in layers:
                continue
            put(
                f"model.layers.{i}.{hf_name}",
                layers[our_name][i],
                transpose=transpose,
            )

    if vision_tower is not None:
        put("visual.patch_embed.proj.weight", vision_tower["patch_embed"], transpose=True)
        vb = "visual.blocks.{i}."
        vmapping = [
            ("norm1.weight", "ln1", False),
            ("norm2.weight", "ln2", False),
            ("attn.qkv.weight", "wqkv", True),
            ("attn.qkv.bias", "bqkv", False),
            ("attn.proj.weight", "wo", True),
            ("attn.proj.bias", "bo", False),
            ("mlp.gate_proj.weight", "wgate", True),
            ("mlp.gate_proj.bias", "bgate", False),
            ("mlp.up_proj.weight", "wup", True),
            ("mlp.up_proj.bias", "bup", False),
            ("mlp.down_proj.weight", "wdown", True),
            ("mlp.down_proj.bias", "bdown", False),
        ]
        vlayers = vision_tower["layers"]
        depth = vlayers["ln1"].shape[0]
        for i in range(depth):
            for hf_name, our_name, transpose in vmapping:
                put(vb.format(i=i) + hf_name, vlayers[our_name][i], transpose=transpose)
        merger = vision_tower["merger"]
        put("visual.merger.ln_q.weight", merger["ln"])
        put("visual.merger.mlp.0.weight", merger["w1"], transpose=True)
        put("visual.merger.mlp.0.bias", merger["b1"])
        put("visual.merger.mlp.2.weight", merger["w2"], transpose=True)
        put("visual.merger.mlp.2.bias", merger["b2"])

    # bf16 numpy arrays (ml_dtypes) serialize fine through safetensors.numpy
    save_file(tensors, str(tmp / "model.safetensors"))

    arch = model_cfg.hf_architecture or (
        "Qwen2ForCausalLM" if model_cfg.attention_bias else
        ("Qwen3ForCausalLM" if model_cfg.qk_norm else "LlamaForCausalLM")
    )
    config = {
        "architectures": [arch],
        "vocab_size": model_cfg.vocab_size,
        "hidden_size": model_cfg.hidden_size,
        "intermediate_size": model_cfg.intermediate_size,
        "num_hidden_layers": model_cfg.num_layers,
        "num_attention_heads": model_cfg.num_heads,
        "num_key_value_heads": model_cfg.num_kv_heads,
        "head_dim": model_cfg.head_dim_,
        "rope_theta": model_cfg.rope_theta,
        "rms_norm_eps": model_cfg.rms_norm_eps,
        "attention_bias": model_cfg.attention_bias,
        "tie_word_embeddings": model_cfg.tie_word_embeddings,
        "torch_dtype": "bfloat16",
        "model_type": {"Qwen2ForCausalLM": "qwen2", "Qwen3ForCausalLM": "qwen3"}.get(
            arch, "llama"
        ),
    }
    if vision_tower is not None and vision_cfg is not None:
        # vision_config round-trips through models/hf_loader.load_vision_config
        config["vision_config"] = {
            "hidden_size": vision_cfg.hidden_size,
            "intermediate_size": vision_cfg.intermediate_size,
            "num_heads": vision_cfg.num_heads,
            "depth": vision_cfg.depth,
            "out_hidden_size": vision_cfg.out_hidden_size,
            "patch_size": vision_cfg.patch_size,
            "temporal_patch_size": vision_cfg.temporal_patch_size,
            "spatial_merge_size": vision_cfg.spatial_merge_size,
            "window_size": vision_cfg.window_size,
            "fullatt_block_indexes": list(vision_cfg.fullatt_block_indexes),
            "in_channels": vision_cfg.in_channels,
            "tokens_per_second": vision_cfg.tokens_per_second,
        }
        if model_cfg.image_token_id is not None:
            config["image_token_id"] = model_cfg.image_token_id
    (tmp / "config.json").write_text(json.dumps(config, indent=2))
    if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        tokenizer.save_pretrained(tmp)
    if final.exists():
        shutil.rmtree(final)
    os.replace(tmp, final)
    return final
