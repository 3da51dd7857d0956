"""LoRA adapters for the functional transformer.

Reference analogue: /root/reference/pipelinerl/finetune/lora.py (peft). The
functional design differs: adapters are a separate pytree of per-layer
(A, B) factors for the selected projection matrices; the training forward
*merges* W + (alpha/r)·A@B on the fly (one fused matmul per target — cheap
relative to the forward), gradients flow only into the adapter tree, and the
optimizer state covers only adapter params (the point of LoRA). Weight
pushes and HF exports send the merged weights, so the engine and external
consumers never need to know LoRA was involved.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ..models.transformer import ModelConfig

# target name → param key in the layer tree
TARGETS = ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown")


@dataclass(frozen=True)
class LoRAConfig:
    enabled: bool = False
    r: int = 16
    alpha: int = 16
    target_modules: tuple[str, ...] = ("wq", "wv")

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def lora_config_from(cfg: Any) -> LoRAConfig:
    lora = cfg.get("lora") if hasattr(cfg, "get") else None
    if not lora or not lora.get("enabled", False):
        return LoRAConfig()
    targets = tuple(lora.get("target_modules", []) or ("wq", "wv"))
    for t in targets:
        if t not in TARGETS:
            raise ValueError(f"Unknown LoRA target {t!r}; choose from {TARGETS}")
    return LoRAConfig(
        enabled=True,
        r=int(lora.get("r", 16)),
        alpha=int(lora.get("alpha", 16)),
        target_modules=targets,
    )


def init_lora_params(
    rng: jax.Array, params: dict, lora_cfg: LoRAConfig
) -> dict:
    """A ~ N(0, 1/r) and B = 0 (standard LoRA init: adapter starts as a
    no-op). Shapes follow the target weights' [L, in, out]."""
    layers = params["layers"]
    out: dict = {"layers": {}}
    keys = jax.random.split(rng, len(lora_cfg.target_modules))
    for key, name in zip(keys, lora_cfg.target_modules):
        w = layers[name]  # [L, in, out]
        L, d_in, d_out = w.shape
        a = jax.random.normal(key, (L, d_in, lora_cfg.r), jnp.float32) * (
            1.0 / lora_cfg.r
        )
        out["layers"][f"{name}_A"] = a.astype(w.dtype)
        out["layers"][f"{name}_B"] = jnp.zeros((L, lora_cfg.r, d_out), w.dtype)
    return out


def merge_lora(params: dict, lora_params: dict, lora_cfg: LoRAConfig) -> dict:
    """→ params with W + scaling·A@B substituted for each target (jittable)."""
    merged_layers = dict(params["layers"])
    for name in lora_cfg.target_modules:
        a = lora_params["layers"][f"{name}_A"]
        b = lora_params["layers"][f"{name}_B"]
        delta = jnp.einsum(
            "lir,lro->lio", a.astype(jnp.float32), b.astype(jnp.float32)
        ) * lora_cfg.scaling
        merged_layers[name] = (
            params["layers"][name].astype(jnp.float32) + delta
        ).astype(params["layers"][name].dtype)
    merged = dict(params)
    merged["layers"] = merged_layers
    return merged
