"""Functional transformer models (Qwen2/Qwen3/Llama families) + HF import."""

from .transformer import ModelConfig, forward, init_params  # noqa: F401
from .hf_loader import load_hf_model, load_model_config  # noqa: F401
