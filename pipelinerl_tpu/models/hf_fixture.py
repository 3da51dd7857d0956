"""Build a genuine HF-format checkpoint locally (zero-egress substitute for
downloading Qwen2.5-0.5B-Instruct).

The reference's operational oracle loads a real HF checkpoint — tokenizer
files, chat template, safetensors — through the production path
(`/root/reference/conf/test.yaml:1-27`, vLLM + AutoTokenizer). This builder
produces the same ARTIFACT SHAPE with locally-trained components so the
`hf_loader → engine → actor → trainer → push` system path runs against a
real tokenizer (a `tokenizers`-library BPE with merges, ByteLevel pre-tok,
special tokens), a real ChatML chat template, and real vocab padding
(model vocab padded past `len(tokenizer)`, exercising the `valid_vocab`
logit guard) — everything except pretrained weights, which a zero-egress
environment cannot obtain.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

# Qwen-style ChatML — the template family the reference's chat path uses.
CHATML_TEMPLATE = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' }}"
    "{% if message['content'] is string %}{{ message['content'] }}"
    "{% else %}{% for part in message['content'] %}"
    "{% if part['type'] == 'text' %}{{ part['text'] }}{% endif %}"
    "{% endfor %}{% endif %}"
    "{{ '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)


def _corpus() -> list[str]:
    """Synthetic training text shaped like the hermetic domains' prompts:
    instructions, digits, guessing/bandit phrasing, plain ASCII prose."""
    lines = [
        "say x", "say y", "say z", "Guess the number between 0 and 100.",
        "Too low. Guess again.", "Too high. Guess again.",
        "You guessed it! The number was 42.",
        "How many times does the letter a appear in banana?",
        "The answer is 3.", "system", "user", "assistant",
        "You are a helpful assistant.",
    ]
    for n in range(0, 101):
        lines.append(f"Is it {n}? My guess is {n}.")
    words = (
        "the quick brown fox jumps over a lazy dog while counting letters and "
        "numbers in every answer it gives to each question asked by the user"
    ).split()
    rng = np.random.default_rng(0)
    for _ in range(400):
        k = int(rng.integers(3, 12))
        lines.append(" ".join(rng.choice(words, size=k)))
    return lines


def build_hf_tokenizer(vocab_size: int = 1024):
    """Train a real byte-level BPE (merges and all) on the synthetic corpus
    and wrap it as a PreTrainedTokenizerFast with a ChatML chat template."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size - 3,
        special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(_corpus(), trainer)
    tok.add_special_tokens(["<|endoftext|>", "<|im_start|>", "<|im_end|>"])
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|im_end|>",
        pad_token="<|endoftext|>",
    )
    fast.chat_template = CHATML_TEMPLATE
    return fast


def write_random_hf_checkpoint_7b(
    out_dir: str | Path,
    *,
    shard_bytes: int = 1 << 30,
) -> Path:
    """Write a Qwen2.5-7B-SHAPED sharded safetensors checkpoint (~15.2 GB
    bf16) with random weights, streamed shard-by-shard so peak host RAM is
    one shard. Exercises the 7B disk→host→device path the reference gets
    from HF from_pretrained + vLLM's sharded loader (README.md:42 trains
    real 7B checkpoints; zero egress means weight VALUES are random here,
    but the loader moves the same bytes through the same layout)."""
    import ml_dtypes
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    if (out_dir / "config.json").exists():
        return out_dir  # cached from a previous bench run
    out_dir.mkdir(parents=True, exist_ok=True)

    V, D, I, L, KV_D = 152_064, 3584, 18944, 28, 512
    block = (
        np.random.default_rng(0).standard_normal(1 << 20, dtype=np.float32) * 0.02
    ).astype(ml_dtypes.bfloat16)

    def rand(*shape) -> np.ndarray:
        n = int(np.prod(shape))
        reps = -(-n // block.size)
        return np.tile(block, reps)[:n].reshape(shape)

    def ones(*shape) -> np.ndarray:
        return np.ones(shape, ml_dtypes.bfloat16)

    def specs():
        yield "model.embed_tokens.weight", (V, D), rand
        for i in range(L):
            p = f"model.layers.{i}."
            yield p + "input_layernorm.weight", (D,), ones
            yield p + "post_attention_layernorm.weight", (D,), ones
            yield p + "self_attn.q_proj.weight", (D, D), rand
            yield p + "self_attn.q_proj.bias", (D,), rand
            yield p + "self_attn.k_proj.weight", (KV_D, D), rand
            yield p + "self_attn.k_proj.bias", (KV_D,), rand
            yield p + "self_attn.v_proj.weight", (KV_D, D), rand
            yield p + "self_attn.v_proj.bias", (KV_D,), rand
            yield p + "self_attn.o_proj.weight", (D, D), rand
            yield p + "mlp.gate_proj.weight", (I, D), rand
            yield p + "mlp.up_proj.weight", (I, D), rand
            yield p + "mlp.down_proj.weight", (D, I), rand
        yield "model.norm.weight", (D,), ones
        yield "lm_head.weight", (V, D), rand

    shard: dict[str, np.ndarray] = {}
    shard_sz = 0
    shard_idx = 0

    def flush():
        nonlocal shard, shard_sz, shard_idx
        if not shard:
            return
        shard_idx += 1
        save_file(shard, str(out_dir / f"model-{shard_idx:05d}.safetensors"))
        shard = {}
        shard_sz = 0

    total = 0
    for name, shape, fill in specs():
        arr = fill(*shape)
        if shard_sz + arr.nbytes > shard_bytes and shard:
            flush()
        shard[name] = arr
        shard_sz += arr.nbytes
        total += arr.nbytes
    flush()

    config = {
        "architectures": ["Qwen2ForCausalLM"],
        "model_type": "qwen2",
        "vocab_size": V,
        "hidden_size": D,
        "intermediate_size": I,
        "num_hidden_layers": L,
        "num_attention_heads": 28,
        "num_key_value_heads": 4,
        "head_dim": 128,
        "rope_theta": 1_000_000.0,
        "rms_norm_eps": 1e-6,
        "attention_bias": True,
        "tie_word_embeddings": False,
        "torch_dtype": "bfloat16",
    }
    with open(out_dir / "config.json", "w") as f:
        json.dump(config, f, indent=1)
    logger.info(
        "Wrote 7B-shaped checkpoint: %.1f GB in %d shards at %s",
        total / 1e9, shard_idx, out_dir,
    )
    return out_dir


def build_hf_checkpoint(
    out_dir: str | Path,
    *,
    vocab_size: int = 1024,
    hidden_size: int = 256,
    intermediate_size: int = 512,
    num_layers: int = 4,
    num_heads: int = 4,
    num_kv_heads: int = 2,
    dtype: str = "bfloat16",
    seed: int = 0,
) -> Path:
    """Write an HF checkpoint directory (config.json + model.safetensors +
    tokenizer.json + tokenizer_config.json with chat template) and return
    its path. The model vocab is padded up to a multiple of 128 ABOVE the
    tokenizer's length, so loading it through launch exercises the
    valid_vocab padding guard exactly as a real Qwen checkpoint does
    (Qwen2.5: vocab 151936 model-side vs 151665 tokenizer entries)."""
    import jax
    import jax.numpy as jnp

    from ..train.checkpoints import export_hf
    from .transformer import ModelConfig, init_params

    out_dir = Path(out_dir)
    tokenizer = build_hf_tokenizer(vocab_size)
    n_tok = len(tokenizer)
    padded_vocab = ((n_tok + 127) // 128 + 1) * 128  # strictly above n_tok

    model_cfg = ModelConfig(
        vocab_size=padded_vocab,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_layers=num_layers,
        num_heads=num_heads,
        num_kv_heads=num_kv_heads,
        attention_bias=True,  # Qwen2 family
        rope_theta=1_000_000.0,
        dtype={"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype],
        hf_architecture="Qwen2ForCausalLM",
    )
    params = init_params(jax.random.key(seed), model_cfg)
    ckpt = export_hf(out_dir, params, model_cfg)  # writes out_dir/current
    tokenizer.save_pretrained(str(ckpt))
    # generation_config mirrors real checkpoints (eos used by servers)
    with open(ckpt / "generation_config.json", "w") as f:
        json.dump(
            {"eos_token_id": tokenizer.eos_token_id,
             "pad_token_id": tokenizer.pad_token_id}, f)
    logger.info(
        "Built HF fixture checkpoint at %s: vocab %d (tokenizer %d), "
        "%d layers, hidden %d", ckpt, padded_vocab, n_tok, num_layers,
        hidden_size,
    )
    return ckpt
