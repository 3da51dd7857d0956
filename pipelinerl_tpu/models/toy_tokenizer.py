"""A deterministic byte-level tokenizer with a minimal chat template.

Used by hermetic tests and tiny from-scratch training runs where downloading
a real HF tokenizer is impossible (zero-egress environment). Implements the
``TokenizerLike`` protocol of inference/client.py and enough of the HF
tokenizer surface (eos_token_id, apply_chat_template, decode, encode).

Vocab: ids 0-255 are raw bytes; specials follow.
Template (char-level):
    <|im_start|>role\\n content <|im_end|> per message;
    add_generation_prompt appends "<|im_start|>assistant\\n".
"""

from __future__ import annotations

from typing import Sequence

BYTE_VOCAB = 256
IM_START = 256
IM_END = 257
EOS = 257  # <|im_end|> doubles as EOS, Qwen-style
PAD = 258
VOCAB_SIZE = 260  # small headroom


class ToyTokenizer:
    eos_token_id = EOS
    pad_token_id = PAD
    eos_token = "<|im_end|>"
    vocab_size = VOCAB_SIZE

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        return list(text.encode("utf-8", errors="replace"))

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = False) -> str:
        out: list[str] = []
        byte_run: list[int] = []

        def flush():
            if byte_run:
                out.append(bytes(byte_run).decode("utf-8", errors="replace"))
                byte_run.clear()

        for i in ids:
            i = int(i)
            if 0 <= i < BYTE_VOCAB:
                byte_run.append(i)
            else:
                flush()
                if not skip_special_tokens:
                    out.append(
                        {IM_START: "<|im_start|>", IM_END: "<|im_end|>", PAD: "<|pad|>"}.get(
                            i, f"<|{i}|>"
                        )
                    )
        flush()
        return "".join(out)

    def apply_chat_template(
        self,
        conversation: list[dict],
        add_generation_prompt: bool = False,
        tokenize: bool = True,
        **kwargs,
    ):
        ids: list[int] = []
        for msg in conversation:
            ids.append(IM_START)
            ids.extend(self.encode(f"{msg['role']}\n"))
            ids.extend(self.encode(str(msg.get("content") or "")))
            ids.append(IM_END)
        if add_generation_prompt:
            ids.append(IM_START)
            ids.extend(self.encode("assistant\n"))
        if tokenize:
            return ids
        return self.decode(ids)
