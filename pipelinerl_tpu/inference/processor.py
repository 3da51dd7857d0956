"""Visual processors: turn OpenAI-style multimodal messages into
(prompt token ids with image placeholders, pixel features).

The reference leaves this to vLLM server-side and re-extracts features
trainer-side with AutoProcessor (/root/reference/pipelinerl/async_llm.py:242-289,
processor_factory.py). Here one processor call per request produces BOTH the
expanded token ids and the pixel features, which then flow with the LLMCall
into the TrainingText — no second extraction, no drift between them.

``HFVisualProcessor`` wraps a HuggingFace AutoProcessor (Qwen2.5-VL
convention: chat template with image placeholders, pixel_values +
image_grid_thw). Tests use toy processors with the same interface.
"""

from __future__ import annotations

import base64
import io
from typing import Any, Protocol

import numpy as np


class VisualProcessorLike(Protocol):
    def __call__(
        self, messages: list[dict], tools: list[dict] | None = None
    ) -> tuple[list[int], dict]: ...


def decode_message_image(part: dict):
    """Decode one image content part → PIL image. Accepts the reference's
    ``image_url`` data-URL convention (chartqa.py:63-83) and raw
    ``{"type": "image", "image": <PIL/np/bytes>}``."""
    from PIL import Image

    if part.get("type") == "image_url":
        url = part["image_url"]["url"] if isinstance(part.get("image_url"), dict) else part["image_url"]
        if not url.startswith("data:"):
            raise ValueError("only data: URLs are supported (no egress)")
        payload = url.split(",", 1)[1]
        return Image.open(io.BytesIO(base64.b64decode(payload)))
    img = part.get("image")
    if isinstance(img, (bytes, bytearray)):
        return Image.open(io.BytesIO(bytes(img)))
    if isinstance(img, np.ndarray):
        return Image.fromarray(img)
    return img  # PIL image already


def extract_images(messages: list[dict]) -> list[Any]:
    images = []
    for m in messages:
        content = m.get("content")
        if isinstance(content, list):
            for part in content:
                if part.get("type") in ("image", "image_url"):
                    images.append(decode_message_image(part))
    return images


class HFVisualProcessor:
    """AutoProcessor-backed processor for real VLM checkpoints."""

    def __init__(self, model_dir: str):
        from transformers import AutoProcessor

        self.processor = AutoProcessor.from_pretrained(model_dir)

    def __call__(
        self, messages: list[dict], tools: list[dict] | None = None
    ) -> tuple[list[int], dict]:
        images = extract_images(messages)
        text = self.processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True, tools=tools
        )
        out = self.processor(text=[text], images=images or None, return_tensors="np")
        visual = None
        if images:
            visual = {
                "pixel_values": np.asarray(out["pixel_values"], np.float32),
                "image_grid_thw": np.asarray(out["image_grid_thw"], np.int64),
            }
        return [int(t) for t in out["input_ids"][0]], visual
