"""Sequence packing into fixed-shape trainer batches.

TPU-first redesign of the reference ``collate_packed``
(/root/reference/pipelinerl/finetune/data.py:215-283): instead of padding to
"total length rounded to seq_parallel", every pack is padded to the *static*
``seq_length`` with a synthetic padding segment (EOS tokens, labels −100,
num_labels/group_tokens = 1 like the reference sentinel example,
finetune/utils.py:63-79). One shape → one compiled train step, no
recompilation across batches. Context-parallel slicing then always divides
evenly (TrainerBatch.make_slices).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from ..types import MASKED_TOKEN_ID, RL_DATA_COLUMNS, TrainerBatch


def pack_samples(
    samples: Sequence[dict[str, Any]],
    seq_length: int,
    eos_token_id: int,
    sentinel: bool = False,
) -> TrainerBatch:
    """Pack samples (dicts with input_ids/labels + RL columns) into one
    fixed-length [1, seq_length] TrainerBatch."""
    total = sum(len(s["input_ids"]) for s in samples)
    if total > seq_length:
        raise ValueError(f"samples total {total} exceeds seq_length {seq_length}")
    pad = seq_length - total

    input_ids = np.full(seq_length, eos_token_id, dtype=np.int32)
    labels = np.full(seq_length, MASKED_TOKEN_ID, dtype=np.int32)
    position_ids = np.zeros(seq_length, dtype=np.int32)
    segment_ids = np.zeros(seq_length, dtype=np.int32)
    floats = {name: np.zeros(seq_length, dtype=np.float32) for name in RL_DATA_COLUMNS}

    boundaries = [0]
    offset = 0
    for i, s in enumerate(samples):
        n = len(s["input_ids"])
        sl = slice(offset, offset + n)
        input_ids[sl] = s["input_ids"]
        seq_labels = np.asarray(s["labels"], dtype=np.int32)
        if n > 0:
            # first token of a segment is never predictable from within the
            # segment (reference data.py:263-266 masks it for i > 0; with
            # segment-masked attention it is unpredictable for i == 0 too)
            seq_labels = seq_labels.copy()
            seq_labels[0] = MASKED_TOKEN_ID
        labels[sl] = seq_labels
        position_ids[sl] = np.arange(n)
        segment_ids[sl] = i
        for name in RL_DATA_COLUMNS:
            floats[name][sl] = s[name]
        offset += n
        boundaries.append(offset)

    if pad > 0:
        sl = slice(offset, seq_length)
        position_ids[sl] = np.arange(pad)
        segment_ids[sl] = len(samples)
        floats["group_tokens"][sl] = 1.0
        floats["num_labels"][sl] = 1.0
        boundaries.append(seq_length)

    model_version = min((s.get("model_version", 0) for s in samples), default=0)
    return TrainerBatch(
        input_ids=input_ids,
        labels=labels,
        position_ids=position_ids,
        segment_ids=segment_ids,
        model_version=model_version,
        sentinel=sentinel,
        padding=pad,
        seq_boundaries=np.asarray(boundaries, dtype=np.int32),
        num_sequences=len(samples),
        **floats,
    )


def pack_visual_sample(
    sample: dict[str, Any],
    seq_length: int,
    eos_token_id: int,
    image_token_id: int,
    spatial_merge_size: int = 2,
) -> TrainerBatch:
    """Pack ONE multimodal sample into a [1, seq_length] batch: VLM rows are
    never packed with others (reference forbids packing for VLM,
    launch.py:63-69). Attaches pixel features and mrope position rows
    (models/mrope.py) for the trainer's vision-spliced forward."""
    import numpy as _np

    from ..models.mrope import mrope_positions

    batch = pack_samples([sample], seq_length, eos_token_id)
    vis = sample["visual_features"]
    grid = _np.asarray(vis["image_grid_thw"], _np.int64).reshape(-1, 3)
    n = len(sample["input_ids"])
    pos3, _ = mrope_positions(
        sample["input_ids"], grid, image_token_id, spatial_merge_size
    )
    pos_full = _np.zeros((3, seq_length), _np.int32)
    pos_full[:, :n] = pos3
    pos_full[:, n:] = pos3.max() + 1 + _np.arange(seq_length - n, dtype=_np.int32)
    batch.visual = {
        "pixel_values": _np.asarray(vis["pixel_values"], _np.float32),
        "image_grid_thw": grid,
        "mrope_position_ids": pos_full,
    }
    return batch


def make_sentinel_batch(seq_length: int, eos_token_id: int, model_version: int = 0) -> TrainerBatch:
    """A loss-free full-length batch used to equalize gradient-accumulation
    passes across data-parallel ranks (reference preprocess.py:594-663)."""
    batch = pack_samples([], seq_length, eos_token_id, sentinel=True)
    batch.model_version = model_version
    return batch


def greedy_pack(
    samples: Sequence[dict[str, Any]], seq_length: int
) -> list[list[dict[str, Any]]]:
    """First-fit-decreasing-free greedy packing in arrival order (the
    reference packs greedily in stream order to preserve freshness,
    preprocess.py:594-640). Oversized samples are truncated upstream."""
    packs: list[list[dict[str, Any]]] = []
    current: list[dict[str, Any]] = []
    used = 0
    for s in samples:
        n = len(s["input_ids"])
        if n > seq_length:
            raise ValueError(f"sample of {n} tokens exceeds seq_length {seq_length}")
        if used + n > seq_length:
            packs.append(current)
            current, used = [], 0
        current.append(s)
        used += n
    if current:
        packs.append(current)
    return packs
