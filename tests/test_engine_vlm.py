"""VLM path through the engine: mrope positions, vision-tower encode with
patch-bucket padding, placeholder splicing in prefill, decode position
deltas, and KV forks for image-sharing groups.

Greedy parity oracle: the engine (staged windows, KV cache, bucket pads)
must produce exactly the tokens of a host loop that re-runs the full
forward per step (reference behavior comes from vLLM's Qwen2.5-VL support;
async_llm.py:242-289 / chartqa domain)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pipelinerl_tpu.inference.engine import EngineConfig, GenRequest, InferenceEngine, SamplingParams
from pipelinerl_tpu.models.mrope import mrope_positions
from pipelinerl_tpu.models.transformer import ModelConfig, forward, init_params
from pipelinerl_tpu.models.vision import VisionConfig, encode_images, init_vision_params

IMG = 9  # image placeholder token id


def _toy_models():
    model_cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        dtype=jnp.float32,
        mrope_section=(2, 1, 1),  # sums to head_dim/2 = 4
        image_token_id=IMG,
    )
    vcfg = VisionConfig(
        hidden_size=16,
        intermediate_size=32,
        num_heads=2,
        depth=2,
        out_hidden_size=32,
        patch_size=2,
        temporal_patch_size=1,
        spatial_merge_size=2,
        window_size=8,
        fullatt_block_indexes=(1,),
        dtype=jnp.float32,
    )
    params = init_params(jax.random.key(0), model_cfg)
    vparams = init_vision_params(jax.random.key(1), vcfg)
    return params, model_cfg, vparams, vcfg


def _image(vcfg, grid, seed=2):
    rng = np.random.default_rng(seed)
    n_patches = int(np.prod(grid))
    return rng.normal(size=(n_patches, vcfg.patch_dim)).astype(np.float32) * 0.5


def _greedy_reference(params, model_cfg, vparams, vcfg, prompt, pixels, grid, n_new):
    embeds = encode_images(vparams, vcfg, pixels, np.asarray([grid]))
    pos3, delta = mrope_positions(
        prompt, np.asarray([grid]), IMG, vcfg.spatial_merge_size
    )
    ids = list(prompt)
    out = []
    for step in range(n_new):
        P = len(ids)
        pos = np.zeros((3, 1, P), np.int32)
        pos[:, 0, : len(prompt)] = pos3
        for k in range(len(prompt), P):
            pos[:, 0, k] = k + delta
        arr = np.asarray(ids, np.int32)[None]
        logits = forward(
            params,
            model_cfg,
            jnp.asarray(arr),
            jnp.asarray(pos),
            jnp.zeros((1, P), jnp.int32),
            image_embeds=embeds[None],
            image_mask=jnp.asarray(arr == IMG),
        )
        tok = int(jnp.argmax(logits[0, -1]))
        ids.append(tok)
        out.append(tok)
    return out


def test_engine_vlm_greedy_matches_host_reference():
    params, model_cfg, vparams, vcfg = _toy_models()
    grid = (1, 4, 4)  # → 4 merged visual tokens
    pixels = _image(vcfg, grid)
    prompt = [5, 6, IMG, IMG, IMG, IMG, 7]

    ref = _greedy_reference(
        params, model_cfg, vparams, vcfg, prompt, pixels, grid, n_new=12
    )

    engine = InferenceEngine(
        params,
        model_cfg,
        EngineConfig(
            max_slots=4,
            max_len=64,
            prefill_buckets=(16,),
            cache_dtype=jnp.float32,
            decode_window=4,
            window_pipeline_depth=1,
            vision_unit_buckets=(8,),  # 4 real units → exercises padding
        ),
        eos_token_id=-1,
        vision_params=vparams,
        vision_cfg=vcfg,
    )
    fut = engine.submit(
        GenRequest(
            prompt_ids=list(prompt),
            params=SamplingParams(temperature=0.0, max_tokens=12),
            visual={
                "pixel_values": pixels,
                "image_grid_thw": np.asarray([grid]),
            },
        )
    )
    while not fut.done():
        engine.step()
    result = fut.result()
    assert result.token_ids == ref
    assert len(result.logprobs) == 12


def test_engine_vlm_group_forks_share_prefill():
    params, model_cfg, vparams, vcfg = _toy_models()
    grid = (1, 4, 4)
    pixels = _image(vcfg, grid, seed=3)
    prompt = [5, IMG, IMG, IMG, IMG, 8]
    engine = InferenceEngine(
        params,
        model_cfg,
        EngineConfig(
            max_slots=4,
            max_len=64,
            prefill_buckets=(16,),
            cache_dtype=jnp.float32,
            decode_window=4,
            window_pipeline_depth=1,
            vision_unit_buckets=(8,),
        ),
        eos_token_id=-1,
        vision_params=vparams,
        vision_cfg=vcfg,
    )
    futs = [
        engine.submit(
            GenRequest(
                prompt_ids=list(prompt),
                params=SamplingParams(temperature=0.0, max_tokens=6),
                visual={
                    "pixel_values": pixels,
                    "image_grid_thw": np.asarray([grid]),
                },
            )
        )
        for _ in range(3)
    ]
    while not all(f.done() for f in futs):
        engine.step()
    outs = [f.result().token_ids for f in futs]
    assert outs[0] == outs[1] == outs[2]  # greedy + shared image
    assert engine.prefill_reused_tokens == 2 * len(prompt)


def test_engine_without_tower_rejects_visual():
    params, model_cfg, vparams, vcfg = _toy_models()
    engine = InferenceEngine(
        params,
        model_cfg,
        EngineConfig(max_slots=2, max_len=32, prefill_buckets=(16,),
                     cache_dtype=jnp.float32, decode_window=2,
                     window_pipeline_depth=1),
        eos_token_id=-1,
    )
    fut = engine.submit(
        GenRequest(
            prompt_ids=[5, IMG, 6],
            params=SamplingParams(temperature=0.0, max_tokens=4),
            visual={"pixel_values": np.zeros((4, 12), np.float32),
                    "image_grid_thw": np.asarray([(1, 2, 2)])},
        )
    )
    for _ in range(20):
        engine.step()
        if fut.done():
            break
    with pytest.raises(RuntimeError):
        fut.result()


def test_mrope_positions_match_hf():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import Qwen2_5_VLModel

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
            rope_scaling=dict(type="mrope", mrope_section=[2, 1, 1]),
        ),
        vision_config=dict(
            depth=1, hidden_size=16, intermediate_size=32, num_heads=2,
            out_hidden_size=32, patch_size=2, temporal_patch_size=1,
            spatial_merge_size=2, window_size=8, fullatt_block_indexes=[0],
        ),
    )
    model = Qwen2_5_VLModel(cfg)
    vs, img = cfg.vision_start_token_id, cfg.image_token_id
    ids = [5, 6, vs] + [img] * 4 + [7, 8, 9]
    grid = torch.tensor([[1, 4, 4]])
    hf_pos, hf_delta = model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=grid
    )
    pos, delta = mrope_positions(ids, np.asarray([[1, 4, 4]]), img, 2)
    np.testing.assert_array_equal(pos, hf_pos[:, 0].numpy())
    assert delta == int(hf_delta[0, 0])


def test_engine_vlm_paged_matches_host_reference():
    """VLM through the PAGED KV layout (round-2 verdict: paged rejected VLM
    — the vision prefill now commits into pool pages) plus a sibling fork
    sharing the image prompt's pages."""
    params, model_cfg, vparams, vcfg = _toy_models()
    grid = (1, 4, 4)
    pixels = _image(vcfg, grid)
    prompt = [5, 6, IMG, IMG, IMG, IMG, 7]

    ref = _greedy_reference(
        params, model_cfg, vparams, vcfg, prompt, pixels, grid, n_new=12
    )

    engine = InferenceEngine(
        params,
        model_cfg,
        EngineConfig(
            max_slots=4,
            max_len=64,
            prefill_buckets=(16,),
            cache_dtype=jnp.float32,
            decode_window=4,
            window_pipeline_depth=1,
            vision_unit_buckets=(8,),
            kv_layout="paged",
            kv_block_size=8,
        ),
        eos_token_id=-1,
        vision_params=vparams,
        vision_cfg=vcfg,
    )
    assert engine.paged
    visual = {"pixel_values": pixels, "image_grid_thw": np.asarray([grid])}
    futs = [
        engine.submit(
            GenRequest(
                prompt_ids=list(prompt),
                params=SamplingParams(temperature=0.0, max_tokens=12),
                visual=dict(visual),
            )
        )
        for _ in range(2)
    ]
    for _ in range(3000):
        engine.step()
        if all(f.done() for f in futs):
            break
    for f in futs:
        assert f.result().token_ids == ref
    # the sibling rode the KV fork (shared image prompt pages)
    assert engine.prefill_reused_tokens >= len(prompt)
    engine.block_pool.check_invariants()
