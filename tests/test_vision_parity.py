"""Vision tower parity vs HF transformers' Qwen2.5-VL (torch, CPU): the
jitted JAX tower + checkpoint loader must reproduce the reference encoder
bit-for-bit (fp32 tolerance) including window-attention geometry.

This is the gold check for VERDICT round-1 item #6 (vision.py was dead
code): random-weight HF model → safetensors → ``load_hf_vision`` →
``encode_images`` compared against the torch forward."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


def _make_hf_vision(tmp_path):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    vc = Qwen2_5_VLVisionConfig(
        depth=4,
        hidden_size=32,
        intermediate_size=64,
        num_heads=2,
        out_hidden_size=48,
        patch_size=4,
        temporal_patch_size=2,
        spatial_merge_size=2,
        window_size=16,
        fullatt_block_indexes=[2],
        in_channels=3,
    )
    torch.manual_seed(0)
    model = Qwen2_5_VisionTransformerPretrainedModel._from_config(vc).float().eval()
    return model, vc


def _export_checkpoint(model, vc, tmp_path):
    """Write the torch weights as a Qwen2.5-VL-shaped checkpoint dir."""
    from safetensors.numpy import save_file

    state = {
        f"visual.{k}": v.detach().numpy() for k, v in model.state_dict().items()
    }
    save_file(state, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(
        json.dumps(
            {
                "architectures": ["Qwen2_5_VLForConditionalGeneration"],
                "vision_config": {
                    "depth": vc.depth,
                    "hidden_size": vc.hidden_size,
                    "intermediate_size": vc.intermediate_size,
                    "num_heads": vc.num_heads,
                    "out_hidden_size": vc.out_hidden_size,
                    "patch_size": vc.patch_size,
                    "temporal_patch_size": vc.temporal_patch_size,
                    "spatial_merge_size": vc.spatial_merge_size,
                    "window_size": vc.window_size,
                    "fullatt_block_indexes": list(vc.fullatt_block_indexes),
                    "in_channels": 3,
                },
            }
        )
    )


@pytest.mark.parametrize(
    "grids",
    [
        [[1, 8, 12]],  # one image, windows truncate at the right edge
        [[1, 4, 4], [1, 8, 8]],  # two images in one batch
    ],
)
def test_vision_tower_matches_hf(tmp_path, grids):
    from pipelinerl_tpu.models.hf_loader import load_hf_vision
    from pipelinerl_tpu.models.vision import encode_images

    model, vc = _make_hf_vision(tmp_path)
    _export_checkpoint(model, vc, tmp_path)
    params, cfg = load_hf_vision(tmp_path, dtype=jnp.float32)
    assert cfg is not None and cfg.depth == 4

    grid = np.asarray(grids, np.int64)
    n_patches = int((grid[:, 0] * grid[:, 1] * grid[:, 2]).sum())
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(n_patches, cfg.patch_dim)).astype(np.float32)

    with torch.no_grad():
        ref = model(
            torch.from_numpy(pixels), grid_thw=torch.from_numpy(grid)
        ).numpy()

    out = np.asarray(encode_images(params, cfg, pixels, grid))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
