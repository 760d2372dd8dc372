"""Qwen2.5-VL vision tower: exact parity vs the HF torch implementation
(window attention + full-attention layers, 2D rope, 2x2 merger)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mnn_tpu.models.qwen_vl_vision import (QwenVLVisionConfig,
                                           from_hf_qwen_vl_vision,
                                           qwen_vl_vision_forward)

torch = pytest.importorskip("torch")


def _hf_model(cfg: QwenVLVisionConfig):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig)
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel)
    hf_cfg = Qwen2_5_VLVisionConfig(
        depth=cfg.depth, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_heads=cfg.num_heads,
        in_channels=cfg.in_channels, patch_size=cfg.patch_size,
        temporal_patch_size=cfg.temporal_patch_size,
        spatial_merge_size=cfg.spatial_merge_size,
        window_size=cfg.window_size, out_hidden_size=cfg.out_hidden_size,
        fullatt_block_indexes=list(cfg.fullatt_block_indexes),
        torch_dtype="float32")
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    return Qwen2_5_VisionTransformerPretrainedModel(hf_cfg).float().eval()


class TestQwenVLVisionOracle:
    def _run(self, cfg, grids, seed=0):
        model = _hf_model(cfg)
        params = from_hf_qwen_vl_vision(model.state_dict())
        s = sum(t * h * w for t, h, w in grids)
        dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
        patches = np.random.default_rng(seed).standard_normal(
            (s, dim), np.float32)
        with torch.no_grad():
            ref = model(torch.from_numpy(patches),
                        grid_thw=torch.tensor(grids)).numpy()
        got = qwen_vl_vision_forward(params, cfg, jnp.asarray(patches), grids)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)

    def test_single_image(self):
        cfg = QwenVLVisionConfig.tiny()
        # 8x8 patches: window edge = 16/2/4 = 2 merge units -> 2x2 windows
        self._run(cfg, [(1, 8, 8)])

    def test_window_padding_path(self):
        cfg = QwenVLVisionConfig.tiny()
        # 6x10 merge grid (3x5 units) does not divide the window edge ->
        # exercises the -100 padding/clipping branch of get_window_index
        self._run(cfg, [(1, 6, 10)])

    def test_two_images_batched_sequence(self):
        cfg = QwenVLVisionConfig.tiny()
        self._run(cfg, [(1, 4, 4), (1, 8, 4)])

    def test_full_attention_layer_matters(self):
        """Zero-ing fullatt_block_indexes changes output (mask wiring)."""
        cfg = QwenVLVisionConfig.tiny()
        model = _hf_model(cfg)
        params = from_hf_qwen_vl_vision(model.state_dict())
        dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
        patches = np.random.default_rng(1).standard_normal((64, dim),
                                                           np.float32)
        a = qwen_vl_vision_forward(params, cfg, jnp.asarray(patches),
                                   [(1, 8, 8)])
        import dataclasses
        cfg2 = dataclasses.replace(cfg, fullatt_block_indexes=())
        b = qwen_vl_vision_forward(params, cfg2, jnp.asarray(patches),
                                   [(1, 8, 8)])
        assert not np.allclose(np.asarray(a), np.asarray(b))
