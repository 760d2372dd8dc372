"""Per-family vision preprocess (runtime/vision_preprocess.py vs the
reference's omni.cpp family pipelines): alignment rules, patch layouts,
slice grids, token counts."""

import numpy as np
import pytest

from mnn_tpu.runtime import vision_preprocess as vp


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), np.uint8)


class TestQwen2:
    def test_alignment_and_tokens(self):
        out = vp.qwen2_preprocess(_img(300, 500))
        gt, gh, gw = out.grid
        # 300 -> 308 (22*14), 500 -> 504 (36*14); aligned to 28
        assert (gh * 14) % 28 == 0 and (gw * 14) % 28 == 0
        assert out.pixels.shape == (gt * gh * gw, 2 * 14 * 14 * 3)
        assert out.num_tokens == gt * (gh // 2) * (gw // 2)

    def test_patch_flatten_roundtrip(self):
        # patches must tile the image: reconstruct and compare
        img = _img(56, 56)
        out = vp.qwen2_preprocess(img)
        gt, gh, gw = out.grid
        pt = out.pixels.reshape(gt, gh, gw, 2, 14, 14, 3)
        rec = pt[:, :, :, 0].transpose(0, 1, 3, 2, 4, 5).reshape(56, 56, 3)
        want = vp._resize_norm(img, 56, 56)
        np.testing.assert_allclose(rec, want, atol=1e-5)


class TestHunyuan:
    def test_alignment(self):
        out = vp.hunyuan_preprocess(_img(100, 220))
        _, gh, gw = out.grid
        assert (gh * 16) % 32 == 0 and (gw * 16) % 32 == 0
        assert out.num_tokens == (gh // 2) * (gw // 2)


class TestSmolvlm:
    def test_small_image_single_global(self):
        out = vp.smolvlm_preprocess(_img(300, 400), size_unit=512)
        assert out.pixels.shape == (1, 512, 512, 3)
        assert out.grid == (0, 0)
        assert out.num_tokens == 64

    def test_large_image_tiles_plus_global(self):
        out = vp.smolvlm_preprocess(_img(900, 1300), size_unit=512)
        gh, gw = out.grid
        assert gh == 2 and gw == 3          # 900->1024, 1300->1536
        assert out.pixels.shape == (gh * gw + 1, 512, 512, 3)
        assert out.num_tokens == (gh * gw + 1) * 64

    def test_max_size_clamp(self):
        out = vp.smolvlm_preprocess(_img(6000, 6000), size_unit=512,
                                    max_size=2048)
        gh, gw = out.grid
        assert gh == 4 and gw == 4


class TestMinicpm:
    def test_best_grid_matches_aspect(self):
        assert vp._minicpm_best_grid(448, 448, 9) in ((1, 1), (2, 2), (3, 3))
        rows, cols = vp._minicpm_best_grid(400, 1200, 9)
        assert cols / rows >= 2               # wide image -> wide grid
        rows, cols = vp._minicpm_best_grid(1200, 400, 9)
        assert rows / cols >= 2

    def test_slices_and_thumbnail(self):
        out = vp.minicpm_preprocess(_img(500, 1500), max_slices=6)
        rows, cols = out.grid
        assert rows * cols <= 6
        assert out.pixels.shape == (rows * cols + 1, 448, 448, 3)
        assert out.num_tokens == (rows * cols + 1) * 96


class TestGemma4:
    def test_align_48_and_patch_budget(self):
        out = vp.gemma4_preprocess(_img(700, 1100))
        _, gh, gw = out.grid
        assert (gh * 16) % 48 == 0 and (gw * 16) % 48 == 0
        assert gh * gw <= 280 * 9
        assert out.num_tokens <= 280

    def test_huge_image_shrinks_to_budget(self):
        out = vp.gemma4_preprocess(_img(4000, 4000))
        _, gh, gw = out.grid
        assert gh * gw <= 2520
        # rescale-only normalization: values in [0, 1]
        assert out.pixels.min() >= 0.0 and out.pixels.max() <= 1.0


class TestDispatch:
    def test_family_switch(self):
        img = _img(64, 64)
        for fam in ("qwen2", "hunyuan", "smolvlm", "minicpm", "gemma4"):
            out = vp.preprocess(fam, img)
            assert out.num_tokens > 0
        with pytest.raises(ValueError, match="unknown vision family"):
            vp.preprocess("nope", img)
