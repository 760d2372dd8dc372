"""Wan video diffusion (diffusion/wan.py): 3-D rope reductions, causal
temporal convolution, masked cross-attention, and the full video
pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.diffusion.wan import (WanConfig, WanPipeline, _conv3d_causal,
                                   init_wan_params, init_wan_vae, rope_3d,
                                   wan_forward, wan_vae_decode)


class TestRope3d:
    def test_reduces_to_1d_on_w_axis(self):
        from mnn_tpu.models.layers import rope_cos_sin

        d = 24
        cos3, sin3 = rope_3d((1, 1, 6), d)
        # w-axis section of the band split
        half = d // 2
        s_t = half // 3
        s_h = (half - s_t) // 2
        pos = jnp.arange(6, dtype=jnp.int32)[None]
        cos1, sin1 = rope_cos_sin(pos, d, 10000.0)
        # matching frequency bands: rope_3d w-section uses band indices
        # s_t+s_h..half with the same freq table as 1-D rope
        np.testing.assert_allclose(
            np.asarray(cos3[:, s_t + s_h:]),
            np.asarray(cos1[0, :, s_t + s_h:]), atol=1e-6)
        # t/h positions are constant 0 -> cos 1, sin 0
        np.testing.assert_allclose(np.asarray(cos3[:, :s_t + s_h]), 1.0)
        np.testing.assert_allclose(np.asarray(sin3[:, :s_t + s_h]), 0.0)

    def test_distinct_axes_distinct_phases(self):
        cos3, _ = rope_3d((2, 2, 2), 24)
        assert cos3.shape == (8, 12)
        # tokens differing only in t differ only in the t section
        assert not np.allclose(cos3[0], cos3[4])


class TestCausalConv:
    def test_no_future_leakage(self):
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (3, 3, 3, 2, 2)) * 0.1
        b = jnp.zeros((2,))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 4, 2))
        y0 = _conv3d_causal(x, w, b)
        # perturb the LAST frame: earlier outputs must not change
        x2 = x.at[:, -1].add(100.0)
        y1 = _conv3d_causal(x2, w, b)
        np.testing.assert_allclose(np.asarray(y0[:, :4]),
                                   np.asarray(y1[:, :4]), atol=1e-5)
        assert float(jnp.abs(y0[:, 4] - y1[:, 4]).max()) > 1.0


class TestTransformer:
    def test_forward_shape_and_finite(self):
        cfg = WanConfig.tiny()
        p = init_wan_params(cfg, jax.random.PRNGKey(0))
        lat = jax.random.normal(jax.random.PRNGKey(1),
                                (2, 2, 4, 4, cfg.in_channels))
        txt = jax.random.normal(jax.random.PRNGKey(2), (2, 5, cfg.text_dim))
        out = wan_forward(p, cfg, lat, jnp.asarray([500.0, 100.0]), txt)
        assert out.shape == lat.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_text_mask_hides_padding(self):
        cfg = WanConfig.tiny()
        p = init_wan_params(cfg, jax.random.PRNGKey(0))
        lat = jax.random.normal(jax.random.PRNGKey(1),
                                (1, 2, 4, 4, cfg.in_channels))
        txt = jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.text_dim))
        mask = jnp.asarray([[1, 1, 1, 0, 0, 0]], jnp.float32)
        a = wan_forward(p, cfg, lat, jnp.asarray([500.0]), txt, mask)
        # changing MASKED positions must not change the output
        txt2 = txt.at[:, 3:].add(10.0)
        b = wan_forward(p, cfg, lat, jnp.asarray([500.0]), txt2, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        # changing a LIVE position must
        txt3 = txt.at[:, 0].add(10.0)
        c = wan_forward(p, cfg, lat, jnp.asarray([500.0]), txt3, mask)
        assert float(jnp.abs(a - c).max()) > 1e-5


class TestVae:
    def test_decode_shapes(self):
        p = init_wan_vae(jax.random.PRNGKey(0), latent_ch=4, width=8,
                         spatial_stages=2)
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 2, 2, 4))
        vid = wan_vae_decode(p, lat, spatial_stages=2)
        assert vid.shape == (1, 6, 8, 8, 3)   # T*2, HW*4
        assert np.isfinite(np.asarray(vid)).all()


class TestPipeline:
    def test_txt2video_runs(self):
        cfg = WanConfig.tiny()
        p = init_wan_params(cfg, jax.random.PRNGKey(0))
        vp = init_wan_vae(jax.random.PRNGKey(1), latent_ch=cfg.in_channels,
                          width=8, spatial_stages=1)
        pipe = WanPipeline(cfg, p, vp, vae_stages=1)
        txt = jax.random.normal(jax.random.PRNGKey(2), (1, 4, cfg.text_dim))
        un = jnp.zeros((1, 4, cfg.text_dim))
        vid = pipe(txt, un, latent_thw=(2, 4, 4), steps=2, seed=0)
        assert vid.shape == (1, 4, 8, 8, 3)
        assert np.isfinite(np.asarray(vid)).all()
