"""Sana (diffusion/sana.py): linear attention exactness vs the quadratic
form, MixFFN/adaLN-single structure, DC-AE decoder shapes, and the full
CFG flow-matching pipeline end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.diffusion.sana import (SanaConfig, SanaPipeline, dcae_decode,
                                    init_dcae_decoder, init_sana_params,
                                    linear_attention, sana_forward)


class TestLinearAttention:
    def test_matches_quadratic_form(self):
        """φ(Q)(φ(K)ᵀV)/norm (O(N d²)) == (φ(Q)φ(K)ᵀ/rownorm)V (O(N² d))."""
        key = jax.random.PRNGKey(0)
        b, n, d, h = 2, 17, 32, 4
        q, k, v = (jax.random.normal(kk, (b, n, d))
                   for kk in jax.random.split(key, 3))
        got = linear_attention(q, k, v, h)

        hd = d // h
        qh = jax.nn.relu(q.reshape(b, n, h, hd).transpose(0, 2, 1, 3))
        kh = jax.nn.relu(k.reshape(b, n, h, hd).transpose(0, 2, 1, 3))
        vh = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", qh, kh)           # [B,H,N,N]
        want = jnp.einsum("bhnm,bhmd->bhnd", s, vh) / (
            s.sum(-1, keepdims=True) + 1e-6)
        want = want.transpose(0, 2, 1, 3).reshape(b, n, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_cost_independent_check(self):
        # degenerate single token: attention = value row
        q = jnp.ones((1, 1, 8))
        v = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 8))
        out = linear_attention(q, q, v, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(v),
                                   rtol=1e-4, atol=1e-5)


class TestTransformer:
    def test_forward_shapes_and_finite(self):
        cfg = SanaConfig.tiny()
        p = init_sana_params(cfg, jax.random.PRNGKey(0))
        lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8,
                                                        cfg.in_channels))
        txt = jax.random.normal(jax.random.PRNGKey(2), (2, 5, cfg.text_dim))
        t = jnp.asarray([500.0, 100.0])
        out = sana_forward(p, cfg, lat, t, txt)
        assert out.shape == lat.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_timestep_conditioning_matters(self):
        cfg = SanaConfig.tiny()
        p = init_sana_params(cfg, jax.random.PRNGKey(0))
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4,
                                                        cfg.in_channels))
        txt = jax.random.normal(jax.random.PRNGKey(2), (1, 3, cfg.text_dim))
        a = sana_forward(p, cfg, lat, jnp.asarray([10.0]), txt)
        b = sana_forward(p, cfg, lat, jnp.asarray([900.0]), txt)
        assert float(jnp.abs(a - b).max()) > 1e-5

    def test_text_conditioning_matters(self):
        cfg = SanaConfig.tiny()
        p = init_sana_params(cfg, jax.random.PRNGKey(0))
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4,
                                                        cfg.in_channels))
        t1 = jax.random.normal(jax.random.PRNGKey(2), (1, 3, cfg.text_dim))
        t2 = jax.random.normal(jax.random.PRNGKey(3), (1, 3, cfg.text_dim))
        a = sana_forward(p, cfg, lat, jnp.asarray([500.0]), t1)
        b = sana_forward(p, cfg, lat, jnp.asarray([500.0]), t2)
        assert float(jnp.abs(a - b).max()) > 1e-5


class TestDCAE:
    def test_decoder_upsamples_32x_equivalent(self):
        p = init_dcae_decoder(jax.random.PRNGKey(0), latent_ch=4, width=16,
                              stages=3)
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 4))
        img = dcae_decode(p, lat, stages=3)
        assert img.shape == (1, 16, 16, 3)        # 2^3 per stage
        arr = np.asarray(img)
        assert np.isfinite(arr).all() and arr.min() >= -1 and arr.max() <= 1


class TestPipeline:
    def test_txt2img_runs_and_cfg_guides(self):
        cfg = SanaConfig.tiny()
        p = init_sana_params(cfg, jax.random.PRNGKey(0))
        dp = init_dcae_decoder(jax.random.PRNGKey(1),
                               latent_ch=cfg.in_channels, width=16, stages=2)
        pipe = SanaPipeline(cfg, p, dp, dcae_stages=2)
        txt = jax.random.normal(jax.random.PRNGKey(2), (1, 4, cfg.text_dim))
        un = jnp.zeros((1, 4, cfg.text_dim))
        img = pipe(txt, un, latent_hw=(4, 4), steps=2, guidance=3.0, seed=0)
        assert img.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(img)).all()
        # guidance changes the output (cond path is live)
        img2 = pipe(txt, un, latent_hw=(4, 4), steps=2, guidance=0.0, seed=0)
        assert float(jnp.abs(img - img2).max()) > 1e-6
