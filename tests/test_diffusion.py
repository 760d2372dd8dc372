"""Diffusion schedulers + pipeline: denoising recovers a known target."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.diffusion.pipeline import DiffusionPipeline
from mnn_tpu.diffusion.scheduler import (
    DDIMScheduler,
    DDPMScheduler,
    EulerDiscreteScheduler,
)


class TestSchedulers:
    def test_alphas_monotone(self):
        s = DDIMScheduler()
        a = np.asarray(s.alphas_cumprod)
        assert (np.diff(a) < 0).all() and 0 < a[-1] < a[0] <= 1

    def test_add_noise_roundtrip(self):
        s = DDIMScheduler()
        x0 = jnp.ones((1, 2, 4, 4))
        noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
        xt = s.add_noise(x0, noise, 500)
        x0_hat = s._predict_x0(xt, noise, 500)
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("cls", [DDIMScheduler, DDPMScheduler,
                                     EulerDiscreteScheduler])
    def test_oracle_denoiser_recovers_target(self, cls):
        # if the model predicts the TRUE noise toward a fixed x0, sampling
        # must converge to that x0
        target = jnp.asarray(
            np.random.default_rng(0).uniform(-0.5, 0.5, (1, 2, 8, 8)),
            jnp.float32)
        s = cls()
        ts = s.set_timesteps(50)

        def oracle(latent, t, cond):
            a = s.alphas_cumprod[t]
            return (latent - jnp.sqrt(a) * target) / jnp.sqrt(1 - a)

        if isinstance(s, EulerDiscreteScheduler):
            # euler parameterization: model predicts eps on the sigma scale
            def oracle(latent, t, cond):  # noqa: F811
                sig = s.sigma(t)
                # latent (scaled input) relates to raw sample via caller;
                # here latent IS the scaled input: x = x_raw/sqrt(sig^2+1)
                # model_out should satisfy x0 = x_raw - sig*eps
                x_raw = latent * jnp.sqrt(sig ** 2 + 1)
                return (x_raw - target) / sig

        pipe = DiffusionPipeline(
            denoiser=oracle, scheduler=s, latent_shape=(2, 8, 8),
            guidance_scale=1.0,
        )
        out = pipe.run(cond=0, num_steps=50, seed=1)
        err = float(jnp.abs(out - target).max())
        assert err < 0.15, err

    def test_pipeline_callback_and_cfg(self):
        s = DDIMScheduler()
        calls = []

        def denoiser(latent, t, cond):
            return latent * 0.0 + (0.1 if cond else -0.1)

        pipe = DiffusionPipeline(
            denoiser=denoiser, scheduler=s, latent_shape=(1, 4, 4),
            guidance_scale=2.0,
        )
        out = pipe.run(cond=True, uncond=False, num_steps=5, seed=0,
                       callback=lambda i, lat: calls.append(i))
        assert calls == [0, 1, 2, 3, 4]
        assert out.shape == (1, 1, 4, 4)
