"""Text-to-image diffusion pipeline (CFG sampling loop).

Equivalent of the reference's Diffusion engine
(/root/reference/transformers/diffusion/engine/include/diffusion/diffusion.hpp:38-76:
`Diffusion::load/run(prompt, iterNum, seed, callback)` over text-encoder +
UNet/DiT + VAE Modules): the pipeline composes three callables (any jax
functions — converted via torch_fx or native) with a scheduler and runs the
classifier-free-guidance denoising loop, invoking a progress callback per
step like the reference's iteration callback.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mnn_tpu.diffusion.scheduler import SCHEDULERS, Scheduler


class DiffusionPipeline:
    def __init__(
        self,
        denoiser: Callable,            # (latent, t, cond) -> model_out
        text_encoder: Optional[Callable] = None,  # (prompt) -> cond
        vae_decode: Optional[Callable] = None,    # latent -> image
        scheduler: str | Scheduler = "ddim",
        latent_shape=(4, 64, 64),
        guidance_scale: float = 7.5,
    ):
        self.denoiser = denoiser
        self.text_encoder = text_encoder
        self.vae_decode = vae_decode
        self.scheduler = (
            SCHEDULERS[scheduler]() if isinstance(scheduler, str) else scheduler
        )
        self.latent_shape = latent_shape
        self.guidance_scale = guidance_scale

    def run(
        self,
        prompt=None,
        *,
        cond=None,
        uncond=None,
        num_steps: int = 20,
        seed: int = 0,
        callback: Optional[Callable[[int, jax.Array], None]] = None,
    ):
        """Denoise from pure noise; returns decoded image (or final latent)."""
        sch = self.scheduler
        if cond is None and self.text_encoder is not None:
            cond = self.text_encoder(prompt)
            if uncond is None and self.guidance_scale > 1:
                uncond = self.text_encoder("")
        timesteps = sch.set_timesteps(num_steps)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        latent = jax.random.normal(sub, (1, *self.latent_shape), jnp.float32)
        if hasattr(sch, "sigma"):
            # Euler-discrete: init noise lives at sigma_max scale (the
            # denoiser input is re-normalized by scale_model_input)
            latent = latent * jnp.sqrt(
                sch.sigma(sch.num_train_timesteps - 1) ** 2 + 1)

        for i, t in enumerate(timesteps):
            t_prev = timesteps[i + 1] if i + 1 < len(timesteps) else -1
            lat_in = latent
            if hasattr(sch, "scale_model_input"):
                lat_in = sch.scale_model_input(latent, t)
            if self.guidance_scale > 1 and uncond is not None:
                out_c = self.denoiser(lat_in, t, cond)
                out_u = self.denoiser(lat_in, t, uncond)
                model_out = out_u + self.guidance_scale * (out_c - out_u)
            else:
                model_out = self.denoiser(lat_in, t, cond)
            key, sub = jax.random.split(key)
            latent = sch.step(model_out, t, t_prev, latent, sub)
            if callback is not None:
                callback(i, latent)

        if self.vae_decode is not None:
            return self.vae_decode(latent)
        return latent
