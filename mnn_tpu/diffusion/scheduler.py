"""Diffusion noise schedulers: DDPM, DDIM, Euler-discrete.

Equivalent of the reference's scheduler implementations
(/root/reference/transformers/diffusion/engine/src/scheduler.cpp) for the
MNN-Diffusion runtime (SD 1.5 / SD3.5 / Sana pipelines, diffusion.hpp:38-76).
Standard scaled-linear beta schedule (Stable Diffusion convention); all
step math is jax-traceable so the whole sampling loop can live in one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Scheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    schedule: str = "scaled_linear"   # scaled_linear | linear
    prediction_type: str = "epsilon"  # epsilon | v_prediction

    def __post_init__(self):
        if self.schedule == "scaled_linear":
            betas = np.linspace(
                self.beta_start ** 0.5, self.beta_end ** 0.5,
                self.num_train_timesteps) ** 2
        else:
            betas = np.linspace(self.beta_start, self.beta_end,
                                self.num_train_timesteps)
        self.alphas_cumprod = jnp.asarray(
            np.cumprod(1.0 - betas), jnp.float32)
        self.timesteps = None

    def set_timesteps(self, num_steps: int):
        step = self.num_train_timesteps // num_steps
        self.timesteps = np.arange(self.num_train_timesteps - 1, -1, -step)[
            :num_steps
        ].astype(np.int32)
        return self.timesteps

    def add_noise(self, x0, noise, t):
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * noise

    def _predict_x0(self, sample, model_out, t):
        a = self.alphas_cumprod[t]
        if self.prediction_type == "v_prediction":
            return jnp.sqrt(a) * sample - jnp.sqrt(1 - a) * model_out
        return (sample - jnp.sqrt(1 - a) * model_out) / jnp.sqrt(a)


@dataclasses.dataclass
class DDIMScheduler(Scheduler):
    eta: float = 0.0

    def step(self, model_out, t, t_prev, sample, key: Optional[jax.Array] = None):
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        x0 = self._predict_x0(sample, model_out, t)
        eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        sigma = self.eta * jnp.sqrt(
            (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
        )
        dir_term = jnp.sqrt(jnp.maximum(1 - a_prev - sigma**2, 0.0)) * eps
        prev = jnp.sqrt(a_prev) * x0 + dir_term
        if self.eta > 0 and key is not None:
            prev = prev + sigma * jax.random.normal(key, sample.shape)
        return prev


@dataclasses.dataclass
class DDPMScheduler(Scheduler):
    def step(self, model_out, t, t_prev, sample, key: jax.Array):
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        alpha = a_t / a_prev
        x0 = jnp.clip(self._predict_x0(sample, model_out, t), -1.0, 1.0)
        coef_x0 = jnp.sqrt(a_prev) * (1 - alpha) / (1 - a_t)
        coef_xt = jnp.sqrt(alpha) * (1 - a_prev) / (1 - a_t)
        mean = coef_x0 * x0 + coef_xt * sample
        var = (1 - a_prev) / (1 - a_t) * (1 - alpha)
        noise = jax.random.normal(key, sample.shape)
        return jnp.where(t_prev >= 0, mean + jnp.sqrt(jnp.maximum(var, 1e-20)) * noise, mean)


@dataclasses.dataclass
class EulerDiscreteScheduler(Scheduler):
    def sigma(self, t):
        a = self.alphas_cumprod[t]
        return jnp.sqrt((1 - a) / a)

    def scale_model_input(self, sample, t):
        return sample / jnp.sqrt(self.sigma(t) ** 2 + 1)

    def step(self, model_out, t, t_prev, sample, key=None):
        s_t = self.sigma(t)
        s_prev = jnp.where(t_prev >= 0, self.sigma(jnp.maximum(t_prev, 0)), 0.0)
        # epsilon-pred: denoised x0 estimate, then Euler step over sigma
        x0 = sample - s_t * model_out
        d = (sample - x0) / s_t
        return sample + d * (s_prev - s_t)


@dataclasses.dataclass
class FlowMatchEulerScheduler(Scheduler):
    """Rectified-flow / flow-matching Euler sampler (SD3 and the
    reference's token2wav DiT both integrate this ODE: x_s = (1-s)x0 + s·n,
    model predicts velocity v = n - x0, Euler steps s: 1 -> 0)."""

    shift: float = 1.0  # SD3 timestep shift

    def set_timesteps(self, num_steps: int):
        s = np.linspace(1.0, 0.0, num_steps + 1)
        if self.shift != 1.0:
            s = self.shift * s / (1 + (self.shift - 1) * s)
        self.sigmas = s.astype(np.float32)
        # integer "timesteps" for models conditioned on t in [0, T)
        self.timesteps = (s[:-1] * self.num_train_timesteps).astype(np.int32)
        return self.timesteps

    def sigma_of(self, i):
        return self.sigmas[i]

    def step_index(self, model_out, i: int, sample):
        """Euler step from sigma[i] to sigma[i+1] (index-based API)."""
        return sample + (self.sigmas[i + 1] - self.sigmas[i]) * model_out

    # pipeline-compatible signature: t/t_prev are integer timesteps
    def step(self, model_out, t, t_prev, sample, key=None):
        s_t = jnp.asarray(t, jnp.float32) / self.num_train_timesteps
        s_prev = jnp.maximum(jnp.asarray(t_prev, jnp.float32), 0.0) \
            / self.num_train_timesteps
        return sample + (s_prev - s_t) * model_out


SCHEDULERS = {
    "ddim": DDIMScheduler,
    "ddpm": DDPMScheduler,
    "euler": EulerDiscreteScheduler,
    "flow_match": FlowMatchEulerScheduler,
}
