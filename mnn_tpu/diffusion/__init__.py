"""MNN-Diffusion equivalent: schedulers, CFG pipeline, and native JAX
denoiser/encoder/decoder models (SD-class UNet, CLIP text encoder,
AutoencoderKL VAE) loadable from diffusers-format checkpoints."""

from mnn_tpu.diffusion.pipeline import DiffusionPipeline
from mnn_tpu.diffusion.scheduler import (SCHEDULERS, DDIMScheduler,
                                         DDPMScheduler,
                                         EulerDiscreteScheduler, Scheduler)
from mnn_tpu.diffusion.sd import StableDiffusion
