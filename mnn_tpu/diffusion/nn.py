"""Shared building blocks for the diffusion model zoo (UNet / VAE / DiT).

TPU-first conventions:
* all image tensors are NHWC internally (MXU-friendly conv layout; the
  torch-facing boundary transposes once at entry/exit),
* conv weights are HWIO (mapped from torch OIHW at load time),
* accumulation in fp32 via ``preferred_element_type``.

Reference behavior being reproduced: the denoiser/VAE Modules the MNN
diffusion engine executes (/root/reference/transformers/diffusion/engine/
src/diffusion.cpp — text_encoder + unet + vae_decoder Module pipeline);
the ops themselves follow the Stable Diffusion conventions those exported
ONNX graphs contain (GroupNorm(32)+SiLU+Conv resnets, GEGLU transformer
blocks, sinusoidal timestep embedding).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(x, w, b=None, stride=1, padding=1):
    """x [B,H,W,Cin], w [kh,kw,Cin,Cout] -> [B,H',W',Cout]."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def linear(x, w, b=None):
    """x [..., Din], w [Din, Dout]."""
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def group_norm(x, w, b, groups=32, eps=1e-5):
    """Channels-last group norm over [B, ..., C]."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(x.shape[0], -1, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape[0], -1, c) * w + b
    return xf.reshape(x.shape).astype(x.dtype)


def layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if w is not None:
        out = out * w + b
    return out.astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def timestep_embedding(t, dim, *, flip_sin_to_cos=True, freq_shift=0.0,
                       max_period=10000.0):
    """Sinusoidal timestep embedding, Stable Diffusion convention.

    t: scalar or [B] int/float timesteps -> [B, dim].
    """
    t = jnp.atleast_1d(jnp.asarray(t, jnp.float32))
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = t[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], -1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def attention(q, k, v, num_heads, mask=None):
    """Multi-head attention over token dims.

    q [B,Tq,D], k/v [B,Tk,D] (already projected) -> [B,Tq,D].
    Optional boolean mask [Tq,Tk] (True = attend). fp32 softmax; MXU
    matmuls. Shared by the diffusion transformers, the CLIP text encoder,
    and the Whisper audio tower.
    """
    b, tq, d = q.shape
    tk = k.shape[1]
    dh = d // num_heads
    q = q.reshape(b, tq, num_heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, tk, num_heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, tk, num_heads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(dh)
    if mask is not None:
        s = jnp.where(mask[None, None], s, -jnp.inf)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhts,bhsd->bhtd", a, v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    return o.transpose(0, 2, 1, 3).reshape(b, tq, d)


def upsample_nearest_2x(x):
    """[B,H,W,C] -> [B,2H,2W,C] nearest-neighbor."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


# ---------------------------------------------------------------------------
# torch-layout converters (used by the from_diffusers / from_hf mappers)

def t_conv(w: np.ndarray) -> jnp.ndarray:
    """torch conv OIHW -> HWIO."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32)


def t_lin(w: np.ndarray) -> jnp.ndarray:
    """torch linear [out,in] -> [in,out]."""
    return jnp.asarray(np.ascontiguousarray(w.T), jnp.float32)


def t_vec(w: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(w, jnp.float32)
