"""Layer primitives: RMSNorm, RoPE, SwiGLU.

These stay as plain JAX — XLA fuses them into surrounding ops (the
reference needs dedicated executions CPURoPE.cpp / CPULayerNorm.cpp and
converter fusion passes FuseLayerNormRMS/FuseGeLu for the same effect,
/root/reference/tools/converter/source/optimizer/merge/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 scaling=None):
    """positions [B, T] int32 -> cos/sin [B, T, head_dim//2] f32.

    scaling: optional Llama-3-style long-context frequency rescale
    (factor, low_freq_factor, high_freq_factor, original_max_pos) — the HF
    `rope_scaling {"rope_type": "llama3"}` rule: low-frequency bands are
    divided by `factor`, high-frequency bands kept, and the middle band
    interpolated (Llama-3.1/3.2 checkpoints require this; without it long
    positions alias).
    """
    half = head_dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    if scaling is not None and scaling[3] < 0:
        # linear scaling (gemma3 global rope): every band / factor
        freqs = freqs / scaling[0]
        scaling = None
    if scaling is not None:
        factor, low_f, high_f, orig_max = scaling
        wavelen = 2.0 * jnp.pi / freqs
        low_wl = orig_max / low_f
        high_wl = orig_max / high_f
        smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
        mid = (1.0 - smooth) * freqs / factor + smooth * freqs
        freqs = jnp.where(
            wavelen > low_wl, freqs / factor,
            jnp.where(wavelen < high_wl, freqs, mid),
        )
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [B, T, half]
    return jnp.cos(angles), jnp.sin(angles)


def rope_cos_sin_mrope(positions3: jax.Array, head_dim: int, theta: float,
                       sections):
    """Multimodal rope (qwen2-vl mrope): positions3 [B, T, 3] holding the
    (temporal, height, width) position of each token -> cos/sin
    [B, T, head_dim//2].

    Frequency bands are partitioned by `sections` (sums to head_dim//2);
    band i takes its rotation angle from position component i. For pure
    text, all three components are equal and this reduces EXACTLY to
    rope_cos_sin — so text-only decode needs no position plumbing.
    """
    half = head_dim // 2
    assert sum(sections) == half, (sections, half)
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = positions3.astype(jnp.float32)[..., None] * freqs  # [B,T,3,half]
    sel = jnp.asarray(
        sum(([i] * s for i, s in enumerate(sections)), []), jnp.int32)
    angles = jnp.take_along_axis(
        angles, sel.reshape(1, 1, 1, half), axis=2)[:, :, 0]  # [B,T,half]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, H, T, D] with neox-style half rotation (HF convention)."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[:, None]  # [B, 1, T, half]
    s = sin[:, None]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up


# Gate/up packing granularity for the fused wgu projection: columns
# alternate 64-wide blocks [gate_64k..  | up_64k.. | gate.. | up..].
# 64-block (not per-channel pair) interleave because the decode megakernel
# must split gate/up with plain aligned lane slices — Mosaic has no
# strided-lane slice or (.., N) -> (.., N/2, 2) shape cast. 64 (not 128) so
# any TP shard with (I/tp) % 64 == 0 keeps whole (gate, up) block pairs
# under contiguous N-sharding (e.g. Qwen2.5-7B I=18944, tp=8 -> 2368).
GU_BLOCK = 64


def gu_block_for(intermediate: int) -> int:
    """Layout block for a given (possibly shard-local) intermediate size.

    Largest power of two <= 64 dividing I: 64 for every real model (and for
    their TP shards, so layout and split agree across sharding); smaller for
    tiny test configs, degrading gracefully to narrow blocks."""
    blk = GU_BLOCK
    while blk > 1 and intermediate % blk:
        blk //= 2
    return blk


def split_gate_up(gu: jax.Array):
    """gu [..., 2I] in the block-interleaved layout -> (gate, up) [..., I]."""
    lead = gu.shape[:-1]
    n = gu.shape[-1]
    blk = gu_block_for(n // 2)
    pairs = gu.reshape(*lead, n // (2 * blk), 2, blk)
    gate = pairs[..., 0, :].reshape(*lead, n // 2)
    up = pairs[..., 1, :].reshape(*lead, n // 2)
    return gate, up


def interleave_gate_up(wg, wu):
    """numpy [K, I] x2 -> [K, 2I] in the 64-block-interleaved layout."""
    import numpy as _np

    k, i = wg.shape
    blk = gu_block_for(i)
    stacked = _np.stack(
        [wg.reshape(k, i // blk, blk),
         wu.reshape(k, i // blk, blk)], axis=2)
    return stacked.reshape(k, 2 * i)


import functools as _functools


@_functools.lru_cache(maxsize=8)
def hadamard(d: int):
    """Orthonormal Hadamard matrix [d, d] f32 (Sylvester; d power of 2).

    The rotation used for KV-cache quantization (TurboQuant's WHT,
    /root/reference/source/backend/cpu/compute/TurboQuant.hpp:5-24):
    H @ H.T = I, entries +-1/sqrt(d) — flattens per-channel outliers so a
    4/8-bit per-token grid covers the mass evenly.

    Returns a NUMPY array on purpose: caching a jax array would capture a
    tracer when the first call happens inside a jit trace, leaking it into
    every later trace.
    """
    import numpy as _np

    if d & (d - 1):
        raise ValueError(f"hadamard requires power-of-2 dim, got {d}")
    h = _np.ones((1, 1), _np.float32)
    while h.shape[0] < d:
        h = _np.block([[h, h], [h, -h]])
    return h / _np.sqrt(d)


def rotate_heads(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Rotate the head dim of x [..., D] by the orthonormal Hadamard."""
    h = hadamard(x.shape[-1])
    if inverse:
        h = h.T
    return jnp.dot(
        x.astype(jnp.float32), jnp.asarray(h),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
