"""Sampling pipeline (greedy/temperature/topK/topP/minP/penalty + mixed chain).

Port of the reference's sampler semantics
(/root/reference/transformers/llm/engine/src/sampler.hpp:31-54, sampler.cpp:159,236):
MNN chains `penalty -> temperature -> topK -> topP -> minP` in its `mixed`
sampler. Here every stage is a pure jittable transform on the logits row so
the whole chain runs on-device inside the decode scan (the reference samples
on CPU between forwards; on TPU that would cost a host round-trip per token).

Repetition penalty keeps a fixed-size ring buffer of recent tokens in the
sampler state (≈ MNN's penalty window) so it stays shape-static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplerState:
    """Ring buffer of recent tokens for repetition penalty."""

    recent: jax.Array   # [B, W] int32, init -1
    pos: jax.Array      # [] int32 ring pointer


def make_state(batch: int, window: int = 64) -> SamplerState:
    return SamplerState(
        recent=jnp.full((batch, window), -1, jnp.int32),
        pos=jnp.zeros((), jnp.int32),
    )


def record_token(state: SamplerState, token: jax.Array) -> SamplerState:
    """Push sampled tokens [B] into the ring buffer."""
    w = state.recent.shape[1]
    recent = jax.lax.dynamic_update_slice(
        state.recent, token[:, None].astype(jnp.int32), (0, state.pos % w)
    )
    return SamplerState(recent=recent, pos=state.pos + 1)


def apply_penalty(logits: jax.Array, state: SamplerState, penalty: float) -> jax.Array:
    """CTRL-style repetition penalty on tokens in the window (sampler.cpp)."""
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    w = state.recent.shape[1]
    tok = jnp.clip(state.recent, 0, v - 1)                      # [B, W]
    valid = state.recent >= 0
    onehot_counts = jnp.zeros((b, v), jnp.float32).at[
        jnp.arange(b)[:, None], tok
    ].add(valid.astype(jnp.float32))
    seen = onehot_counts > 0
    lf = logits.astype(jnp.float32)
    penalized = jnp.where(lf > 0, lf / penalty, lf * penalty)
    return jnp.where(seen, penalized, lf)


def apply_temperature(logits: jax.Array, temperature: float) -> jax.Array:
    if temperature == 1.0:
        return logits
    t = max(temperature, 1e-4)
    return logits / t


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    vals, _ = jax.lax.top_k(logits, k)
    cutoff = vals[..., -1:]
    return jnp.where(logits < cutoff, NEG_INF, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the smallest prefix with cumulative prob >= p (always >= 1 token)
    keep = cum - probs < p
    cutoff = jnp.max(jnp.where(keep, sorted_logits, NEG_INF), axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def apply_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = jnp.max(probs, axis=-1, keepdims=True) * min_p
    return jnp.where(probs < cutoff, NEG_INF, logits)


def apply_tfs(logits: jax.Array, z: float) -> jax.Array:
    """Tail-free sampling (second derivative of sorted probs), sampler.cpp."""
    if z >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    d2 = jnp.abs(jnp.diff(jnp.diff(probs, axis=-1), axis=-1))
    d2 = d2 / jnp.maximum(jnp.sum(d2, axis=-1, keepdims=True), 1e-9)
    cum = jnp.cumsum(d2, axis=-1)
    keep_n = jnp.sum(cum < z, axis=-1, keepdims=True) + 1  # at least 1
    cutoff = jnp.take_along_axis(sorted_logits, keep_n, axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def apply_typical(logits: jax.Array, p: float) -> jax.Array:
    """Locally-typical sampling (sampler.cpp `typical`)."""
    if p >= 1.0:
        return logits
    lf = logits.astype(jnp.float32)
    probs = jax.nn.softmax(lf, axis=-1)
    logp = jax.nn.log_softmax(lf, axis=-1)
    ent = -jnp.sum(probs * logp, axis=-1, keepdims=True)
    dev = jnp.abs(-logp - ent)
    order = jnp.argsort(dev, axis=-1)
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = cum - probs_sorted < p
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    return jnp.where(keep, lf, NEG_INF)


def sample(
    logits: jax.Array,          # [B, V]
    key: jax.Array,
    state: Optional[SamplerState] = None,
    *,
    sampler: str = "mixed",
    temperature: float = 1.0,
    top_k: int = 40,
    top_p: float = 0.9,
    min_p: float = 0.05,
    tfs_z: float = 1.0,
    typical_p: float = 1.0,
    penalty: float = 1.0,
    logit_bias: Optional[jax.Array] = None,   # [V] or [B, V] additive bias
):
    """Returns (tokens [B], new_state). Order follows MNN's mixed chain.

    logit_bias: per-token additive bias applied before everything else
    (the OpenAI-API semantics; reference llmconfig.hpp:517-520). -inf
    entries ban tokens outright. [B, V] gives each batch row (serving
    slot) its own bias.
    """
    lf = logits.astype(jnp.float32)
    if logit_bias is not None:
        b = logit_bias.astype(jnp.float32)
        lf = lf + (b if b.ndim == 2 else b[None, :])
    if state is not None and penalty != 1.0:
        lf = apply_penalty(lf, state, penalty)

    if sampler == "greedy" or (sampler == "temperature" and temperature == 0.0):
        tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)
    else:
        if sampler in ("temperature", "mixed"):
            lf = apply_temperature(lf, temperature)
        if sampler in ("topK", "mixed"):
            lf = apply_top_k(lf, top_k)
        if sampler in ("topP", "mixed"):
            lf = apply_top_p(lf, top_p)
        if sampler in ("minP", "mixed"):
            lf = apply_min_p(lf, min_p)
        if sampler == "tfs":
            lf = apply_tfs(lf, tfs_z)
        if sampler == "typical":
            lf = apply_typical(lf, typical_p)
        tok = jax.random.categorical(key, lf, axis=-1).astype(jnp.int32)

    if state is not None:
        state = record_token(state, tok)
    return tok, state
