"""Prefill + autoregressive decode driver.

TPU re-design of the reference's generation engine
(/root/reference/transformers/llm/engine/src/llm.cpp forwardRaw/generate and
speculative_decoding/generate.cpp ArGeneration): the decode loop runs as a
`lax.scan` emitting `decode_block` tokens per device dispatch — on this
platform a dispatch costs ~1.6 ms, so token-at-a-time host loops (the
reference's model, fine on-device on a phone) would cap decode at ~600 tok/s
regardless of model size. Sampling runs inside the scan (on device).

Prefill is chunked (reference: `chunk`/`chunk_limits`, llm.cpp:722-729) and
bucketed to power-of-two lengths so the number of compiled prefill shapes is
O(log max_len) — the TPU analog of the reference's prefill module pool
keyed by shape (llm.cpp:351-398).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig, RuntimeConfig
from mnn_tpu.models.decoder import Params, forward
from mnn_tpu.runtime import sampler as sampler_mod
from mnn_tpu.runtime.kvcache import KVCache
from mnn_tpu.runtime.sampler import SamplerState


def prefill_buckets(n: int, chunk: int, min_bucket: int = 32):
    """Split n tokens into power-of-2 bucketed chunks (each <= chunk)."""
    out = []
    remaining = n
    while remaining > 0:
        if remaining >= chunk:
            out.append(chunk)
            remaining -= chunk
        else:
            b = min_bucket
            while b < remaining:
                b *= 2
            out.append(min(b, chunk))
            remaining = 0
    return out


def pad_tokens(tokens, bucket: int, pad_id: int = 0):
    pad = bucket - tokens.shape[1]
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad)), constant_values=pad_id)
    return tokens


@functools.partial(jax.jit, static_argnames=("config", "valid"))
def prefill_chunk(
    params: Params,
    config: ModelConfig,
    tokens: jax.Array,    # [B, bucket] (padded)
    cache: KVCache,
    valid: int,           # real token count in this (padded) chunk
) -> Tuple[jax.Array, KVCache]:
    """One prefill chunk. Returns (last-valid-token logits [B, V], cache)."""
    if valid == tokens.shape[1]:
        return forward(params, config, tokens, cache)
    logits, cache = forward(params, config, tokens, cache, all_logits=True)
    # padded tail was appended to the cache; roll it back
    cache = dataclasses.replace(
        cache, length=cache.length - (tokens.shape[1] - valid)
    )
    return logits[:, valid - 1], cache


@functools.partial(jax.jit, static_argnames=("config", "valid"))
def prefill_chunk_embeds(
    params: Params,
    config: ModelConfig,
    embeds: jax.Array,    # [B, bucket, hidden] (padded)
    cache: KVCache,
    valid: int,
) -> Tuple[jax.Array, KVCache]:
    """Prefill chunk from input embeddings (multimodal splice path —
    reference: Omni feeds spliced embeddings through forwardRaw)."""
    b, t, _ = embeds.shape
    tokens = jnp.zeros((b, t), jnp.int32)
    if valid == t:
        return forward(params, config, tokens, cache, inputs_embeds=embeds)
    logits, cache = forward(params, config, tokens, cache,
                            inputs_embeds=embeds, all_logits=True)
    cache = dataclasses.replace(cache, length=cache.length - (t - valid))
    return logits[:, valid - 1], cache


def run_prefill_embeds(params, config, rt: RuntimeConfig, embeds, cache):
    """Chunked, bucketed prefill over [B, T, hidden] embeddings."""
    params = prefill_params_view(params, rt)
    t = embeds.shape[1]
    logits = None
    off = 0
    for bucket in prefill_buckets(t, rt.prefill_chunk):
        valid = min(bucket, t - off)
        chunk = embeds[:, off: off + valid]
        if valid < bucket:
            chunk = jnp.pad(chunk, ((0, 0), (0, bucket - valid), (0, 0)))
        logits, cache = prefill_chunk_embeds(params, config, chunk, cache,
                                             valid)
        off += valid
    return logits, cache


def prefill_params_view(params: Params, rt: RuntimeConfig) -> Params:
    """Apply the prefill activation-precision view (W4A8): same packed
    weights, act_bits=8 static metadata, so dequant_matmul routes prefill
    GEMMs through the int8-MXU kernel. Measured +3-5% prefill on chip;
    decode keeps bf16 activations (neutral there). ≈ the reference's
    MergeDynamicQuant prefill-only dynamic quantization."""
    if rt.prefill_act_bits != 8:
        return params

    def a8(ql):
        return None if ql is None else dataclasses.replace(ql, act_bits=8)

    lay = params.layers
    lay = dataclasses.replace(
        lay, wqkv=a8(lay.wqkv), wo=a8(lay.wo), wgu=a8(lay.wgu),
        wdown=a8(lay.wdown))
    return dataclasses.replace(params, layers=lay)


def run_prefill(params, config, rt: RuntimeConfig, tokens, cache):
    """Chunked, bucketed prefill over [B, T] tokens."""
    params = prefill_params_view(params, rt)
    t = tokens.shape[1]
    logits = None
    off = 0
    for bucket in prefill_buckets(t, rt.prefill_chunk):
        valid = min(bucket, t - off)
        chunk = pad_tokens(tokens[:, off : off + valid], bucket)
        logits, cache = prefill_chunk(params, config, chunk, cache, valid)
        off += valid
    return logits, cache


@functools.partial(
    jax.jit,
    static_argnames=("config", "steps", "sampler", "temperature", "top_k",
                     "top_p", "min_p", "penalty"),
)
def decode_steps(
    params: Params,
    config: ModelConfig,
    cache: KVCache,
    first_logits: jax.Array,   # [B, V] logits for the next position
    state: SamplerState,
    key: jax.Array,
    *,
    steps: int,
    sampler: str = "greedy",
    temperature: float = 1.0,
    top_k: int = 40,
    top_p: float = 0.9,
    min_p: float = 0.05,
    penalty: float = 1.0,
    logit_bias=None,   # [V] additive bias array (traced) or None
):
    """Sample + forward `steps` times in one dispatch.

    Returns (tokens [B, steps], last_logits, cache, state, key).
    """

    def sample_fn(logits, k, st):
        return sampler_mod.sample(
            logits, k, st, sampler=sampler, temperature=temperature,
            top_k=top_k, top_p=top_p, min_p=min_p, penalty=penalty,
            logit_bias=logit_bias,
        )

    greedy = (sampler == "greedy"
              or (sampler == "temperature" and temperature == 0.0))
    if greedy and logit_bias is None and penalty == 1.0:
        # Greedy fast path: the megakernel's fused lm-head phase already
        # computed argmax in-kernel (forward(return_token=True)); the scan
        # body feeds that token straight back — no XLA pass over the
        # 150k-logit row per step. Ring-buffer bookkeeping is kept so a
        # caller that later enables penalty sees the same state.
        tok0 = jnp.argmax(first_logits.astype(jnp.float32),
                          axis=-1).astype(jnp.int32)

        def body_greedy(carry, _):
            cache, tok, _, st = carry
            (logits, ntok), cache = forward(
                params, config, tok[:, None], cache, return_token=True
            )
            st = sampler_mod.record_token(st, tok)
            return (cache, ntok, logits, st), tok

        (cache, _, last_logits, state), toks = jax.lax.scan(
            body_greedy, (cache, tok0, first_logits, state), None,
            length=steps,
        )
        return jnp.transpose(toks), last_logits, cache, state, key

    def body(carry, _):
        cache, logits, st, key = carry
        key, sub = jax.random.split(key)
        tok, st = sample_fn(logits, sub, st)
        new_logits, cache = forward(params, config, tok[:, None], cache)
        return (cache, new_logits, st, key), tok

    (cache, last_logits, state, key), toks = jax.lax.scan(
        body, (cache, first_logits, state, key), None, length=steps
    )
    return jnp.transpose(toks), last_logits, cache, state, key
