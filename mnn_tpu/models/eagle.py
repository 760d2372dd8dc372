"""EAGLE draft model + MTP-style prediction heads for speculative decoding.

TPU-native equivalent of the reference's draft-model generation strategies
(/root/reference/transformers/llm/engine/src/speculative_decoding/generate.hpp:29-105:
`MtpGeneration` loads extra multi-token-prediction modules, `EagleGeneration`
drives an EAGLE draft module with draft→verify accept logic; tokentree.hpp).

Design differences from the reference (TPU-first, not a translation):

* the draft network is one jitted decoder layer over the same quantized-
  weight pytree machinery as the target (fused dequant-matmul kernels), with
  its own 1-layer fixed-capacity KV cache — static shapes so drafting never
  recompiles;
* drafts are CHAINS of fixed length `draft_len` rather than dynamic trees:
  on TPU a fixed-shape verify forward of T = draft_len + 1 costs barely more
  than one decode step, so tree-width buys little and would force dynamic
  attention masks (the reference's retrieveIndices machinery exists because
  its CPU verify cost scales with drafted tokens);
* verification is shared with the lookahead path (runtime/speculative.py):
  greedy-lossless — output is bit-identical to plain autoregressive decode.

EAGLE architecture (matches EAGLE-1 so real draft checkpoints can map on):
input = concat(embed(token_t), feature_{t-1}) -> fc -> one decoder layer
WITHOUT the pre-attention input norm -> hidden; draft logits reuse the
TARGET's lm_head. `feature` = the target's post-final-norm hidden state.

MTP heads are Medusa-style residual blocks off the last target feature:
head_i(feature) predicts token t+1+i; no draft KV state at all.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mnn_tpu.kernels.dequant_matmul import dequant_matmul
from mnn_tpu.kernels.flash_attention import decode_attention, flash_attention
from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import Params, head_logits
from mnn_tpu.models.layers import (apply_rope, rms_norm, rope_cos_sin,
                                   split_gate_up, swiglu)
from mnn_tpu.quant.quantize import QuantizedLinear, quantize
from mnn_tpu.runtime import kvcache
from mnn_tpu.runtime.kvcache import KVCache


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EagleParams:
    """One-layer EAGLE draft network (embedding/lm_head come from the target)."""

    fc: jax.Array               # [2*hidden, hidden] bf16 fuses (embed, feature)
    wqkv: QuantizedLinear       # grouped [Hkv, G+2, D] layout like the target
    wo: QuantizedLinear
    wgu: QuantizedLinear        # gate/up interleaved pairs
    wdown: QuantizedLinear
    post_norm: jax.Array        # [hidden]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MtpHeads:
    """K Medusa/MTP residual heads: h_i = feature + silu(feature @ w[i])."""

    w_res: jax.Array            # [K, hidden, hidden] bf16

    @property
    def num_heads(self) -> int:
        return self.w_res.shape[0]


def init_random_eagle(
    c: ModelConfig, key: jax.Array, bits: int = 4, block_size: int = 128
) -> EagleParams:
    keys = jax.random.split(key, 5)
    h = c.hidden_size
    g = c.num_heads // c.num_kv_heads
    qkv_n = c.num_kv_heads * (g + 2) * c.head_dim
    scale = h ** -0.5

    def ql(k, kin, n):
        w = jax.random.normal(k, (kin, n), jnp.float32) * (kin ** -0.5)
        return quantize(w, bits=bits, block_size=min(block_size, kin))

    return EagleParams(
        fc=(jax.random.normal(keys[0], (2 * h, h), jnp.bfloat16) * scale),
        wqkv=ql(keys[1], h, qkv_n),
        wo=ql(keys[2], c.q_dim, h),
        wgu=ql(keys[3], h, 2 * c.intermediate_size),
        wdown=ql(keys[4], c.intermediate_size, h),
        post_norm=jnp.ones((h,), jnp.float32),
    )


def init_random_mtp(
    c: ModelConfig, key: jax.Array, num_heads: int = 4
) -> MtpHeads:
    h = c.hidden_size
    w = jax.random.normal(key, (num_heads, h, h), jnp.bfloat16) * (h ** -0.5)
    return MtpHeads(w_res=w)


def create_draft_cache(
    c: ModelConfig, capacity: int, batch: int = 1
) -> KVCache:
    """1-layer bf16 KV cache for the draft network (tiny; quant buys nothing)."""
    return kvcache.create(
        1, batch, c.num_kv_heads, capacity, c.head_dim, quantized=False
    )


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def eagle_forward(
    ep: EagleParams,
    params: Params,             # target params: embedding + lm_head reused
    config: ModelConfig,
    tokens: jax.Array,          # [B, T] int32
    features: jax.Array,        # [B, T, hidden] target features, shifted -1
    cache: KVCache,             # 1-layer draft cache
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, KVCache]:
    """Draft layer over (token, feature) pairs. Returns (hidden [B,T,H], cache)."""
    c = config
    b, t = tokens.shape
    emb = params.embedding[tokens].astype(jnp.bfloat16)
    x = jnp.concatenate([emb, features.astype(jnp.bfloat16)], axis=-1)
    x = jnp.dot(x, ep.fc.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    start = cache.length[0]
    positions = cache.length[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    cos, sin = rope_cos_sin(positions, c.head_dim, c.rope_theta,
                            scaling=c.rope_scaling)
    kv_len = jnp.minimum(cache.length + t, cache.capacity)

    # attention, NO pre-norm (EAGLE-1 drops the first input layernorm)
    qkv = dequant_matmul(x, ep.wqkv, interpret=interpret)
    g = c.num_heads // c.num_kv_heads
    qkv = qkv.reshape(b, t, c.num_kv_heads, g + 2, c.head_dim)
    q = qkv[..., :g, :].reshape(b, t, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)
    k = qkv[..., g, :].transpose(0, 2, 1, 3)
    v = qkv[..., g + 1, :].transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if t == 1:
        cache = kvcache.append_decode_stacked(cache, 0, k, v, cache.length)
        att = decode_attention(
            q[:, :, 0], cache.k[0], cache.v[0], kv_len, interpret=interpret,
        )[:, :, None]
    else:
        cache = kvcache.append_stacked(cache, 0, k, v, start)
        att = flash_attention(
            q, cache.k[0], cache.v[0], kv_len=kv_len[0], q_offset=start,
            interpret=interpret,
        )
    att = att.transpose(0, 2, 1, 3).reshape(b, t, c.q_dim)
    x = x + dequant_matmul(att, ep.wo, interpret=interpret).astype(x.dtype)

    h2 = rms_norm(x, ep.post_norm, c.rms_norm_eps)
    gu = dequant_matmul(h2, ep.wgu, interpret=interpret)
    act = swiglu(*split_gate_up(gu))
    x = x + dequant_matmul(act, ep.wdown, interpret=interpret).astype(x.dtype)

    cache = dataclasses.replace(cache, length=kv_len)
    return x, cache


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def eagle_next_token(
    ep: EagleParams,
    params: Params,
    config: ModelConfig,
    token: jax.Array,           # [B, 1] int32
    feature: jax.Array,         # [B, 1, hidden]
    cache: KVCache,
    *,
    interpret: Optional[bool] = None,
):
    """One chain step: returns (argmax token [B], draft hidden [B,1,H], cache)."""
    h, cache = eagle_forward(
        ep, params, config, token, feature, cache, interpret=interpret
    )
    logits = head_logits(params, h[:, -1], interpret=interpret)
    return jnp.argmax(logits, axis=-1), h, cache


@functools.partial(jax.jit, static_argnames=("interpret",))
def mtp_propose(
    heads: MtpHeads,
    params: Params,
    feature: jax.Array,         # [B, hidden] last target feature
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Greedy chain from the MTP heads: token for t+1+i per head. [B, K]."""
    f = feature.astype(jnp.bfloat16)
    toks = []
    for i in range(heads.num_heads):
        hi = f + jax.nn.silu(
            jnp.dot(f, heads.w_res[i], preferred_element_type=jnp.float32)
        ).astype(jnp.bfloat16)
        logits = head_logits(params, hi, interpret=interpret)
        toks.append(jnp.argmax(logits, axis=-1))
    return jnp.stack(toks, axis=-1)
