"""DFlash: block-diffusion draft model for speculative decoding.

TPU-native equivalent of the reference's fourth speculative mode
(/root/reference/transformers/llm/engine/src/speculative_decoding/
dflash.cpp): unlike chain/tree EAGLE or MTP, DFlash drafts a WHOLE block
of tokens in one forward pass of a small NON-CAUSAL (bidirectional)
transformer. The draft net attends over:

  [ context_hidden | noise block ]

where context_hidden = fc(target hidden states) (the reference runs fc in
f32 — its input can be a num_layers*H concat — dflash.cpp:60-82) and the
noise block is the embedding of `block_size` MASK tokens at the NEXT
block's rope positions (separate q/k position ids, dflash.cpp:196-213).
One forward emits logits for every block position; the target model then
verifies the block with the standard lossless accept loop.

TPU design notes: the draft context lives in a fixed-capacity [1, C, H]
buffer with a length mask (static shapes under jit; the reference grows a
VARP), and the tiny bidirectional attention runs as plain XLA einsums —
at draft shapes (C <= a few hundred, B <= 16) a Pallas kernel would be
all overhead.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mnn_tpu.models.layers import rms_norm, rope_cos_sin, swiglu


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DFlashParams:
    """Draft-net weights (bf16 — the net is tiny; quantizing it saves
    nothing measurable) + the f32 fc context projection."""

    fc: jax.Array              # [H_in, H] f32 (reference runs fc in f32)
    wqkv: jax.Array            # [L, H, (G+2k)*D] grouped like the target
    wo: jax.Array              # [L, H, H]
    wgu: jax.Array             # [L, H, 2*I]
    wdown: jax.Array           # [L, I, H]
    in_norm: jax.Array         # [L, H]
    post_norm: jax.Array       # [L, H]
    final_norm: jax.Array      # [H]
    num_heads: int = dataclasses.field(metadata=dict(static=True), default=4)
    num_kv_heads: int = dataclasses.field(
        metadata=dict(static=True), default=2)
    head_dim: int = dataclasses.field(metadata=dict(static=True), default=64)
    mask_token_id: int = dataclasses.field(
        metadata=dict(static=True), default=0)
    block_size: int = dataclasses.field(metadata=dict(static=True), default=8)


def init_random_dflash(config, key, *, layers: int = 1, block_size: int = 8,
                       mask_token_id: Optional[int] = None,
                       scale: float = 0.02) -> DFlashParams:
    """Random draft net sized from the target config (no draft checkpoint
    in this environment; the verify loop is lossless regardless)."""
    h = config.hidden_size
    d = config.head_dim
    nh = max(2, config.num_heads // 4)
    nkv = max(1, config.num_kv_heads // 4)
    i_dim = max(128, h // 2)
    nq = (nh + 2 * nkv) * d
    ks = jax.random.split(key, 7)

    def w(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
            jnp.bfloat16)

    return DFlashParams(
        fc=jax.random.normal(ks[0], (h, h), jnp.float32) * scale,
        wqkv=w(ks[1], layers, h, nq),
        wo=w(ks[2], layers, nh * d, h),
        wgu=w(ks[3], layers, h, 2 * i_dim),
        wdown=w(ks[4], layers, i_dim, h),
        in_norm=jnp.ones((layers, h), jnp.bfloat16),
        post_norm=jnp.ones((layers, h), jnp.bfloat16),
        final_norm=jnp.ones((h,), jnp.bfloat16),
        num_heads=nh, num_kv_heads=nkv, head_dim=d,
        mask_token_id=(mask_token_id if mask_token_id is not None
                       else config.vocab_size - 1),
        block_size=block_size,
    )


def fc_forward(dp: DFlashParams, feats: jax.Array) -> jax.Array:
    """context_hidden = fc(target hidden) in f32 (dflash.cpp precision
    note: the high-fan-in projection NaNs in fp16)."""
    y = jnp.dot(feats.astype(jnp.float32), dp.fc,
                preferred_element_type=jnp.float32)
    return jnp.nan_to_num(y)   # reference sanitizes fc outputs the same way


@functools.partial(jax.jit, static_argnames=("config",))
def dflash_block_logits(dp: DFlashParams, params, config,
                        ctx: jax.Array,        # [1, C, H] f32 context buffer
                        ctx_len: jax.Array,    # [] int32 valid rows
                        start_pos: jax.Array,  # [] int32 rope pos of ctx[0]
                        ) -> jax.Array:
    """One non-causal draft forward: returns [1, B, vocab] block logits.

    The whole sequence [ctx | mask-block] runs through the bidirectional
    layers (everything attends to everything valid); only the trailing
    block's logits are computed through the target's embedding/head.
    """
    c = config
    b_sz = dp.block_size
    cap = ctx.shape[1]
    h = c.hidden_size
    d = dp.head_dim
    nh, nkv = dp.num_heads, dp.num_kv_heads
    g = nh // nkv

    noise = params.embedding[jnp.full((b_sz,), dp.mask_token_id,
                                      jnp.int32)][None]       # [1, B, H]
    x = jnp.concatenate([ctx.astype(jnp.bfloat16),
                         noise.astype(jnp.bfloat16)], axis=1)  # [1, C+B, H]
    t = cap + b_sz
    # rope positions: ctx rows at start_pos + i, block at start_pos + len + i
    idx = jnp.arange(t)
    pos = jnp.where(idx < cap, start_pos + idx,
                    start_pos + ctx_len + (idx - cap))
    cos, sin = rope_cos_sin(pos[None], d, c.rope_theta)
    # validity: ctx rows < ctx_len, all block rows
    valid = jnp.logical_or(idx >= cap, idx < ctx_len)

    def rope(v):  # v [1, T, Hd, D]; cos/sin [1, T, D//2]
        c2 = cos[:, :, None].astype(jnp.float32)   # [1, T, 1, D//2]
        s2 = sin[:, :, None].astype(jnp.float32)
        half = v.shape[-1] // 2
        v1 = v[..., :half].astype(jnp.float32)
        v2 = v[..., half:].astype(jnp.float32)
        return jnp.concatenate(
            [v1 * c2 - v2 * s2, v2 * c2 + v1 * s2], axis=-1).astype(v.dtype)

    for li in range(dp.wqkv.shape[0]):
        hn = rms_norm(x, dp.in_norm[li], c.rms_norm_eps)
        qkv = jnp.dot(hn, dp.wqkv[li],
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        qkv = qkv.reshape(1, t, nkv, g + 2, d)
        q = qkv[:, :, :, :g].reshape(1, t, nh, d)
        k = qkv[:, :, :, g].reshape(1, t, nkv, d)
        v = qkv[:, :, :, g + 1].reshape(1, t, nkv, d)
        q, k = rope(q), rope(k)
        kr = jnp.repeat(k, g, axis=2)
        vr = jnp.repeat(v, g, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       kr.astype(jnp.float32)) / (d ** 0.5)
        # NON-causal: mask only invalid (unused-capacity) context rows
        s = jnp.where(valid[None, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, vr.astype(jnp.float32))
        o = o.reshape(1, t, nh * d).astype(jnp.bfloat16)
        x = x + jnp.dot(o, dp.wo[li],
                        preferred_element_type=jnp.float32).astype(
                            jnp.bfloat16)
        hn = rms_norm(x, dp.post_norm[li], c.rms_norm_eps)
        gu = jnp.dot(hn, dp.wgu[li],
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        i_dim = dp.wdown[li].shape[0]
        act = swiglu(gu[..., :i_dim], gu[..., i_dim:])
        x = x + jnp.dot(act, dp.wdown[li],
                        preferred_element_type=jnp.float32).astype(
                            jnp.bfloat16)

    blk = rms_norm(x[:, cap:], dp.final_norm, c.rms_norm_eps)
    head = params.lm_head
    if head is None:
        w_out = params.embedding.T.astype(jnp.bfloat16)
        return jnp.dot(blk, w_out, preferred_element_type=jnp.float32)
    from mnn_tpu.quant.quantize import QuantizedLinear
    if isinstance(head, QuantizedLinear):
        from mnn_tpu.quant.quantize import matmul_dequant_ref
        return matmul_dequant_ref(blk, head, dtype=jnp.float32)
    return jnp.dot(blk, head.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
