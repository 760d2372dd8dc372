"""Fused single-position decode attention: rope + QK-norm + KV-quantize +
flash attention over the stacked cache, one Pallas kernel per layer.

Why fused: batch-1 decode is dominated by fixed per-op overhead — the
unfused path spends ~25us/layer on the glue between matmuls (q/k/v slicing
and transposes, rope, per-token int8 KV quantization, cache scatters), more
than the attention math itself. The reference has the same structure
collapsed into one Execution (CPUAttention::onExecute appends to the
KVCacheManager and runs blockwise attention in a single op —
/root/reference/source/backend/cpu/CPUAttention.cpp:154-467); this kernel is
the TPU equivalent.

Design:
* The raw fused-QKV projection output enters in its grouped layout
  [B, Hkv, G+2, D] (G query rows, then the K row, then the V row — the
  checkpoint layout defined in models/decoder.LayerParams), so no q/k/v
  splitting or transposition happens in XLA. RoPE, optional QK-RMS-norm
  (qwen3) and per-token int8 quantization all run in-kernel.
* The [L, ...]-stacked KV cache is read in place through scalar-prefetch
  BlockSpec offsets (layer index), tiles auto-double-buffered by Pallas —
  no per-layer cache slice copies.
* The NEW token's K/V never round-trips through HBM: its attention
  contribution seeds the online softmax from VMEM (against the
  quantize->dequantize roundtrip, bit-matching a cache readback), and the
  quantized row + scales are returned for the caller's 4 tiny in-place
  scatters (Mosaic DMA cannot write sub-tile rows into a tiled HBM buffer,
  so the scatter stays in XLA — measured ~1us each).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mnn_tpu.kernels.common import round_up

NEG_INF = -1e30


def _rope_full(x, cos, sin):
    """Neox-style rotation with FULL-width (tiled-twice) cos/sin [1, D]."""
    d2 = x.shape[-1] // 2
    rot = jnp.concatenate([-x[:, d2:], x[:, :d2]], axis=-1)
    return x * cos + rot * sin


def _rms(x, w, eps):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


def _kernel(
    lens_ref,   # SMEM [B] int32 pre-append lengths
    lidx_ref,   # SMEM [1] int32 layer index (consumed by index maps)
    qkv_ref,    # [1, RP, D] bf16 grouped projection rows for this (b, h)
    cs_ref,     # [1, 2, D] f32 (cos; sin) at this sequence's position
    qkn_ref,    # [2, D] f32 (q_norm; k_norm), ones when unused
    k_ref,      # [1, 1, bkv, D] cache tile (int8 or bf16)
    v_ref,
    ks_ref,     # [1, 1, 1, bkv] f32 scale tile (quantized; dummy otherwise)
    vs_ref,
    o_ref,      # [1, GP, D] bf16
    krow_ref,   # [1, 8, D] f32 — row 0: quantized (or bf16-roundtrip) K
    vrow_ref,
    sc_ref,     # [1, 8, 128] f32 — [0,0]=k scale, [1,0]=v scale (quantized)
    q_scr, acc_ref, m_ref, l_ref,
    *, hkv, g, gp, d, bkv, nj, scale, eps,
    quantized, use_qk_norm, window, sink, softcap=0.0,
):
    del lidx_ref
    j = pl.program_id(1)
    b = pl.program_id(0) // hkv
    len_old = lens_ref[b]

    @pl.when(j == 0)
    def _first():
        rows = qkv_ref[0].astype(jnp.float32)        # [RP, D]
        cos = cs_ref[0, 0:1]                          # [1, D]
        sin = cs_ref[0, 1:2]
        q = rows[:gp]                   # [GP, D] (rows >= G are zero padding)
        kr = rows[g : g + 1]                          # [1, D]
        vr = rows[g + 1 : g + 2]
        if use_qk_norm:
            q = _rms(q, qkn_ref[0:1], eps)
            kr = _rms(kr, qkn_ref[1:2], eps)
        q = _rope_full(q, cos, sin)
        kr = _rope_full(kr, cos, sin)
        q_scr[...] = q

        # quantize the new row; attend against the dequant roundtrip so the
        # result bit-matches a cache readback
        if quantized:
            kabs = jnp.max(jnp.abs(kr))
            vabs = jnp.max(jnp.abs(vr))
            ksc = jnp.where(kabs == 0, 1.0, kabs / 127.0)
            vsc = jnp.where(vabs == 0, 1.0, vabs / 127.0)
            kq = jnp.clip(jnp.round(kr / ksc), -127, 127)
            vq = jnp.clip(jnp.round(vr / vsc), -127, 127)
            k_att = kq * ksc
            v_att = vq * vsc
            rowid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            sc_ref[0] = jnp.where(
                rowid == 0, ksc, jnp.where(rowid == 1, vsc, 1.0)
            )
        else:
            kq = kr.astype(jnp.bfloat16).astype(jnp.float32)
            vq = vr.astype(jnp.bfloat16).astype(jnp.float32)
            k_att = kq
            v_att = vq
        krow_ref[0] = jnp.broadcast_to(kq, (8, d))
        vrow_ref[0] = jnp.broadcast_to(vq, (8, d))

        # seed online softmax with the new token (always visible, causal)
        s_new = (q @ k_att.T) * scale                 # [GP, 1]
        if softcap:
            s_new = jnp.tanh(s_new / softcap) * softcap  # gemma2 score cap
        m_ref[...] = jnp.broadcast_to(s_new, m_ref.shape)
        l_ref[...] = jnp.ones_like(l_ref)
        acc_ref[...] = jnp.broadcast_to(v_att, acc_ref.shape)

    kv_start = j * bkv

    @pl.when(kv_start < len_old)
    def _compute():
        q = q_scr[...]
        kt = k_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [GP, bkv]
        if quantized:
            s = s * ks_ref[0, 0]
        s = s * scale
        if softcap:
            s = jnp.tanh(s / softcap) * softcap

        col = kv_start + jax.lax.broadcasted_iota(jnp.int32, (gp, bkv), 1)
        mask = col < len_old
        if window:
            in_window = col > len_old - window
            if sink:
                in_window = jnp.logical_or(in_window, col < sink)
            mask = jnp.logical_and(mask, in_window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        p = jnp.exp(s - m_new[:, :1])
        pv = p * vs_ref[0, 0] if quantized else p
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )
        m_ref[...] = m_new
        vt = v_ref[0, 0].astype(jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot_general(
            pv, vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == nj - 1)
    def _done():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def fused_decode_attention(
    qkv: jax.Array,            # [B, Hkv, G+2, D] grouped projection rows
    k_cache: jax.Array,        # [L, B, Hkv, S, D] int8 or bf16
    v_cache: jax.Array,
    k_scale: Optional[jax.Array],   # [L, B, Hkv, S] f32 (int8 cache)
    v_scale: Optional[jax.Array],
    layer_index,               # int32 scalar
    lengths: jax.Array,        # [B] int32 pre-append lengths
    cos: jax.Array,            # [B, D] f32 FULL-width rope phases (tiled 2x)
    sin: jax.Array,
    *,
    q_norm: Optional[jax.Array] = None,   # [D] f32 (qwen3 QK-norm)
    k_norm: Optional[jax.Array] = None,
    eps: float = 1e-6,
    sm_scale: Optional[float] = None,
    block_kv: int = 512,
    window: int = 0,
    sink: int = 0,
    softcap: float = 0.0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array,
           Optional[jax.Array], Optional[jax.Array]]:
    """Fused decode attention step against the pre-append cache.

    Returns (att [B, H, D], k_row [B, Hkv, 1, D], v_row, k_sc [B, Hkv, 1],
    v_sc): the rows/scales are the quantized new-token entries the caller
    scatters into the cache at each sequence's length (the attention output
    already includes the new token).
    """
    b, hkv, r, d = qkv.shape
    g = r - 2
    quantized = k_cache.dtype == jnp.int8
    nl = k_cache.shape[0]
    s = k_cache.shape[3]
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    gp = round_up(g, 16)
    rp = max(round_up(r, 8), gp)  # kernel reads rows[:gp] as the q block
    if rp != r:
        qkv = jnp.pad(qkv, ((0, 0), (0, 0), (0, rp - r), (0, 0)))
    qkv_g = qkv.reshape(b * hkv, rp, d).astype(jnp.bfloat16)
    cs = jnp.stack([cos, sin], axis=1).astype(jnp.float32)  # [B, 2, D]
    ones = jnp.ones((1, d), jnp.float32)
    qkn = jnp.concatenate(
        [
            ones if q_norm is None else q_norm.reshape(1, d).astype(jnp.float32),
            ones if k_norm is None else k_norm.reshape(1, d).astype(jnp.float32),
        ],
        axis=0,
    )
    use_qk_norm = q_norm is not None

    bkv = min(block_kv, s)
    if s % bkv:
        raise ValueError(f"cache capacity {s} % block_kv {bkv} != 0")
    nj = s // bkv

    lens = jnp.asarray(lengths, jnp.int32)
    lidx = jnp.reshape(jnp.asarray(layer_index, jnp.int32), (1,))

    k4 = k_cache.reshape(nl, b * hkv, s, d)
    v4 = v_cache.reshape(nl, b * hkv, s, d)
    if quantized:
        ks4 = k_scale.reshape(nl, b * hkv, 1, s).astype(jnp.float32)
        vs4 = v_scale.reshape(nl, b * hkv, 1, s).astype(jnp.float32)
        scale_spec = pl.BlockSpec(
            (1, 1, 1, bkv), lambda bh, j, lens, L: (L[0], bh, 0, j)
        )
    else:
        ks4 = jnp.zeros((1, b * hkv, 1, 128), jnp.float32)
        vs4 = jnp.zeros((1, b * hkv, 1, 128), jnp.float32)
        scale_spec = pl.BlockSpec(
            (1, 1, 1, 128), lambda bh, j, lens, L: (0, bh, 0, 0)
        )

    kernel = functools.partial(
        _kernel, hkv=hkv, g=g, gp=gp, d=d, bkv=bkv,
        nj=nj, scale=sm_scale, eps=eps, quantized=quantized,
        use_qk_norm=use_qk_norm, window=window, sink=sink,
        softcap=softcap,
    )

    in_specs = [
        pl.BlockSpec((1, rp, d), lambda bh, j, lens, L: (bh, 0, 0)),
        pl.BlockSpec(
            (1, 2, d), lambda bh, j, lens, L, _hkv=hkv: (bh // _hkv, 0, 0)
        ),
        pl.BlockSpec((2, d), lambda bh, j, lens, L: (0, 0)),
        pl.BlockSpec((1, 1, bkv, d), lambda bh, j, lens, L: (L[0], bh, j, 0)),
        pl.BlockSpec((1, 1, bkv, d), lambda bh, j, lens, L: (L[0], bh, j, 0)),
        scale_spec, scale_spec,
    ]
    row_spec = pl.BlockSpec((1, 8, d), lambda bh, j, lens, L: (bh, 0, 0))
    out_shape = [
        jax.ShapeDtypeStruct((b * hkv, gp, d), jnp.bfloat16),
        jax.ShapeDtypeStruct((b * hkv, 8, d), jnp.float32),
        jax.ShapeDtypeStruct((b * hkv, 8, d), jnp.float32),
        jax.ShapeDtypeStruct((b * hkv, 8, 128), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, gp, d), lambda bh, j, lens, L: (bh, 0, 0)),
        row_spec, row_spec,
        pl.BlockSpec((1, 8, 128), lambda bh, j, lens, L: (bh, 0, 0)),
    ]

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b * hkv, nj),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((gp, d), jnp.float32),       # q
                pltpu.VMEM((gp, d), jnp.float32),       # acc
                pltpu.VMEM((gp, 128), jnp.float32),     # m
                pltpu.VMEM((gp, 128), jnp.float32),     # l
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(lens, lidx, qkv_g, cs, qkn, k4, v4, ks4, vs4)

    att = outs[0].reshape(b, hkv, gp, d)[:, :, :g].reshape(b, hkv * g, d)
    k_row = outs[1][:, 0].reshape(b, hkv, 1, d)
    v_row = outs[2][:, 0].reshape(b, hkv, 1, d)
    if quantized:
        k_sc = outs[3][:, 0, 0].reshape(b, hkv, 1)
        v_sc = outs[3][:, 1, 0].reshape(b, hkv, 1)
        return att, k_row, v_row, k_sc, v_sc
    return att, k_row, v_row, None, None
