"""Flash attention Pallas kernels: prefill (causal GQA) and decode (int8 KV).

TPU-native equivalent of the reference's blockwise attention executions
(`CPUAttention.cpp` flash path with block=64 and running max/sum rescaling,
/root/reference/source/backend/cpu/CPUAttention.cpp:154-467; Metal simdgroup
flash in MetalAttention.mm; KV int8 quant modes in CPUKVCacheManager.hpp:20).

Two kernels, matching the two execution regimes (the reference swaps module
variants per stage, llm.cpp:511 switchMode):

* `flash_attention` — prefill: queries in [bq]-row tiles, KV scanned in
  [bkv]-column tiles with online softmax (running max `m`, running sum `l`,
  f32 accumulator), causal mask offset by the number of already-cached tokens
  (enables chunked prefill), GQA by indexing the KV head as q_head // group.
* `decode_attention` — single-position decode: the GQA group dimension is
  packed into MXU rows (q [B, Hkv, G, D]) so each KV block is loaded once per
  kv head, and KV may be int8 with per-token scales; scales are applied to
  score columns / probability columns instead of dequantizing K/V elementwise
  (defers the multiply out of the inner dot).

Both kernels mask KV positions >= kv_len so callers run over a
fixed-capacity cache with static shapes (no recompile per step).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mnn_tpu.kernels.common import interpret_mode, round_up, use_pallas

NEG_INF = -1e30


def attention_xla_ref(
    q, k, v, kv_len=None, q_offset=None, causal=True, sm_scale=None,
    k_scale=None, v_scale=None, window=0, sink=0,
):
    """Pure-XLA masked-softmax attention — the off-TPU reference path and the
    numerics oracle (float32 math). q [B,H,Tq,D], k/v [B,Hkv,S,D]."""
    b, h, tq, d = q.shape
    _, hkv, s, _ = k.shape
    group = h // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if k_scale is not None:
        kf = kf * k_scale[..., None]
    if v_scale is not None:
        vf = vf * v_scale[..., None]
    kf = jnp.repeat(kf, group, axis=1)
    vf = jnp.repeat(vf, group, axis=1)
    scores = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32), kf) * sm_scale
    if kv_len is None:
        kv_len = jnp.asarray(s)
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len), (b,))
    col = jnp.arange(s)
    mask = col[None, None, None, :] < kv_len[:, None, None, None]
    if q_offset is None:
        q_offset = kv_len - tq
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset), (b,))
    row_pos = q_offset[:, None] + jnp.arange(tq)[None, :]  # [B, Tq]
    if causal:
        mask = jnp.logical_and(
            mask, col[None, None, None, :] <= row_pos[:, None, :, None]
        )
    if window:
        # sliding window with optional attention sink (reference
        # CPUAttention.cpp:209: keep the first `sink` positions visible)
        in_window = col[None, None, None, :] > (
            row_pos[:, None, :, None] - window)
        if sink:
            in_window = jnp.logical_or(in_window, col[None, None, None, :] < sink)
        mask = jnp.logical_and(mask, in_window)
    scores = jnp.where(mask, scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, vf).astype(q.dtype)


def _prefill_kernel(
    lens_ref,  # SMEM [2] int32: (kv_len, q_offset)
    q_ref, k_ref, v_ref, o_ref,
    acc_ref, m_ref, l_ref,
    *, bq, bkv, scale, causal, window, sink,
):
    kv_idx = pl.program_id(2)
    kv_start = kv_idx * bkv
    kv_len = lens_ref[0]

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kv_start < kv_len)
    def _compute():
        q = q_ref[0]  # [bq, d]
        k = k_ref[0]  # [bkv, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bkv]

        col = kv_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
        mask = col < kv_len
        q_pos = (
            lens_ref[1]
            + pl.program_id(1) * bq
            + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
        )
        if causal:
            mask = jnp.logical_and(mask, col <= q_pos)
        if window:
            in_window = col > q_pos - window
            if sink:
                in_window = jnp.logical_or(in_window, col < sink)
            mask = jnp.logical_and(mask, in_window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]  # [bq, 128] (column-replicated row stats)
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        p = jnp.exp(s - m_new[:, :1])
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )
        m_ref[...] = m_new
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _done():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_kv", "interpret", "sm_scale",
                     "window", "sink"),
)
def flash_attention(
    q: jax.Array,  # [B, H, Tq, D]
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,  # [B, Hkv, S, D]
    *,
    kv_len: Optional[jax.Array] = None,  # [] int32 valid KV prefix (default S)
    q_offset: Optional[jax.Array] = None,  # global position of query row 0
    causal: bool = True,
    sm_scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
    window: int = 0,
    sink: int = 0,
) -> jax.Array:
    """Attention over a (possibly partially filled) KV buffer. Returns [B,H,Tq,D]."""
    if not use_pallas(interpret):
        return attention_xla_ref(
            q, k, v, kv_len=kv_len, q_offset=q_offset, causal=causal,
            sm_scale=sm_scale, window=window, sink=sink,
        )
    if interpret is None:
        interpret = interpret_mode()
    b, h, tq, d = q.shape
    _, hkv, s, _ = k.shape
    group = h // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    if kv_len is None:
        kv_len = jnp.asarray(s, jnp.int32)
    if q_offset is None:
        q_offset = kv_len - tq

    bq = min(block_q, round_up(tq, 16))
    bkv = min(block_kv, s)
    tq_pad = round_up(tq, bq)
    if tq_pad != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))
    if s % bkv:
        pad = round_up(s, bkv) - s
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        s += pad

    lens = jnp.stack(
        [jnp.asarray(kv_len, jnp.int32), jnp.asarray(q_offset, jnp.int32)]
    )

    q3 = q.reshape(b * h, tq_pad, d)
    k3 = k.reshape(b * hkv, s, d)
    v3 = v.reshape(b * hkv, s, d)

    def kv_map(bh, i, j, *_):
        return ((bh // h) * hkv + (bh % h) // group, j, 0)

    kernel = functools.partial(
        _prefill_kernel, bq=bq, bkv=bkv, scale=sm_scale, causal=causal,
        window=window, sink=sink,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, tq_pad // bq, s // bkv),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda bh, i, j, *_: (bh, i, 0)),
                pl.BlockSpec((1, bkv, d), kv_map),
                pl.BlockSpec((1, bkv, d), kv_map),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda bh, i, j, *_: (bh, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(lens, q3, k3, v3)
    return out.reshape(b, h, tq_pad, d)[:, :, :tq]


# ---------------------------------------------------------------------------
# Decode attention: GQA group packed into rows, optional int8 KV cache.
# ---------------------------------------------------------------------------


def _unpack_nibbles(t, axis):
    """int8 [.., n] -> bf16 [.., 2n]: byte j holds dims (j, j + n) — the
    pairing defined by kvcache.quantize_kv4 / quantize.pack_int4, which
    makes in-kernel unpack one lane/sublane concat instead of a shuffle."""
    t32 = t.astype(jnp.int32)
    lo = (t32 & 0xF) - 8
    hi = ((t32 >> 4) & 0xF) - 8
    return jnp.concatenate([lo, hi], axis=axis).astype(jnp.bfloat16)


def _decode_kernel(
    lens_ref,   # SMEM [B*Hkv] int32 per-sequence kv length
    lidx_ref,   # SMEM [1] int32 layer index into stacked KV ([1,...] = 0)
    q_ref,      # [1, gp, d]
    k_ref,      # [1, 1, bkv, d]  (bf16/int8; d//2 when int4-packed)
    v_ref,      # [1, 1, bkv, d]
    ks_ref,     # [1, 1, 1, bkv] f32 (or [1, 1, 1, 128] dummy)
    vs_ref,
    o_ref,      # [1, gp, d]
    acc_ref, m_ref, l_ref,
    *, gp, bkv, scale, kv_bits, window, sink,
):
    del lidx_ref  # consumed by the BlockSpec index maps (layer offset)
    quantized = kv_bits < 16
    kv_idx = pl.program_id(1)
    kv_start = kv_idx * bkv
    kv_len = lens_ref[pl.program_id(0)]

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kv_start < kv_len)
    def _compute():
        q = q_ref[0]  # [gp, d]
        if kv_bits == 4:
            k = _unpack_nibbles(k_ref[0, 0], axis=1)
        elif kv_bits == 8:
            k = k_ref[0, 0].astype(jnp.bfloat16)
        else:
            k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [gp, bkv]
        if quantized:
            s = s * ks_ref[0, 0]  # [1, bkv] broadcasts over rows
        s = s * scale

        col = kv_start + jax.lax.broadcasted_iota(jnp.int32, (gp, bkv), 1)
        mask = col < kv_len
        if window:
            in_window = col > kv_len - 1 - window
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
        if kv_bits == 4:
            v = _unpack_nibbles(v_ref[0, 0], axis=1)
        elif kv_bits == 8:
            v = v_ref[0, 0].astype(jnp.bfloat16)
        else:
            v = v_ref[0, 0]
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot_general(
            pv.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_idx == pl.num_programs(1) - 1)
    def _done():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_kv", "interpret", "sm_scale", "window",
                              "sink")
)
def decode_attention(
    q: jax.Array,  # [B, H, D] one query position per sequence
    k: jax.Array,  # [B, Hkv, S, D] bf16 or int8 ([L, B, ...] w/ layer_index)
    v: jax.Array,  # [B, Hkv, S, D]
    kv_len: jax.Array,  # [] or [B] int32
    *,
    k_scale: Optional[jax.Array] = None,  # [B, Hkv, S] f32 when KV int8
    v_scale: Optional[jax.Array] = None,
    layer_index: Optional[jax.Array] = None,  # k/v/scales stacked [L, ...]
    sm_scale: Optional[float] = None,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
    window: int = 0,
    sink: int = 0,
) -> jax.Array:
    """Single-position GQA attention against a fixed-capacity KV cache.

    KV may be bf16, int8, or int4 (nibble-packed along the head dim —
    detected by k.shape[-1] == D//2; the reference's TQ4 sub-byte KV analog,
    CPUKVCacheManager.hpp:20). With `layer_index`, the KV (+scale) buffers
    carry a leading layer axis and the kernel reads layer `layer_index` in
    place from the stacked HBM cache — the unrolled-decoder path uses this
    to avoid per-layer cache slice copies (same trick as dequant_matmul's
    stacked weights).
    """
    d_q = q.shape[-1]
    if k.dtype == jnp.int8:
        kv_bits = 4 if k.shape[-1] * 2 == d_q else 8
    else:
        kv_bits = 16
    if kv_bits < 16 and (k_scale is None or v_scale is None):
        raise ValueError("quantized KV cache requires k_scale/v_scale")
    if not use_pallas(interpret):
        if layer_index is not None:
            idx = lambda a: (
                None if a is None
                else jax.lax.dynamic_index_in_dim(a, layer_index, 0, False)
            )
            k, v, k_scale, v_scale = idx(k), idx(v), idx(k_scale), idx(v_scale)
        if kv_bits == 4:
            from mnn_tpu.runtime.kvcache import unpack_kv4

            k, v = unpack_kv4(k), unpack_kv4(v)
        kv_len_b = jnp.broadcast_to(jnp.asarray(kv_len), (q.shape[0],))
        return attention_xla_ref(
            q[:, :, None], k, v, kv_len=kv_len, causal=False,
            sm_scale=sm_scale, k_scale=k_scale, v_scale=v_scale,
            window=window, sink=sink, q_offset=kv_len_b - 1,
        )[:, :, 0]
    if interpret is None:
        interpret = interpret_mode()
    if layer_index is None:
        k = k[None]
        v = v[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        lidx_arr = jnp.zeros((1,), jnp.int32)
    else:
        lidx_arr = jnp.reshape(jnp.asarray(layer_index, jnp.int32), (1,))
    b, h, d = q.shape
    nl, _, hkv, s, d_store = k.shape
    group = h // hkv
    gp = round_up(group, 16)
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    quantized = kv_bits < 16

    bkv = min(block_kv, s)
    if s % bkv:
        raise ValueError(f"cache capacity {s} must be a multiple of block_kv {bkv}")

    qg = q.reshape(b, hkv, group, d)
    if gp != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - group), (0, 0)))
    qg = qg.reshape(b * hkv, gp, d).astype(jnp.bfloat16)
    k3 = k.reshape(nl, b * hkv, s, d_store)
    v3 = v.reshape(nl, b * hkv, s, d_store)

    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    lens = jnp.repeat(kv_len, hkv)  # [B*Hkv]

    if quantized:
        if bkv % 128 and bkv != s:
            raise ValueError("int8 KV needs block_kv % 128 == 0 (scale lane dim)")
        ks = k_scale.reshape(nl, b * hkv, 1, s).astype(jnp.float32)
        vs = v_scale.reshape(nl, b * hkv, 1, s).astype(jnp.float32)
        scale_spec = pl.BlockSpec(
            (1, 1, 1, bkv), lambda bh, j, lens, L: (L[0], bh, 0, j)
        )
    else:
        ks = jnp.zeros((1, b * hkv, 1, 128), jnp.float32)
        vs = jnp.zeros((1, b * hkv, 1, 128), jnp.float32)
        scale_spec = pl.BlockSpec(
            (1, 1, 1, 128), lambda bh, j, lens, L: (0, bh, 0, 0)
        )

    kernel = functools.partial(
        _decode_kernel, gp=gp, bkv=bkv, scale=sm_scale, kv_bits=kv_bits,
        window=window, sink=sink,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b * hkv, s // bkv),
            in_specs=[
                pl.BlockSpec((1, gp, d), lambda bh, j, lens, L: (bh, 0, 0)),
                pl.BlockSpec(
                    (1, 1, bkv, d_store), lambda bh, j, lens, L: (L[0], bh, j, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bkv, d_store), lambda bh, j, lens, L: (L[0], bh, j, 0)
                ),
                scale_spec,
                scale_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, gp, d), lambda bh, j, lens, L: (bh, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((gp, d), jnp.float32),
                pltpu.VMEM((gp, 128), jnp.float32),
                pltpu.VMEM((gp, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * hkv, gp, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(lens, lidx_arr, qg, k3, v3, ks, vs)
    return out.reshape(b, hkv, gp, d)[:, :, :group].reshape(b, h, d)
