"""Fixed-capacity, optionally int8-quantized KV cache.

TPU-native equivalent of the reference's KV-cache stack
(/root/reference/source/core/KVCacheManager.hpp mmap spill + quant modes,
source/backend/cpu/CPUKVCacheManager.cpp packed layouts, and the KVMeta
add/remove/reserve protocol in source/core/KVMeta.hpp): here the cache is a
preallocated HBM array per layer ([L, B, Hkv, S, D]) with a per-sequence
valid length; "erase history"/rollback (the reference's KVMeta remove) is a
length rollback, and int8 quantization stores per-(token, head) scales that
the decode kernel folds into score/probability columns.

Static shapes by design: capacity never changes under jit, so prefill and
decode never recompile as sequences grow (the reference's module-pool /
resize machinery exists to solve the same problem on its dynamic runtime).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    k: jax.Array             # [L, B, Hkv, S, D] bf16/int8, or [.., D//2] int4-packed
    v: jax.Array             # [L, B, Hkv, S, D]
    k_scale: Optional[jax.Array]  # [L, B, Hkv, S] f32 when quantized
    v_scale: Optional[jax.Array]
    length: jax.Array        # [B] int32 valid prefix length
    # storage precision: 16 = bf16, 8 = int8, 4 = packed nibbles (two head
    # dims per byte, pairing (j, j + D/2) so in-kernel unpack is one lane
    # concat — the TPU analog of the reference's TQ4 sub-byte KV,
    # CPUKVCacheManager.hpp:20 / compute/TurboQuant.hpp)
    bits: int = dataclasses.field(metadata=dict(static=True), default=16)
    # codebook encoding at bits=4: TQ4 — Lloyd-Max 16-level Gaussian
    # quantizer scaled by row RMS, same nibble-packed storage (bits=3 is
    # always the TQ3 codebook)
    codebook: bool = dataclasses.field(metadata=dict(static=True),
                                       default=False)

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.bits < 16


def create(
    num_layers: int,
    batch: int,
    num_kv_heads: int,
    capacity: int,
    head_dim: int,
    quantized: bool = True,
    dtype=jnp.bfloat16,
    kv_bits: int = 8,
    kv_codebook: bool = False,
) -> KVCache:
    bits = kv_bits if quantized else 16
    if bits == 3 and head_dim % 8:
        raise ValueError("kv_bits=3 needs head_dim % 8 == 0")
    codebook = bool(kv_codebook) and quantized and bits == 4
    d_store = {4: head_dim // 2, 3: head_dim * 3 // 8}.get(bits, head_dim)
    shape = (num_layers, batch, num_kv_heads, capacity, d_store)
    if quantized:
        k = jnp.zeros(shape, jnp.int8)
        v = jnp.zeros(shape, jnp.int8)
        ks = jnp.ones(shape[:-1], jnp.float32)
        vs = jnp.ones(shape[:-1], jnp.float32)
    else:
        k = jnp.zeros(shape, dtype)
        v = jnp.zeros(shape, dtype)
        ks = vs = None
    return KVCache(k=k, v=v, k_scale=ks, v_scale=vs,
                   length=jnp.zeros((batch,), jnp.int32), bits=bits,
                   codebook=codebook)


def quantize_kv(x: jax.Array):
    """Per-(token, head) symmetric int8: x [B, Hkv, T, D] -> (q, scale [B,Hkv,T])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_kv4(x: jax.Array):
    """Per-(token, head) int4: x [..., D] -> (packed [..., D//2] int8, scale).

    Byte j packs dims (j, j + D/2): low nibble = q[j] + 8, high = q[j+D/2] + 8
    (unsigned storage) — unpacking is `concat(lo - 8, hi - 8)` on the lane
    axis, the same pairing trick as the int4 weight kernel."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -8, 7) + 8  # [0, 15]
    q = q.astype(jnp.int32)
    packed = q[..., : d // 2] | (q[..., d // 2 :] << 4)
    packed = jnp.where(packed > 127, packed - 256, packed).astype(jnp.int8)
    return packed, scale


# TQ3-class 3-bit codebook KV (reference: TurboQuant TQ3,
# /root/reference/source/backend/cpu/compute/TurboQuant.hpp:5-24 — WHT
# rotation + Lloyd-Max 3-bit codebook). The rotation half is kv_rotate
# (models/layers.rotate_heads); this is the codebook half: after a WHT the
# per-dim distribution is near-Gaussian, so the FIXED optimal (Lloyd-Max)
# 8-level quantizer for N(0,1), scaled by the row RMS, beats uniform
# levels at equal bit width. True 3-bit storage: 8 codes pack into 3 bytes.
TQ3_LEVELS = jnp.asarray(
    [-2.1519, -1.3439, -0.7560, -0.2451, 0.2451, 0.7560, 1.3439, 2.1519],
    jnp.float32)


def quantize_kv3(x: jax.Array):
    """Per-(token, head) 3-bit codebook: x [..., D] -> (packed
    [..., D*3//8] int8, scale [...])."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(xf * xf, axis=-1))
    scale = jnp.where(rms == 0, 1.0, rms)
    xn = xf / scale[..., None]
    idx = jnp.argmin(
        jnp.abs(xn[..., None] - TQ3_LEVELS), axis=-1).astype(jnp.int32)
    grp = idx.reshape(*idx.shape[:-1], d // 8, 8)
    val24 = jnp.zeros(grp.shape[:-1], jnp.int32)
    for k in range(8):
        val24 = val24 | (grp[..., k] << (3 * k))
    bytes3 = jnp.stack([(val24 >> (8 * j)) & 0xFF for j in range(3)], -1)
    packed = bytes3.reshape(*idx.shape[:-1], d * 3 // 8)
    packed = jnp.where(packed > 127, packed - 256, packed).astype(jnp.int8)
    return packed, scale


def unpack_kv3(packed: jax.Array) -> jax.Array:
    """[..., D*3//8] int8 -> codebook VALUES [..., D] f32 (scale not applied)."""
    p32 = packed.astype(jnp.int32) & 0xFF
    grp = p32.reshape(*p32.shape[:-1], p32.shape[-1] // 3, 3)
    val24 = grp[..., 0] | (grp[..., 1] << 8) | (grp[..., 2] << 16)
    codes = jnp.stack([(val24 >> (3 * k)) & 0x7 for k in range(8)], -1)
    d = codes.shape[-2] * 8
    return TQ3_LEVELS[codes.reshape(*p32.shape[:-1], d)]


# TQ4: 16-level Lloyd-Max quantizer for N(0,1) (reference TurboQuant's
# 4-bit codebook mode, compute/TurboQuant.hpp:5-24), scaled by row RMS.
# Storage layout is IDENTICAL to uniform int4 (nibble pairs (j, j+D/2)).
TQ4_LEVELS = jnp.asarray(
    [-2.7326, -2.0690, -1.6180, -1.2562, -0.9423, -0.6568, -0.3880,
     -0.1284, 0.1284, 0.3880, 0.6568, 0.9423, 1.2562, 1.6180, 2.0690,
     2.7326], jnp.float32)


def quantize_kv4cb(x: jax.Array):
    """Per-(token, head) TQ4 codebook: x [..., D] -> (packed [..., D//2]
    int8 nibble codes, scale [...] = row RMS)."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(xf * xf, axis=-1))
    scale = jnp.where(rms == 0, 1.0, rms)
    xn = xf / scale[..., None]
    idx = jnp.argmin(
        jnp.abs(xn[..., None] - TQ4_LEVELS), axis=-1).astype(jnp.int32)
    packed = idx[..., : d // 2] | (idx[..., d // 2:] << 4)
    packed = jnp.where(packed > 127, packed - 256, packed).astype(jnp.int8)
    return packed, scale


def unpack_kv4cb(packed: jax.Array) -> jax.Array:
    """[..., D//2] int8 -> codebook VALUES [..., D] f32 (scale not applied)."""
    p32 = packed.astype(jnp.int32) & 0xFF
    lo = p32 & 0xF
    hi = (p32 >> 4) & 0xF
    codes = jnp.concatenate([lo, hi], axis=-1)
    return TQ4_LEVELS[codes]


def unpack_kv4(packed: jax.Array) -> jax.Array:
    """[..., D//2] int8 -> signed int values [..., D] f32 (scale NOT applied)."""
    p32 = packed.astype(jnp.int32)
    lo = (p32 & 0xF) - 8
    hi = ((p32 >> 4) & 0xF) - 8
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)


def dequant_kv(cache_vals: jax.Array, scale: jax.Array, bits: int,
               dtype=jnp.bfloat16, codebook: bool = False) -> jax.Array:
    """Dequantize a KV buffer slice back to floats (prefill / ref paths)."""
    if bits == 16:
        return cache_vals.astype(dtype)
    if bits == 4 and codebook:
        return (unpack_kv4cb(cache_vals) * scale[..., None]).astype(dtype)
    if bits == 4:
        return (unpack_kv4(cache_vals) * scale[..., None]).astype(dtype)
    if bits == 3:
        return (unpack_kv3(cache_vals) * scale[..., None]).astype(dtype)
    return (cache_vals.astype(jnp.float32) * scale[..., None]).astype(dtype)


def _quantize_for(bits: int, x: jax.Array, codebook: bool = False):
    if bits == 4 and codebook:
        return quantize_kv4cb(x)
    if bits == 4:
        return quantize_kv4(x)
    if bits == 3:
        return quantize_kv3(x)
    return quantize_kv(x)


def append_layer(
    k_cache: jax.Array,      # [B, Hkv, S, D] (one layer)
    v_cache: jax.Array,
    k_scale: Optional[jax.Array],  # [B, Hkv, S]
    v_scale: Optional[jax.Array],
    k_new: jax.Array,        # [B, Hkv, T, D] bf16
    v_new: jax.Array,
    start: jax.Array,        # [] int32 write offset (uniform across batch)
    bits: int = 8,
    codebook: bool = False,
):
    """Write T new positions at `start`. Returns updated (k, v, ks, vs)."""
    quantized = k_cache.dtype == jnp.int8
    if quantized:
        kq, ks_new = _quantize_for(bits, k_new, codebook)
        vq, vs_new = _quantize_for(bits, v_new, codebook)
        k_cache = jax.lax.dynamic_update_slice(k_cache, kq, (0, 0, start, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, vq, (0, 0, start, 0))
        k_scale = jax.lax.dynamic_update_slice(k_scale, ks_new, (0, 0, start))
        v_scale = jax.lax.dynamic_update_slice(v_scale, vs_new, (0, 0, start))
    else:
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new.astype(k_cache.dtype), (0, 0, start, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new.astype(v_cache.dtype), (0, 0, start, 0)
        )
    return k_cache, v_cache, k_scale, v_scale


def append_decode_layer(
    k_cache: jax.Array,      # [B, Hkv, S, D] (one layer)
    v_cache: jax.Array,
    k_scale: Optional[jax.Array],
    v_scale: Optional[jax.Array],
    k_new: jax.Array,        # [B, Hkv, 1, D]
    v_new: jax.Array,
    lengths: jax.Array,      # [B] int32 per-slot write offsets
    bits: int = 8,
    codebook: bool = False,
):
    """Scatter one position per sequence at its own offset (continuous
    batching: slots decode at different context lengths). Offsets are
    clamped to capacity so idle/finished slots can never write OOB."""
    b = k_cache.shape[0]
    s = k_cache.shape[2]
    pos = jnp.clip(lengths, 0, s - 1)
    b_idx = jnp.arange(b)
    quantized = k_cache.dtype == jnp.int8
    if quantized:
        kq, ks_new = _quantize_for(bits, k_new, codebook)
        vq, vs_new = _quantize_for(bits, v_new, codebook)
        k_cache = k_cache.at[b_idx, :, pos].set(kq[:, :, 0])
        v_cache = v_cache.at[b_idx, :, pos].set(vq[:, :, 0])
        k_scale = k_scale.at[b_idx, :, pos].set(ks_new[:, :, 0])
        v_scale = v_scale.at[b_idx, :, pos].set(vs_new[:, :, 0])
    else:
        k_cache = k_cache.at[b_idx, :, pos].set(k_new[:, :, 0].astype(k_cache.dtype))
        v_cache = v_cache.at[b_idx, :, pos].set(v_new[:, :, 0].astype(v_cache.dtype))
    return k_cache, v_cache, k_scale, v_scale


def append_stacked(
    cache: KVCache,
    layer: int,              # static layer index into [L, ...] arrays
    k_new: jax.Array,        # [B, Hkv, T, D] bf16
    v_new: jax.Array,
    start: jax.Array,        # [] int32 write offset (uniform across batch)
) -> KVCache:
    """Prefill write of T positions into layer `layer` of the stacked cache.

    Used by the unrolled-decoder path: updating the [L, ...] buffers in
    place (dynamic_update_slice aliases) instead of scanning sliced
    per-layer copies keeps decode HBM traffic at 1x the cache size.
    """
    zero = jnp.zeros((), jnp.int32)
    li = jnp.asarray(layer, jnp.int32)
    if cache.quantized:
        kq, ks_new = _quantize_for(cache.bits, k_new, cache.codebook)
        vq, vs_new = _quantize_for(cache.bits, v_new, cache.codebook)
        k = jax.lax.dynamic_update_slice(
            cache.k, kq[None], (li, zero, zero, start, zero))
        v = jax.lax.dynamic_update_slice(
            cache.v, vq[None], (li, zero, zero, start, zero))
        ks = jax.lax.dynamic_update_slice(
            cache.k_scale, ks_new[None], (li, zero, zero, start))
        vs = jax.lax.dynamic_update_slice(
            cache.v_scale, vs_new[None], (li, zero, zero, start))
        return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs)
    k = jax.lax.dynamic_update_slice(
        cache.k, k_new.astype(cache.k.dtype)[None],
        (li, zero, zero, start, zero))
    v = jax.lax.dynamic_update_slice(
        cache.v, v_new.astype(cache.v.dtype)[None],
        (li, zero, zero, start, zero))
    return dataclasses.replace(cache, k=k, v=v)


def append_decode_stacked(
    cache: KVCache,
    layer: int,
    k_new: jax.Array,        # [B, Hkv, 1, D]
    v_new: jax.Array,
    lengths: jax.Array,      # [B] int32 per-slot write offsets
) -> KVCache:
    """Decode scatter of one position per sequence into stacked layer `layer`."""
    b = cache.k.shape[1]
    s = cache.capacity
    pos = jnp.clip(lengths, 0, s - 1)
    b_idx = jnp.arange(b)
    if cache.quantized:
        kq, ks_new = _quantize_for(cache.bits, k_new, cache.codebook)
        vq, vs_new = _quantize_for(cache.bits, v_new, cache.codebook)
        k = cache.k.at[layer, b_idx, :, pos].set(kq[:, :, 0])
        v = cache.v.at[layer, b_idx, :, pos].set(vq[:, :, 0])
        ks = cache.k_scale.at[layer, b_idx, :, pos].set(ks_new[:, :, 0])
        vs = cache.v_scale.at[layer, b_idx, :, pos].set(vs_new[:, :, 0])
        return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs)
    k = cache.k.at[layer, b_idx, :, pos].set(k_new[:, :, 0].astype(cache.k.dtype))
    v = cache.v.at[layer, b_idx, :, pos].set(v_new[:, :, 0].astype(cache.v.dtype))
    return dataclasses.replace(cache, k=k, v=v)


def scatter_decode_row(
    cache: KVCache,
    layer: int,
    k_row: jax.Array,        # [B, Hkv, 1, D] already-quantized (or bf16) values
    v_row: jax.Array,
    k_sc: Optional[jax.Array],   # [B, Hkv, 1] f32 (quantized cache)
    v_sc: Optional[jax.Array],
    lengths: jax.Array,      # [B] int32 per-slot write offsets
) -> KVCache:
    """Scatter a PRE-quantized decode row (from the fused decode kernel)
    into stacked layer `layer` at each sequence's length."""
    b = cache.k.shape[1]
    s = cache.capacity
    pos = jnp.clip(lengths, 0, s - 1)
    zero = jnp.zeros((), jnp.int32)
    li = jnp.asarray(layer, jnp.int32)
    if b == 1:
        # batch-1 fast path: plain dynamic-update-slices (no batch gather /
        # select lowering) — this is the hot serving decode case
        p0 = pos[0]
        k = jax.lax.dynamic_update_slice(
            cache.k, k_row.astype(cache.k.dtype)[None],
            (li, zero, zero, p0, zero))
        v = jax.lax.dynamic_update_slice(
            cache.v, v_row.astype(cache.v.dtype)[None],
            (li, zero, zero, p0, zero))
        if cache.quantized:
            ks = jax.lax.dynamic_update_slice(
                cache.k_scale, k_sc[None], (li, zero, zero, p0))
            vs = jax.lax.dynamic_update_slice(
                cache.v_scale, v_sc[None], (li, zero, zero, p0))
            return dataclasses.replace(
                cache, k=k, v=v, k_scale=ks, v_scale=vs)
        return dataclasses.replace(cache, k=k, v=v)
    b_idx = jnp.arange(b)
    k = cache.k.at[layer, b_idx, :, pos].set(
        k_row[:, :, 0].astype(cache.k.dtype))
    v = cache.v.at[layer, b_idx, :, pos].set(
        v_row[:, :, 0].astype(cache.v.dtype))
    if cache.quantized:
        ks = cache.k_scale.at[layer, b_idx, :, pos].set(k_sc[:, :, 0])
        vs = cache.v_scale.at[layer, b_idx, :, pos].set(v_sc[:, :, 0])
        return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs)
    return dataclasses.replace(cache, k=k, v=v)


def rollback(cache: KVCache, n: int | jax.Array) -> KVCache:
    """Drop the last n tokens (reference: KVMeta.remove / Llm::eraseHistory)."""
    return dataclasses.replace(
        cache, length=jnp.maximum(cache.length - n, 0)
    )


def reset(cache: KVCache) -> KVCache:
    """Clear all history (lengths to zero; data is masked by length)."""
    return dataclasses.replace(
        cache, length=jnp.zeros_like(cache.length)
    )


def compact_tail(cache: KVCache, start, sel, m) -> KVCache:
    """Keep only rows start+sel[i] of the appended tail, compacted to
    start..start+m-1 (token-tree verify: the accepted root-to-leaf path's
    KV rows move into place, sibling branches are discarded — the TPU
    analog of the reference tokentree retrieve step, tokentree.hpp:24).

    sel: [W] int32 offsets relative to `start` (ascending for i < m;
    entries at i >= m are junk — their writes land beyond the new length
    and are masked by kv_len everywhere). One compiled shape serves every
    acceptance count m.
    """
    start = jnp.asarray(start, jnp.int32)
    sel = jnp.asarray(sel, jnp.int32)
    m = jnp.asarray(m, jnp.int32)
    w = sel.shape[0]

    def move(a, axis_s):
        # gather rows start+sel along the sequence axis, then write them
        # back at start..start+w-1
        rows = jnp.take(a, start + sel, axis=axis_s)
        return jax.lax.dynamic_update_slice_in_dim(a, rows, start, axis_s)

    # only batch row 0's tail is compacted (tree verify is batch-1):
    # touch only its length so a future batch>1 caller can't silently
    # corrupt other sequences' lengths
    upd = dict(
        k=move(cache.k, 3), v=move(cache.v, 3),
        length=cache.length.at[0].set(
            jnp.minimum(start + m, cache.capacity)),
    )
    if cache.quantized:
        upd["k_scale"] = move(cache.k_scale, 3)
        upd["v_scale"] = move(cache.v_scale, 3)
    return dataclasses.replace(cache, **upd)
