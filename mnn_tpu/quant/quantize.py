"""Per-block weight quantization (INT4/INT8, asymmetric or symmetric).

Semantics mirror the reference's weight-only quantization
(`quant_bit`/`quant_block` in MNN-LLM: /root/reference/transformers/llm/export/utils/mnn_converter.py:302-346
and the IDSTQuan container /root/reference/schema/default/CaffeOp.fbs:62-84):
contiguous blocks of `block_size` input channels share one (scale, bias)
pair per output channel, with

    w_dequant = q * scale + bias,   q in [0, 2**bits - 1]   (asym)
    w_dequant = (q - 2**(bits-1)) * scale                   (sym; stored in
                the same unsigned form with bias = -2**(bits-1) * scale)

TPU-native layout decisions (this file defines the checkpoint format):
  * weights are [K, N] (contraction dim first: y = x @ W), blocks along K;
  * INT4 values are nibble-packed two-per-byte *within* a quant block:
    in-block offset i pairs with offset i + block_size//2 (low/high nibble),
    so both nibbles of a byte always share one (scale, bias) and the Pallas
    kernel can unpack with a reshape + concat, no cross-block interleave;
  * packed storage dtype is int8 (Mosaic has no uint8->bf16 cast; kernels
    unpack via int32 masks);
  * scales/biases are bfloat16 [K//block_size, N] — the scale planes are
    ~12.5% of the packed-int4 bytes at block 128 and decode streams them
    every token, so halving them buys ~6% of the HBM decode roofline. The
    reference stores its alpha scales as fp16 for the same reason (IDSTQuan
    fp16 scale storage, /root/reference/schema/default/CaffeOp.fbs:62-84);
    bf16 is the TPU-native equivalent. Kernels upcast to f32 at use, so
    every path (XLA oracle, fused kernels, megakernel) sees identical
    values.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedLinear:
    """Weights of one linear layer in the packed per-block format.

    A pytree: `packed/scale/bias` (and optional `out_bias`) are arrays,
    `bits/block_size` are static metadata.
    """

    packed: jax.Array  # int8  [K*bits//8, N] (W2: 4/byte; W3: 2-bit plane +
    #                    1-bit plane per block; W4: 2/byte; W8: 1/byte)
    scale: jax.Array   # bf16  [K//block_size, N] (f32 accepted; kernels upcast)
    bias: jax.Array    # bf16  [K//block_size, N] (additive term; 0-centered for sym)
    out_bias: Optional[jax.Array]  # f32 [N] or None
    bits: int = dataclasses.field(metadata=dict(static=True), default=4)
    block_size: int = dataclasses.field(metadata=dict(static=True), default=128)
    # activation precision for matmuls against these weights: 16 = bf16
    # (W4A16/W8A16), 8 = dynamic per-token int8 (W4A8: the reference's
    # MNNDynamicQuant + int8 GEMM path; here it feeds the int8 MXU)
    act_bits: int = dataclasses.field(metadata=dict(static=True), default=16)

    @property
    def in_features(self) -> int:
        return self.packed.shape[0] * 8 // self.bits

    @property
    def out_features(self) -> int:
        return self.packed.shape[1]

    @property
    def shape(self):
        return (self.in_features, self.out_features)


def choose_block_size(k: int, requested: int, shards: int = 1) -> int:
    """Largest block <= requested such that blocks tile each of `shards`
    equal K-partitions (needed so row-parallel sharding keeps whole quant
    blocks, scales traveling with their weights)."""
    if k % shards:
        raise ValueError(f"shards {shards} must divide K={k}")
    local = k // shards
    bs = min(requested, local)
    while bs > 1 and (local % bs or bs % 2):
        bs -= 1
    if bs <= 1:
        raise ValueError(
            f"no even block size divides K={k} over {shards} shards "
            f"(local K = {local}); quantized K dims must be even")
    return bs


def _check_args(k: int, bits: int, block_size: int):
    if bits not in (2, 3, 4, 8):
        raise ValueError(f"bits must be 2, 3, 4 or 8, got {bits}")
    align = {2: 4, 3: 8, 4: 2, 8: 1}[bits]
    if block_size % align or k % block_size:
        raise ValueError(
            f"block_size {block_size} must be a multiple of {align} "
            f"(W{bits} packing) and divide K={k}")


def pack_int4(q: jax.Array, block_size: int) -> jax.Array:
    """Pack unsigned 4-bit values [K, N] -> int8 [K//2, N].

    In-block pairing: offsets (i, i + block_size//2) of each quant block share
    a byte (i in low nibble). Keeps every byte within one scale block.
    """
    k, n = q.shape
    half = block_size // 2
    blocks = q.reshape(k // block_size, 2, half, n)
    lo = blocks[:, 0].astype(jnp.int32)
    hi = blocks[:, 1].astype(jnp.int32)
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(packed.reshape(k // 2, n), jnp.int8)


def unpack_int4(packed: jax.Array, block_size: int) -> jax.Array:
    """Inverse of pack_int4: int8 [K//2, N] -> int32 q in [0,15], [K, N]."""
    kh, n = packed.shape
    half = block_size // 2
    w32 = jax.lax.bitcast_convert_type(packed, jnp.uint8).astype(jnp.int32)
    w32 = w32.reshape(kh // half, half, n)
    lo = w32 & 0xF
    hi = (w32 >> 4) & 0xF
    return jnp.concatenate([lo, hi], axis=1).reshape(kh * 2, n)


def pack_int2(q: jax.Array, block_size: int) -> jax.Array:
    """Pack unsigned 2-bit values [K, N] -> int8 [K//4, N].

    In-block grouping: offsets (i, i + bs/4, i + bs/2, i + 3bs/4) of each
    quant block share a byte (group m in bit pair 2m). ≈ the reference's
    low-memory W2 GEMV weight layout (arm64/low_memory/*_w2_Unit.S), laid
    out lane-parallel for the TPU's int32 shift/mask unpack.
    """
    k, n = q.shape
    quarter = block_size // 4
    g = q.reshape(k // block_size, 4, quarter, n).astype(jnp.int32)
    # multiply-add instead of shift/or: identical for disjoint bit ranges,
    # and the `<<` ufunc pattern here segfaulted XLA:CPU's codegen when
    # compiled late in a long test session (reproduced twice at the same
    # point; arithmetic lowers through a different, stable path)
    byte = g[:, 0] + g[:, 1] * 4 + g[:, 2] * 16 + g[:, 3] * 64
    return jax.lax.bitcast_convert_type(
        byte.astype(jnp.uint8).reshape(k // 4, n), jnp.int8)


def unpack_int2(packed: jax.Array, block_size: int) -> jax.Array:
    kq, n = packed.shape
    quarter = block_size // 4
    w32 = jax.lax.bitcast_convert_type(packed, jnp.uint8).astype(jnp.int32)
    w32 = w32.reshape(kq // quarter, quarter, n)
    parts = [(w32 >> (2 * m)) & 3 for m in range(4)]
    return jnp.concatenate(parts, axis=1).reshape(kq * 4, n)


def pack_int3(q: jax.Array, block_size: int) -> jax.Array:
    """Pack unsigned 3-bit values [K, N] -> int8 [K*3//8, N] as BITPLANES.

    Per quant block: a 2-bit plane (bs/4 rows, pack_int2 grouping of
    q & 3) followed by a 1-bit plane (bs/8 rows; offsets (i + m*bs/8)
    share a byte, bit m holds q >> 2). Byte-spanning 3-bit codes cannot
    be unpacked with lane-aligned TPU ops (the same reason TQ3 KV stays
    off the fast path); two aligned planes cost the same 0.375 B/weight.
    """
    k, n = q.shape
    q = q.astype(jnp.int32)
    lo = pack_int2(q & 3, block_size)                        # [K//4, N]
    eighth = block_size // 8
    hi_g = (q // 4).reshape(k // block_size, 8, eighth, n)
    hi_byte = hi_g[:, 0]
    for m in range(1, 8):  # multiply-add == or for single-bit planes
        hi_byte = hi_byte + hi_g[:, m] * (1 << m)
    hi = jax.lax.bitcast_convert_type(
        hi_byte.astype(jnp.uint8).reshape(k // 8, n), jnp.int8)
    # interleave per block: [bs/4 lo rows | bs/8 hi rows]
    nb = k // block_size
    lo_b = lo.reshape(nb, block_size // 4, n)
    hi_b = hi.reshape(nb, eighth, n)
    return jnp.concatenate([lo_b, hi_b], axis=1).reshape(k * 3 // 8, n)


def unpack_int3(packed: jax.Array, block_size: int) -> jax.Array:
    kr, n = packed.shape
    rpb = block_size * 3 // 8
    nb = kr // rpb
    b = packed.reshape(nb, rpb, n)
    lo = unpack_int2(
        b[:, :block_size // 4].reshape(nb * (block_size // 4), n),
        block_size)
    w32 = jax.lax.bitcast_convert_type(
        b[:, block_size // 4:].reshape(nb * (block_size // 8), n),
        jnp.uint8).astype(jnp.int32)
    w32 = w32.reshape(nb, block_size // 8, n)
    hi = jnp.concatenate([(w32 >> m) & 1 for m in range(8)], axis=1)
    return (lo.reshape(nb, block_size, n)
            + 4 * hi).reshape(nb * block_size, n)


def unpack_bits(packed: jax.Array, bits: int, block_size: int) -> jax.Array:
    """Generic inverse: int8 packed -> int32 q in [0, 2^bits), [K, N]."""
    if bits == 2:
        return unpack_int2(packed, block_size)
    if bits == 3:
        return unpack_int3(packed, block_size)
    if bits == 4:
        return unpack_int4(packed, block_size)
    return jax.lax.bitcast_convert_type(packed, jnp.uint8).astype(jnp.int32)


def _bf16_round_up(x: jax.Array) -> jax.Array:
    """f32 -> nearest bf16 value >= x, returned upcast to f32 (x > 0)."""
    b = x.astype(jnp.bfloat16)
    f = b.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(b, jnp.uint16)
    bumped = jax.lax.bitcast_convert_type(
        (bits + 1).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    return jnp.where(f < x, bumped, f)


def _bf16_round_down(x: jax.Array) -> jax.Array:
    """f32 -> nearest bf16 value <= x, returned upcast to f32 (any sign)."""
    b = x.astype(jnp.bfloat16)
    f = b.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(b, jnp.uint16)
    down_bits = jnp.where(f > 0, bits - 1, bits + 1).astype(jnp.uint16)
    down = jax.lax.bitcast_convert_type(
        down_bits, jnp.bfloat16).astype(jnp.float32)
    # f == 0 with x < 0: step to the smallest-magnitude negative bf16
    down = jnp.where(f == 0, jnp.float32(-1.1754944e-38), down)
    return jnp.where(f > x, down, f)


def quantize(
    w: jax.Array | np.ndarray,
    bits: int = 4,
    block_size: int = 128,
    sym: bool = False,
    out_bias: Optional[jax.Array] = None,
    act_bits: int = 16,
) -> QuantizedLinear:
    """Quantize a float [K, N] weight matrix to the per-block packed format."""
    w = jnp.asarray(w, jnp.float32)
    k, n = w.shape
    _check_args(k, bits, block_size)
    qmax = (1 << bits) - 1
    center = 1 << (bits - 1)
    blocks = w.reshape(k // block_size, block_size, n)

    # scales/biases are STORED in bf16 (see module docstring); round them
    # first — scale toward +inf and wmin toward -inf so the bf16 grid still
    # COVERS [wmin, wmax] (a nearest-rounded-down scale would clip wmax by
    # up to qmax ulps, breaking the |err| <= scale/2 bound) — and quantize
    # against the rounded values so q is optimal for exactly the
    # (scale, bias) the kernels will read back
    if sym:
        absmax = jnp.max(jnp.abs(blocks), axis=1)  # [nb, N]
        scale = absmax / (center - 1)
        scale = jnp.where(scale == 0, 1.0, scale)
        scale = _bf16_round_up(scale)
        q = jnp.round(blocks / scale[:, None, :]) + center
        q = jnp.clip(q, 1, qmax)  # symmetric range [-(center-1), center-1]
        bias = -float(center) * scale
    else:
        wmin = _bf16_round_down(jnp.min(blocks, axis=1))
        wmax = jnp.max(blocks, axis=1)
        scale = (wmax - wmin) / qmax
        scale = jnp.where(scale == 0, 1.0, scale)
        scale = _bf16_round_up(scale)
        q = jnp.round((blocks - wmin[:, None, :]) / scale[:, None, :])
        q = jnp.clip(q, 0, qmax)
        bias = wmin

    q = q.astype(jnp.int32).reshape(k, n)
    if bits == 2:
        packed = pack_int2(q, block_size)
    elif bits == 3:
        packed = pack_int3(q, block_size)
    elif bits == 4:
        packed = pack_int4(q, block_size)
    else:
        # store q - 128 in int8 (same bit pattern as uint8 q)
        packed = jax.lax.bitcast_convert_type(q.astype(jnp.uint8), jnp.int8)
    return QuantizedLinear(
        packed=packed,
        scale=scale.astype(jnp.bfloat16),
        bias=bias.astype(jnp.bfloat16),
        out_bias=None if out_bias is None else jnp.asarray(out_bias, jnp.float32),
        bits=bits,
        block_size=block_size,
        act_bits=act_bits,
    )


def dequantize(ql: QuantizedLinear, dtype=jnp.float32) -> jax.Array:
    """Reference dequantization: packed -> float [K, N]."""
    q = unpack_bits(ql.packed, ql.bits, ql.block_size)
    k, n = q.shape
    nb = k // ql.block_size
    qb = q.reshape(nb, ql.block_size, n).astype(jnp.float32)
    w = qb * ql.scale[:, None, :] + ql.bias[:, None, :]
    return w.reshape(k, n).astype(dtype)


@partial(jax.jit, static_argnames=("dtype",))
def matmul_dequant_ref(x: jax.Array, ql: QuantizedLinear, dtype=jnp.bfloat16) -> jax.Array:
    """Pure-XLA reference path: dequantize then matmul (used on CPU / in tests).

    Always computes in bf16 inputs + f32 accumulation — identical to the
    Pallas kernels — and casts only the OUTPUT to `dtype`. (Dequantizing in
    `dtype` made a dtype=f32 call use unrounded f32 weights, a systematic
    ~bf16-ulp weight difference vs the bf16 path: the TP K-sharded partial
    sums request f32 outputs, which silently changed the numerics vs the
    single-device bf16 path and broke expert-routing parity.)
    """
    w = dequantize(ql, dtype=jnp.bfloat16)
    y = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    if ql.out_bias is not None:
        y = y + ql.out_bias
    return y.astype(dtype)


# ---------------------------------------------------------------------------
# Activation quantization (dynamic per-row int8), mirroring the reference's
# dynamic-quant path (MNNDynamicQuantFP32 / CPUDynamicQuant,
# /root/reference/source/backend/cpu/CPUDynamicQuant.cpp): per-token absmax
# symmetric int8.
# ---------------------------------------------------------------------------


def quantize_activations_int8(x: jax.Array):
    """Per-row symmetric int8: returns (q [M,K] int8, scale [M,1] f32)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale
