"""Fused per-block dequantize + matmul Pallas kernel (W4A16 / W8A16).

TPU-native replacement for the reference's weight-only-quant GEMM/GEMV
kernels (`MNNGemmInt8AddBiasScale_*_w4_Unit.S`, deferred-dequant Metal GEMV —
/root/reference/source/backend/cpu/arm/arm64/low_memory/,
/root/reference/source/backend/opencl/execution/buffer/ConvBufLowMemoryExecution.cpp).

Weights stay packed in HBM (int4: two nibbles/byte) and are unpacked in VMEM
right before the MXU, so HBM traffic is the quantized size — the property
that sets the decode tokens/s roofline (reference analysis:
docs/perf/gemv_bw_benchmark.md).

Key algebraic trick (the TPU analog of the reference's deferred-dequant GEMV):
with per-block affine dequant  w = q * s_b + m_b  (q unsigned, s/m per
(quant-block b, out-channel n)), the block's contribution to the output is

    x_b @ w_b = (x_b @ q_b) * s_b[n]  +  rowsum(x_b)[m] * m_b[n]

so the kernel runs one integer-pattern bf16 MXU dot per quant block and
applies scale/bias on the [bm, bn] *partial product* (VPU work scales with
M*N per block, not K*N — decisive for small-M decode). The int4 nibble
pairing (i, i + block//2 within each quant block, defined in
mnn_tpu.quant.quantize) unpacks with two int ops and one 2D concat.

Grid is (M/bm, N/bn, K/bk) with K innermost; each K step statically unrolls
bk/block_size quant blocks; an f32 VMEM scratch accumulates across steps.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mnn_tpu.kernels.common import (
    interpret_mode,
    largest_divisor_leq,
    round_up,
    use_pallas,
)


def _unpack_rows(rows32, *, bits, bs):
    """Unpack one quant block's packed int32 rows -> [bs, bn] pattern in
    [0, 2^bits). Layouts: W4 nibble pairs (i, i+bs/2); W2 four 2-bit
    groups (i + m*bs/4); W3 a 2-bit plane (bs/4 rows) + 1-bit plane
    (bs/8 rows) with q = lo2 + 4*hi1 (quantize.pack_int2/3/4)."""
    if bits == 8:
        return rows32 & 0xFF
    if bits == 4:
        return jnp.concatenate([rows32 & 0xF, (rows32 >> 4) & 0xF], axis=0)
    if bits == 2:
        return jnp.concatenate(
            [(rows32 >> (2 * m)) & 3 for m in range(4)], axis=0)
    # bits == 3: bitplanes
    lo_r = rows32[:bs // 4]
    hi_r = rows32[bs // 4:]
    lo = jnp.concatenate([(lo_r >> (2 * m)) & 3 for m in range(4)], axis=0)
    hi = jnp.concatenate([(hi_r >> m) & 1 for m in range(8)], axis=0)
    return lo + 4 * hi


def _kernel_a8(lidx_ref, x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref,
               *, bits, block_size, nb):
    """W4A8/W8A8: int8 activations x signed-shifted int weights on the MXU.

    Weights stored unsigned (w = q*s + m) are re-centered to signed
    (q_s = q - 2^(b-1)) so the dot runs int8 x int8 -> int32; the caller
    pre-folds the shift into the bias plane (b' = 2^(b-1)*s + m). Per-row
    activation scales are applied outside the kernel (rank-1, XLA fuses).
    """
    del lidx_ref  # consumed by the BlockSpec index maps (layer offset)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bs = block_size
    rpb = bs * bits // 8
    center = 1 << (bits - 1)
    x = x_ref[...]  # int8 [bm, bk]

    acc = acc_ref[...]
    for kb in range(nb):
        w32 = w_ref[0, kb * rpb:(kb + 1) * rpb, :].astype(jnp.int32)
        q = (_unpack_rows(w32, bits=bits, bs=bs) - center).astype(jnp.int8)
        xb = x[:, kb * bs : (kb + 1) * bs]
        part = jax.lax.dot_general(
            xb, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        rsb = jnp.sum(xb.astype(jnp.int32), axis=1, keepdims=True)
        acc = acc + part.astype(jnp.float32) * s_ref[0, kb].astype(jnp.float32) \
            + rsb.astype(jnp.float32) * b_ref[0, kb].astype(jnp.float32)
    acc_ref[...] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


# x rows at/above which the dequantize-tile kernel replaces the
# partial-product kernels. DISABLED by default: measured on chip at
# pp512, pattern-side dequant is neutral at 0.5B (33.1% vs 33.0% MFU)
# and slightly WORSE at 7B (57.8% vs 59.4% with the a8 partial path) —
# the int4 unpack dominates the VPU either way, so moving the scale
# algebra pattern-side buys nothing at m=512. Kept for re-evaluation at
# larger prefill chunks (the dequant amortizes over m).
DEQ_MIN_M = 1 << 30


def _kernel_deq(lidx_ref, x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref,
                *, bits, block_size, nb):
    """Prefill-shape path (m >= DEQ_MIN_M): per-block PATTERN-side dequant.

    Each 128-row quant block is dequantized to bf16 (q*s + b, VPU cost
    proportional to bs*bn — amortized over all bm activation rows) and
    immediately consumed by a dot; Mosaic overlaps block kb+1's unpack
    with block kb's MXU pass. The partial-product kernels instead pay ~4
    VPU passes over the (bm, bn) f32 PARTIAL per block — at m >= 256
    that's the larger surface and capped prefill MFU (33% at 0.5B / 59%
    at 7B, round 4). A dequantize-the-whole-tile-then-one-big-dot variant
    measured WORSE (30.8%/52.7%): the single dot is a barrier, so the
    tile's unpack cannot hide under any MXU time. (Decode keeps the
    partial-product algebra: at m <= 8 a (bs, bn) dequant is 16x more VPU
    work than scaling the (8, bn) partial.)
    """
    del lidx_ref

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bs = block_size
    rpb = bs * bits // 8
    x = x_ref[...]
    acc = acc_ref[...]
    for kb in range(nb):
        w32 = w_ref[0, kb * rpb:(kb + 1) * rpb, :].astype(jnp.int32)
        q = _unpack_rows(w32, bits=bits, bs=bs).astype(jnp.float32)
        s = s_ref[0, kb].astype(jnp.float32)       # [1, bn]
        b = b_ref[0, kb].astype(jnp.float32)
        wd = (q * s + b).astype(jnp.bfloat16)
        xb = x[:, kb * bs:(kb + 1) * bs]
        acc = acc + jnp.dot(xb, wd, preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel(lidx_ref, x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref,
            *, bits, block_size, nb):
    del lidx_ref  # consumed by the BlockSpec index maps (layer offset)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bs = block_size
    rpb = bs * bits // 8
    x = x_ref[...]
    rs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True) if nb == 1 else None

    acc = acc_ref[...]
    for kb in range(nb):
        w32 = w_ref[0, kb * rpb:(kb + 1) * rpb, :].astype(jnp.int32)
        q = _unpack_rows(w32, bits=bits, bs=bs).astype(x.dtype)  # [bs, bn]
        xb = x[:, kb * bs : (kb + 1) * bs]
        part = jnp.dot(xb, q, preferred_element_type=jnp.float32)
        rsb = (
            rs
            if nb == 1
            else jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
        )
        acc = acc + part * s_ref[0, kb].astype(jnp.float32) \
            + rsb * b_ref[0, kb].astype(jnp.float32)
    acc_ref[...] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def choose_blocks(m: int, k: int, n: int, block_size: int):
    """Pick (bm, bn, bk): MXU-aligned, VMEM-bounded, minimizing re-fetch.

    N need not be divisible by bn (partial edge blocks only touch output
    columns that exist; K stays exactly tiled because partial K blocks
    would corrupt the accumulation).
    """
    bm = 256 if m >= 256 else round_up(m, 8)
    # Large bn cuts the number of passes over x (x traffic = x_bytes * n/bn)
    # and the number of grid steps (vocab-sized N with prime factors would
    # otherwise degenerate to bn=128 and thousands of steps). For decode
    # GEMV (m<=8), however, MODERATE tiles win: re-measured on the Qwen2
    # vocab head (896 x 151936 int4, bf16 scale planes), bn 8192/2048/512
    # run 138/180/205 us while bn=1024 runs 61 us — small enough to
    # double-buffer deeply, large enough to amortize per-step overhead.
    bn_cap = 4096 if m > 64 else (1024 if m <= 8 else 2048)
    bn = min(round_up(n, 128), bn_cap)
    bk_cap = max(block_size, (3 << 20) // max(bn, 1) * 2)  # ~1.5MB packed tile
    if m <= 8:
        # x/out tiles are negligible: keep K whole when it fits so every
        # weight byte streams once with a deep K pipeline per N tile
        bk_cap = (12 << 20) // max(bn, 1)
        bk = largest_divisor_leq(k, min(bk_cap, 4096), block_size)
    else:
        bk = largest_divisor_leq(k, min(bk_cap, 2048), block_size)

    def vmem_bytes(bm_, bn_, bk_):
        # double-buffered io tiles + accumulator + in-kernel temporaries
        # (dequantized q tile, f32 partial) — keep under the ~16MB scoped
        # budget with headroom for compiler spills
        return (
            2 * (bm_ * bk_ * 2)            # x tiles
            + 2 * (bk_ // 2 * bn_)         # packed weight tiles
            + 2 * (bm_ * bn_ * 2)          # out tiles
            + bm_ * bn_ * 4                # acc scratch
            + bm_ * bn_ * 4                # partial product
            + block_size * bn_ * 2         # dequantized block
            + 4 * (bk_ // block_size) * bn_ * 8  # scales/biases
        )

    budget = (12 << 20) + (1 << 19) if m <= 8 else (11 << 20)
    while bn > 128 and vmem_bytes(bm, bn, bk) > budget:
        bn -= 128
    while bk > block_size and vmem_bytes(bm, bn, bk) > budget:
        smaller = largest_divisor_leq(k, bk - block_size, block_size)
        if smaller == bk:
            break
        bk = smaller
    return bm, bn, bk


def _slice_layer(ql, layer_index):
    """Materialize one layer of a [L, ...]-stacked QuantizedLinear (ref path)."""
    import dataclasses as _dc

    def sl(a):
        return (
            None
            if a is None
            else jax.lax.dynamic_index_in_dim(a, layer_index, 0, keepdims=False)
        )

    return _dc.replace(
        ql, packed=sl(ql.packed), scale=sl(ql.scale), bias=sl(ql.bias),
        out_bias=sl(ql.out_bias),
    )


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def dequant_matmul(
    x: jax.Array,
    ql,
    *,
    layer_index: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = x @ dequant(ql) (+ out_bias).  x: [..., K] bf16/f32.

    When `layer_index` is given, `ql`'s arrays carry a leading layer axis
    [L, ...] and the kernel reads layer `layer_index`'s tiles straight from
    the stacked HBM buffers (BlockSpec offset via scalar prefetch) — the
    unrolled-decoder path uses this to avoid per-layer weight-slice copies,
    which otherwise triple decode HBM traffic.

    Differentiable w.r.t. x (custom VJP: dx = g @ dequant(W)^T via XLA —
    the quantized weights themselves are frozen, LoRA trains adapters).
    """
    if not use_pallas(interpret):
        from mnn_tpu.quant.quantize import (
            matmul_dequant_ref,
            quantize_activations_int8,
        )

        if layer_index is not None:
            ql = _slice_layer(ql, layer_index)
        if ql.act_bits == 8:
            xq, xs = quantize_activations_int8(x)
            x = (xq.astype(jnp.float32) * xs).astype(jnp.bfloat16)
        return matmul_dequant_ref(x, ql, dtype=out_dtype)
    if interpret is None:
        interpret = interpret_mode()

    x_dtype = x.dtype

    def _impl(x, ql, lidx):
        return _dequant_matmul_pallas(
            x, ql, lidx, out_dtype=out_dtype, block_m=block_m, block_n=block_n,
            block_k=block_k, interpret=interpret,
        )

    @jax.custom_vjp
    def _call(x, ql, lidx):
        return _impl(x, ql, lidx)

    def _fwd(x, ql, lidx):
        return _impl(x, ql, lidx), (ql, lidx)

    def _bwd(res, g):
        from mnn_tpu.quant.quantize import dequantize

        ql_res, lidx_res = res
        ql_l = ql_res if lidx_res is None else _slice_layer(ql_res, lidx_res)
        w = dequantize(ql_l, dtype=jnp.bfloat16)
        dx = jnp.dot(
            g.astype(jnp.bfloat16), w.T, preferred_element_type=jnp.float32
        )
        import numpy as _onp

        def _zero_ct(a):
            if a is None:
                return None
            if jnp.issubdtype(a.dtype, jnp.floating):
                return jnp.zeros_like(a)
            return _onp.zeros(a.shape, dtype=jax.dtypes.float0)

        ct_ql = jax.tree_util.tree_map(_zero_ct, ql_res)
        ct_lidx = None if lidx_res is None else _zero_ct(lidx_res)
        return (dx.astype(x_dtype), ct_ql, ct_lidx)

    _call.defvjp(_fwd, _bwd)
    return _call(x, ql, layer_index)


def _dequant_matmul_pallas(
    x, ql, lidx, *, out_dtype, block_m, block_n, block_k, interpret
):
    stacked = lidx is not None
    packed, scale, bias = ql.packed, ql.scale, ql.bias
    out_bias = ql.out_bias
    if stacked:
        # packed [L, K//pack, N], scale/bias [L, K//bs, N]
        if out_bias is not None:
            out_bias = jax.lax.dynamic_index_in_dim(
                out_bias, lidx, 0, keepdims=False
            )
        k = packed.shape[1] * 8 // ql.bits
        n = packed.shape[2]
        lidx_arr = jnp.reshape(jnp.asarray(lidx, jnp.int32), (1,))
    else:
        k, n = ql.shape
        packed = packed.reshape(1, *packed.shape)
        scale = scale.reshape(1, *scale.shape)
        bias = bias.reshape(1, *bias.shape)
        lidx_arr = jnp.zeros((1,), jnp.int32)
    bs = ql.block_size
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    # dequantize-tile path for prefill shapes: bf16 activations regardless
    # of act_bits (the int8-MXU a8 path cannot beat it — the VPU unpack,
    # not the MXU rate, was the binding cost; measured round 4)
    use_deq = m >= DEQ_MIN_M
    a8 = ql.act_bits == 8 and not use_deq
    if a8:
        from mnn_tpu.quant.quantize import quantize_activations_int8

        xq, xs = quantize_activations_int8(x.reshape(m, k))
        x2 = xq
    else:
        x2 = x.reshape(m, k).astype(jnp.bfloat16)

    from mnn_tpu.kernels import autotune

    tuned = autotune.lookup(m, k, n, bs, ql.bits, ql.act_bits)
    bm, bn, bk = tuned if tuned is not None else choose_blocks(m, k, n, bs)
    if block_m is not None:
        bm = block_m
    if block_n is not None:
        bn = block_n
    if block_k is not None:
        bk = block_k
    m_pad = round_up(m, bm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    nb = bk // bs
    rpb_k = bk * ql.bits // 8   # packed rows per K tile
    grid = (m_pad // bm, -(-n // bn), k // bk)

    if a8:
        kernel = functools.partial(
            _kernel_a8, bits=ql.bits, block_size=bs, nb=nb
        )
        center = 1 << (ql.bits - 1)
        scale_in = scale
        # fold signed re-centering in f32 (a8 is the compute-bound prefill
        # path, so f32 planes cost no meaningful bandwidth there)
        bias_in = (center * scale.astype(jnp.float32)
                   + bias.astype(jnp.float32))
    elif use_deq:
        kernel = functools.partial(
            _kernel_deq, bits=ql.bits, block_size=bs, nb=nb
        )
        scale_in = scale
        bias_in = bias
    else:
        kernel = functools.partial(
            _kernel, bits=ql.bits, block_size=bs, nb=nb
        )
        scale_in = scale
        bias_in = bias
    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    nl = packed.shape[0]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk, L: (i, kk)),
                pl.BlockSpec(
                    (1, rpb_k, bn), lambda i, j, kk, L: (L[0], kk, j)
                ),
                pl.BlockSpec(
                    (1, nb, 1, bn), lambda i, j, kk, L: (L[0], kk, 0, j)
                ),
                pl.BlockSpec(
                    (1, nb, 1, bn), lambda i, j, kk, L: (L[0], kk, 0, j)
                ),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, L: (i, j)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=m_pad * k * 2 + k * n * ql.bits // 8
            + m_pad * n * 2,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        lidx_arr,
        x2,
        packed,
        scale_in.reshape(nl, k // bs, 1, n),
        bias_in.reshape(nl, k // bs, 1, n),
    )

    out = out[:m]
    if a8:
        # per-row activation scales (rank-1; XLA fuses into the slice/cast)
        out = (out.astype(jnp.float32) * xs).astype(out_dtype)
    if out_bias is not None:
        out = (out.astype(jnp.float32) + out_bias).astype(out_dtype)
    return out.reshape(*lead, n)
