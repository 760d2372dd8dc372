"""Grouped MoE prefill MLP: every expert's capacity batch in ONE Pallas
kernel (grid over experts), expert weights streamed via BlockSpec offsets.

The XLA formulation of grouped dispatch (lax.scan over experts calling
dequant_matmul per expert) spends ~50us/expert-iteration on weight-stack
dynamic slices and kernel launches — 1440 iterations/layer-stack at
qwen1.5-moe dims, measured 6.9% prefill MFU. Here each grid step runs one
expert's whole MLP on its gathered token rows:

* the caller sorts token->expert assignments and gathers x into a
  [E, C, H] capacity buffer (C = capacity_factor * mean load; the TPU
  analog of MoEModule's prefill bucketing,
  /root/reference/express/module/MoEModule.cpp:64-90);
* grid = (E,); expert e's packed gate/up + down tiles revolve through
  VMEM double buffers (BlockSpec index maps on the stacked arrays — the
  expert stack is never sliced or copied);
* per 128-row quant block the weights are dequantized PATTERN-side
  (q*s + b -> bf16, amortized over the C token rows) and consumed by an
  MXU dot immediately — the decode-side partial-product algebra would pay
  4 VPU passes over the (C, 2MI) f32 partial per block;
* the routing weight is applied in-kernel; the caller scatter-adds the
  [E, C, H] result back to token rows (capacity-dropped slots carry
  weight 0 and zero rows, so they contribute nothing).

Numerics: gate/up use the 64-block interleaved layout (layers.GU_BLOCK)
split exactly as the dense path does; dequant uses q*s + b in f32 rounded
to bf16, matching matmul_dequant_ref's dequantize-then-matmul semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mnn_tpu.kernels.common import round_up


def _deq_dot(x, w_ref, s_ref, b_ref, *, bits, bs, k):
    """sum_kb of one expert's quant blocks against the capacity batch.

    Algebra picked by the capacity-row count m: PARTIAL-PRODUCT
    ((x@q)*s + rowsum(x)*b — post-ops scale with m*bn per block) when the
    batch is smaller than the quant block, pattern-side dequant
    (q*s + b, costs bs*bn per block) when it is larger. At the bench
    shape (cap = 2x mean load = 72 rows, bs = 128) partial-product is
    the cheaper side of the crossover.
    """
    half = bs // 2
    m = x.shape[0]
    partial = m < bs
    acc = None
    xb16 = x.astype(jnp.bfloat16)
    for kb in range(k // bs):
        if bits == 4:
            w32 = w_ref[0, kb * half:(kb + 1) * half, :].astype(jnp.int32)
            lo = w32 & 0xF
            hi = (w32 >> 4) & 0xF
            q32 = jnp.concatenate([lo, hi], axis=0)
        else:
            q32 = w_ref[0, kb * bs:(kb + 1) * bs, :].astype(jnp.int32) & 0xFF
        s = s_ref[0, kb].astype(jnp.float32)
        b = b_ref[0, kb].astype(jnp.float32)
        xb = xb16[:, kb * bs:(kb + 1) * bs]
        if partial:
            part = jnp.dot(xb, q32.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            rsb = jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
            term = part * s + rsb * b
        else:
            wd = (q32.astype(jnp.float32) * s + b).astype(jnp.bfloat16)
            term = jnp.dot(xb, wd, preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _kernel(x_ref, w_ref, gw_ref, gs_ref, gb_ref, dw_ref, ds_ref, db_ref,
            y_ref, *, h, mi, bits, bs_h, bs_mi):
    from mnn_tpu.kernels.moe_decode import _split_act

    gu = _deq_dot(x_ref[0], gw_ref, gs_ref, gb_ref,
                  bits=bits, bs=bs_h, k=h)              # [C, 2MI] f32
    act = _split_act(gu, mi)                            # [C, MI] bf16
    dn = _deq_dot(act, dw_ref, ds_ref, db_ref,
                  bits=bits, bs=bs_mi, k=mi)            # [C, H] f32
    y_ref[0] = dn * w_ref[0, :, :1]


def moe_prefill_mlp(xe: jax.Array, w_e: jax.Array, wgu_e, wdown_e,
                    *, interpret: bool = False) -> jax.Array:
    """xe: [E, C, H] bf16 gathered rows; w_e: [E, C] f32 routing weights.

    Returns [E, C, H] f32 = routing_weight * expert_mlp(row) per slot.
    """
    e, cap, h = xe.shape
    mi = wdown_e.packed.shape[1] * (2 if wdown_e.bits == 4 else 1)
    bits = wgu_e.bits
    pack = 2 if bits == 4 else 1
    bs_h = wgu_e.block_size
    bs_mi = wdown_e.block_size
    kernel = functools.partial(
        _kernel, h=h, mi=mi, bits=bits, bs_h=bs_h, bs_mi=bs_mi)

    def at_e(p_):
        return (p_, 0, 0)

    # routing weights broadcast along lanes so the kernel reads a [C, 1]
    # column without a 1-lane relayout
    w_lane = jnp.broadcast_to(w_e[:, :, None], (e, cap, 128))
    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(e,),
            in_specs=[
                pl.BlockSpec((1, cap, h), at_e),                  # xe
                pl.BlockSpec((1, cap, 128), at_e),                # weights
                pl.BlockSpec((1, h // pack, 2 * mi), at_e),       # gu packed
                pl.BlockSpec((1, h // bs_h, 2 * mi), at_e),       # gu scale
                pl.BlockSpec((1, h // bs_h, 2 * mi), at_e),       # gu bias
                pl.BlockSpec((1, mi // pack, h), at_e),           # dn packed
                pl.BlockSpec((1, mi // bs_mi, h), at_e),          # dn scale
                pl.BlockSpec((1, mi // bs_mi, h), at_e),          # dn bias
            ],
            out_specs=pl.BlockSpec((1, cap, h), at_e),
        ),
        out_shape=jax.ShapeDtypeStruct((e, cap, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * cap * (h * 2 * mi + mi * h),
            bytes_accessed=e * (h * 2 * mi + mi * h) // pack
            + e * cap * h * 6,
            transcendentals=e * cap * mi,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xe, w_lane, wgu_e.packed,
      wgu_e.scale.reshape(e, h // bs_h, 2 * mi),
      wgu_e.bias.reshape(e, h // bs_h, 2 * mi),
      wdown_e.packed,
      wdown_e.scale.reshape(e, mi // bs_mi, h),
      wdown_e.bias.reshape(e, mi // bs_mi, h))


def supports(wgu_e, wdown_e, h: int, cap: int) -> bool:
    """VMEM feasibility + layout constraints for the grouped kernel."""
    if wgu_e is None or wdown_e is None:
        return False
    if wgu_e.bits not in (4, 8) or wgu_e.bits != wdown_e.bits:
        return False
    if wgu_e.act_bits != 16 or wdown_e.act_bits != 16:
        return False
    if wgu_e.out_bias is not None or wdown_e.out_bias is not None:
        return False
    mi = wdown_e.packed.shape[1] * (2 if wdown_e.bits == 4 else 1)
    if mi % 64 or h % wgu_e.block_size or mi % wdown_e.block_size:
        return False
    pack = 2 if wgu_e.bits == 4 else 1
    sb = 4 if wgu_e.scale.dtype == jnp.float32 else 2
    vmem = 2 * (
        cap * h * 2                      # xe tile (bf16)
        + cap * 128 * 4                  # weights
        + h // pack * 2 * mi             # gu packed
        + 2 * round_up(h // wgu_e.block_size, 16) * 2 * mi * sb
        + mi // pack * h
        + 2 * round_up(mi // wdown_e.block_size, 16) * h * sb
        + cap * h * 4                    # out
    ) + cap * 2 * mi * 4 + cap * mi * 2  # gu acc + act
    return vmem <= (14 << 20)
