"""Fused routed-MoE decode MLP: all top-k expert GEMVs + the shared expert
in ONE Pallas kernel per layer.

Why: batch-1 MoE decode must stream only the ROUTED experts' weights (k/E
of the dense traffic) — the reference reaches this by routing tokens
through expert submodules sequentially (MoEModule.cpp:49-61,
ConvInt8TiledExecutor int8 GEMM). The previous TPU path got the HBM
behavior right (stacked-index dequant GEMVs inside a lax.scan) but ran
each expert as a separate kernel execution inside a scan that ALSO
dynamic-slices the whole layer's expert stack — measured 69.8 tok/s vs an
1118.8 tok/s roofline (6.2%). This kernel:

* takes the expert stacks FLAT over [L*E] and offsets its BlockSpecs with
  scalar-prefetched ids (l*E + e), so no expert stack is ever sliced or
  copied — only the k routed experts' packed tiles stream from HBM;
* runs one grid phase per routed (token, expert) pair — each phase is a
  whole-expert gate/up + SwiGLU + down GEMV chain with the routing weight
  applied to the masked token row;
* streams the (large) shared expert in column/row chunks as extra phases,
  gated per token (qwen2-moe sigmoid shared gate);
* accumulates everything in one f32 VMEM scratch and emits y = sum_k
  w_k * expert_k(x) + g * shared(x) in a single output.

Dequantization uses the same per-block scale/bias algebra as
kernels/decode_model._qmatmul (bit-matching the per-layer path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mnn_tpu.kernels.common import round_up
from mnn_tpu.kernels.decode_model import (VMEM_BUDGET, _bf16r, _qmatmul,
                                          _qmatmul_rows)

B8 = 8


def _split_act(part, ci):
    """64-block interleaved gate/up split + SwiGLU (layers.GU_BLOCK)."""
    part = _bf16r(part)
    part_s = pltpu.roll(part, 2 * ci - 64, 1)
    gate = jnp.concatenate(
        [part[:, kb * 128:kb * 128 + 64] for kb in range(ci // 64)], axis=1)
    up = jnp.concatenate(
        [part_s[:, kb * 128:kb * 128 + 64] for kb in range(ci // 64)],
        axis=1)
    return _bf16r(_bf16r(gate * jax.lax.logistic(gate)) * up)


def _plan_shared(c, layers) -> Optional[int]:
    """Column chunk ci_sh for the shared expert, or None if no shared."""
    si = c.shared_expert_intermediate_size
    if not si:
        return None
    h = c.hidden_size
    mi = c.moe_intermediate_size
    bits = layers.wgu_e.bits
    pack = 2 if bits == 4 else 1
    # fixed: routed expert blocks (gu + dn + planes), double-buffered
    fixed = 2 * (h // pack * 2 * mi + mi // pack * h) \
        + 8 * (h // 128 * 2 * mi + mi // 128 * h)  # planes, generous
    fixed += 4 * B8 * h * 4  # x, y, acc, slack
    import math

    bs_dn = layers.wdown_shared.block_size if layers.wdown_shared else 128
    align = bs_dn * 64 // math.gcd(bs_dn, 64)  # lcm: plane rows + gu split
    opts = [v for v in (1024, 768, 512, 384, 256, 128, 64)
            if si % v == 0 and v % align == 0]
    for ci in opts:
        cost = 2 * (h // pack * 2 * ci + ci // pack * h) \
            + 8 * (h // 128 * 2 * ci + round_up(ci // 128, 1) * h)
        if fixed + cost <= VMEM_BUDGET:
            return ci
    return None


def supports(c, layers, n_tokens: int) -> bool:
    """Static eligibility for the fused MoE decode kernel."""
    if not c.is_moe or layers.wgu_e is None:
        return False
    if n_tokens > B8:
        return False
    ql = layers.wgu_e
    if ql.bits not in (4, 8) or ql.act_bits != 16 or ql.out_bias is not None:
        return False
    if layers.wdown_e.bits != ql.bits:
        return False
    h, mi = c.hidden_size, c.moe_intermediate_size
    if h % ql.block_size or mi % layers.wdown_e.block_size:
        return False
    if mi % 64 or h % 128:
        return False
    si = c.shared_expert_intermediate_size
    if si:
        sq = layers.wgu_shared
        if sq is None or sq.bits != ql.bits or sq.out_bias is not None:
            return False
        if si % layers.wdown_shared.block_size or si % 64:
            return False
        if _plan_shared(c, layers) is None:
            return False
    # routed expert pair must fit whole (double-buffered) in VMEM
    pack = 2 if ql.bits == 4 else 1
    pair = h // pack * 2 * mi + mi // pack * h
    return 2 * pair + 4 * B8 * h * 4 <= VMEM_BUDGET


def _kernel(
    sel_ref,                 # prefetch [NK + 1] int32: flat ids, then layer
    x_ref,                   # [B8, H] f32
    wsel_ref,                # SMEM [NK] f32 routing weights
    gate_ref,                # [B8, 128] f32 shared-expert gate (rows)
    guw_ref, gus_ref, gub_ref,   # routed gu: (1, H//pack, 2mi) + planes
    dnw_ref, dns_ref, dnb_ref,   # routed dn: (1, mi//pack, H) + planes
    *rest,
    nk, k_top, h, mi, ci_sh, n_sh, bits, bs_h, bs_mi, bs_sh_dn,
):
    if n_sh:
        (sguw_ref, sgus_ref, sgub_ref, sdnw_ref, sdns_ref, sdnb_ref,
         y_ref, acc_scr) = rest
    else:
        y_ref, acc_scr = rest
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(p < nk)
    def _routed():
        x = x_ref[...]
        part = _qmatmul(x, guw_ref, gus_ref[0], gub_ref[0],
                        bits=bits, bs=bs_h, k=h)
        act = _split_act(part, mi)
        term = _qmatmul(act, dnw_ref, dns_ref[0], dnb_ref[0],
                        bits=bits, bs=bs_mi, k=mi)
        w = wsel_ref[p]
        ti = p // k_top
        rows = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], h), 0)
        acc_scr[...] = acc_scr[...] + jnp.where(rows == ti, term * w, 0.0)

    if n_sh:
        @pl.when(p >= nk)
        def _shared():
            x = x_ref[...]
            part = _qmatmul(x, sguw_ref, sgus_ref[0], sgub_ref[0],
                            bits=bits, bs=bs_h, k=h)
            act = _split_act(part, ci_sh)
            term = _qmatmul_rows(
                act, lambda r0, r1: sdnw_ref[0, 0, r0:r1, :],
                sdns_ref[0, 0], sdnb_ref[0, 0],
                bits=bits, bs=bs_sh_dn, k=ci_sh)
            acc_scr[...] = acc_scr[...] + term * gate_ref[:, 0:1]

    @pl.when(p == nk + n_sh - 1)
    def _():
        y_ref[...] = acc_scr[...]


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def moe_decode_mlp(
    x: jax.Array,            # [n, H] post-norm hidden (n <= 8 tokens)
    layers,                  # LayerParams with [L, E, ...] expert stacks
    sel: jax.Array,          # [n, k] int32 expert ids for THIS layer
    wsel: jax.Array,         # [n, k] f32 routing weights
    layer_index: jax.Array,  # [] int32
    gate: Optional[jax.Array],   # [n] f32 shared-expert gate (or None)
    *,
    config,
    interpret: bool = False,
) -> jax.Array:
    """y[n, H] f32 = sum_k wsel * expert_sel(x) + gate * shared(x).

    Expert stacks are addressed FLAT over [L*E] via scalar-prefetched
    BlockSpec offsets — no per-layer or per-expert weight slicing.
    """
    c = config
    n, h = x.shape
    mi = c.moe_intermediate_size
    k_top = c.num_experts_per_tok
    nk = n * k_top
    e = c.num_experts
    lay = layers
    bits = lay.wgu_e.bits
    pack = 2 if bits == 4 else 1
    bs_h = lay.wgu_e.block_size
    bs_mi = lay.wdown_e.block_size
    si = c.shared_expert_intermediate_size
    ci_sh = _plan_shared(c, lay) if si else None
    n_sh = (si // ci_sh) if si else 0

    nl = c.num_layers

    def flat2(a):      # [L, E, R, N] -> [L*E, R, N]
        return a.reshape(nl * e, *a.shape[2:])

    guw = flat2(lay.wgu_e.packed)
    gus = flat2(lay.wgu_e.scale)
    gub = flat2(lay.wgu_e.bias)
    dnw = flat2(lay.wdown_e.packed)
    dns = flat2(lay.wdown_e.scale)
    dnb = flat2(lay.wdown_e.bias)

    xp = jnp.zeros((B8, h), jnp.float32).at[:n].set(x.astype(jnp.float32))
    sel_flat = (jnp.asarray(layer_index, jnp.int32) * e
                + sel.reshape(-1).astype(jnp.int32))
    S = jnp.concatenate(
        [sel_flat, jnp.reshape(jnp.asarray(layer_index, jnp.int32), (1,))])
    wv = wsel.reshape(-1).astype(jnp.float32)
    gate_v = jnp.zeros((B8, 128), jnp.float32)
    if gate is not None:
        gate_v = gate_v.at[:n].set(
            jnp.broadcast_to(gate.astype(jnp.float32)[:, None], (n, 128)))
    elif si:
        gate_v = gate_v.at[:n].set(1.0)

    def at_e(p_, S_):
        return (S_[jnp.clip(p_, 0, nk - 1)], 0, 0)

    in_specs = [
        pl.BlockSpec((B8, h), lambda p_, S_: (0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),              # wsel
        pl.BlockSpec((B8, 128), lambda p_, S_: (0, 0)),     # gate rows
        pl.BlockSpec((1, h // pack, 2 * mi), at_e),
        pl.BlockSpec((1, h // bs_h, 2 * mi), at_e),
        pl.BlockSpec((1, h // bs_h, 2 * mi), at_e),
        pl.BlockSpec((1, mi // pack, h), at_e),
        pl.BlockSpec((1, mi // bs_mi, h), at_e),
        pl.BlockSpec((1, mi // bs_mi, h), at_e),
    ]
    args = [S, xp, wv, gate_v, guw, gus, gub, dnw, dns, dnb]
    bs_sh_dn = 128
    if si:
        sq, sd = lay.wgu_shared, lay.wdown_shared
        bs_sh = sq.block_size
        bs_sh_dn = sd.block_size

        def at_sh(p_, S_):
            ch = jnp.clip(p_ - nk, 0, n_sh - 1)
            return (S_[nk], 0, ch)

        def at_sh_dn(p_, S_):
            ch = jnp.clip(p_ - nk, 0, n_sh - 1)
            return (S_[nk], ch, 0, 0)

        sdw4 = sd.packed.reshape(nl, n_sh, ci_sh // pack, h)
        sds4 = sd.scale.reshape(nl, n_sh, ci_sh // bs_sh_dn, h)
        sdb4 = sd.bias.reshape(nl, n_sh, ci_sh // bs_sh_dn, h)
        in_specs += [
            pl.BlockSpec((1, h // pack, 2 * ci_sh), at_sh),
            pl.BlockSpec((1, h // bs_sh, 2 * ci_sh), at_sh),
            pl.BlockSpec((1, h // bs_sh, 2 * ci_sh), at_sh),
            pl.BlockSpec((1, 1, ci_sh // pack, h), at_sh_dn),
            pl.BlockSpec((1, 1, ci_sh // bs_sh_dn, h), at_sh_dn),
            pl.BlockSpec((1, 1, ci_sh // bs_sh_dn, h), at_sh_dn),
        ]
        args += [sq.packed, sq.scale, sq.bias, sdw4, sds4, sdb4]

    kernel = functools.partial(
        _kernel, nk=nk, k_top=k_top, h=h, mi=mi, ci_sh=ci_sh or 0,
        n_sh=n_sh, bits=bits, bs_h=bs_h, bs_mi=bs_mi, bs_sh_dn=bs_sh_dn,
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nk + n_sh,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B8, h), lambda p_, S_: (0, 0)),
            scratch_shapes=[pltpu.VMEM((B8, h), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B8, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (nk * 3 * h * mi + (3 * h * si if si else 0)),
            bytes_accessed=(nk * 3 * h * mi + (3 * h * si if si else 0))
            // pack,
            transcendentals=nk * mi + (si if si else 0),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*args)
    return y[:n]
