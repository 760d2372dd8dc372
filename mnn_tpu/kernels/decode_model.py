"""Whole-model fused decode step: every layer of the decoder in ONE Pallas
kernel (a persistent "megakernel").

Why: batch-1 decode is a pure weight-streaming problem — the activation is a
single [B, hidden] vector while every weight byte is read once per token.
The per-layer path costs ~96 kernel launches plus ~490us/step of XLA glue
(reshapes, norms, residual adds, cache scatters — measured on chip, see
git history); at that scale the glue is half the token time. The reference
collapses the same structure into single Executions per op and a tight
interpreter loop (/root/reference/source/core/Pipeline.cpp:1167-1211); the
TPU-native end point of that idea is one kernel for the whole forward pass.

Design (generalized chunking — v2):
* grid = (num_layers, P) executed sequentially, P phases per layer:
    p in [0, n_qkv)          qkv projection, one output-column chunk per
                             phase into a VMEM scratch; the LAST chunk
                             phase also does input-RMSNorm'd rope + KV
                             quant + online-softmax seed with the new token
    p in [A0, A0 + nkv)      flash attention over the layer's KV cache tiles
    p in [W0, W0 + n_wo)     output projection, one K-chunk (rows of wo)
                             per phase accumulating in VMEM; last chunk
                             adds the residual + post-norm
    p in [M0, M0 + n_mlp)    fused MLP chunk pairs: each phase computes one
                             gate/up column chunk AND immediately consumes
                             it through the matching down-proj row chunk —
                             the SwiGLU activation never exists outside
                             registers/VMEM of its own phase
* EVERY weight operand is chunked so its double-buffered VMEM footprint is
  bounded; `_plan` solves the chunk sizes against the ~16MB VMEM budget
  jointly (the original design kept whole-layer qkv/wo buffers, which
  VMEM-OOMs at 44MB for 7B-class dims — measured, see git history).
* The residual stream x lives in a VMEM scratch for the entire kernel: zero
  HBM round-trips for activations, norms, or residuals.
* Weights stream through Pallas's revolving buffers. Index maps are STAGED:
  each operand's index only changes on the step before its phase needs it,
  so its DMA overlaps the previous phase's compute instead of piling up at
  the layer boundary.
* Weights stay int4/int8-packed in HBM; dequantization uses the same
  per-block algebra as kernels/dequant_matmul.py (dot on the quantized
  pattern, scale/bias applied to [M, bn] partial products). Scale/bias
  planes are bf16 in HBM (quant/quantize.py), upcast in VMEM.
* Attention replicates kernels/decode_step.py: the new token's K/V is
  quantized in-kernel, seeds the softmax from VMEM (bit-matching a cache
  readback), and the quantized rows + scales are emitted as [L, ...]-stacked
  outputs — the caller scatters ALL layers with 4 dynamic-update-slices
  (vs 4 per layer unfused).

Reference parity: this one kernel covers what MNN runs as the decode-side
CPUAttention + quantized GEMV asm + CPURoPE/CPULayerNorm executions chained
by the Session interpreter (SURVEY.md §2.4, §3.3 hot loop).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mnn_tpu.kernels.common import largest_divisor_leq, round_up
from mnn_tpu.kernels.decode_step import NEG_INF, _rms, _rope_full

# VMEM budget for the solver: ~16MB physical minus headroom for Mosaic
# spills, semaphores and the odd compiler-introduced copy.
VMEM_BUDGET = 14 << 20


def _divisor_chunks(dim: int, align: int):
    """Divisors of `dim` that are multiples of `align`, descending."""
    out = []
    d = align
    while d <= dim:
        if dim % d == 0:
            out.append(d)
        d += align
    return sorted(out, reverse=True)


@dataclasses.dataclass(frozen=True)
class _Plan:
    bnq: int      # qkv output-column chunk
    n_qkv: int
    bkwo: int     # wo input-row chunk
    n_wo: int
    ci: int       # MLP intermediate chunk (gate/up cols = 2*ci, down rows = ci)
    n_mlp: int
    bkv: int      # attention KV tile
    nkv: int

    @property
    def fused_attn(self) -> bool:
        # single-chunk qkv/kv/wo co-reside in VMEM (the planner budgets all
        # chunks simultaneously), so the whole attention block collapses
        # into ONE grid step: qkv -> rope/seed -> attend -> wo -> residual
        # execute back-to-back in program order. 5 -> 3 phases/layer on the
        # 0.5B bench (120 -> 72 grid steps/token).
        return self.n_qkv == 1 and self.nkv == 1 and self.n_wo == 1

    @property
    def phases(self) -> int:
        if self.fused_attn:
            return 1 + self.n_mlp
        return self.n_qkv + self.nkv + self.n_wo + self.n_mlp


def _plan(c, layers, cache, batch: int) -> Optional[_Plan]:
    """Solve chunk sizes under the VMEM budget; None if infeasible.

    Objective: MINIMIZE the total phase count (grid steps/token) subject to
    the double-buffered VMEM footprint fitting the budget — every extra
    phase is a smaller per-phase matmul and another round of DMA descriptor
    overhead (round 2 seeded chunks at a hardcoded ~2.5MB target and only
    ever shrank, which fragmented the 0.5B bench into 19 MLP phases/layer
    and cost 31% decode throughput). The divisor lattices are tiny, so an
    exhaustive scan is exact and runs once at trace time.
    """
    lay = layers
    h = c.hidden_size
    d = c.head_dim
    hkv = c.num_kv_heads
    nq = (c.num_heads + 2 * hkv) * d
    dq = c.q_dim
    i_dim = c.intermediate_size
    s = cache.capacity
    bits = lay.wqkv.bits
    pack = 2 if bits == 4 else 1
    bs_h = lay.wqkv.block_size
    bs_i = lay.wdown.block_size
    b8 = 8
    g = c.num_heads // hkv
    gp = round_up(g, 8)

    def sbytes(ql):  # per-operand scale/bias plane element bytes
        return 4 if ql.scale.dtype == jnp.float32 else 2

    sb_q = sbytes(lay.wqkv)
    sb_o = sbytes(lay.wo)
    sb_g = sbytes(lay.wgu)
    sb_d = sbytes(lay.wdown)

    # KV tile: candidates up to 1024 (measured: one 1024-tile beats two
    # 512-tiles by ~50us/step on the 0.5B bench — one less phase/layer).
    # Tiles are searched jointly with the weight chunks below; a non-512
    # tile reorders the online-softmax f32 sums vs decode_step.py by
    # ~1e-8, which the parity tests' KV-tie tolerance already covers.
    bkv0 = largest_divisor_leq(s, min(512, s), min(512, s))
    if s % bkv0:
        return None
    bkv_opts = [bkv0]
    if s % 1024 == 0:
        bkv_opts.insert(0, 1024)

    qkv_opts = _divisor_chunks(nq, 128) if nq % 128 == 0 else [nq]
    wo_opts = _divisor_chunks(dq, bs_h)
    # ci must divide i_dim, be a multiple of bs_i (plane4 reshape + sd/bd
    # block specs), and give a 128-aligned 2*ci gate/up chunk
    ci_align = bs_i * 64 // math.gcd(bs_i, 64)  # lcm: multiple of 64 => 2*ci%128==0
    ci_opts = _divisor_chunks(i_dim, ci_align)
    if not (qkv_opts and wo_opts and ci_opts):
        return None

    def wbytes(k_dim, n_dim):  # packed weight chunk bytes
        return k_dim * n_dim // pack

    def total(bnq, bkwo, ci, bkv):
        # all double-buffered inputs + scratch (see fused_decode_model)
        w = (
            wbytes(h, bnq)                       # wqkv chunk
            + (h // bs_h) * bnq * sb_q * 2       # sq/bq
            + wbytes(bkwo, h)                    # wo chunk
            + (bkwo // bs_h) * h * sb_o * 2
            + wbytes(h, 2 * ci)                  # wgu chunk
            + (h // bs_h) * 2 * ci * sb_g * 2
            + wbytes(ci, h)                      # wdown chunk
            + (ci // bs_i) * h * sb_d * 2
            + 2 * batch * hkv * bkv * d * (1 if cache.bits == 8 else 2)  # k+v
            + (2 * batch * hkv * bkv * 4 if cache.bits == 8 else 0)     # k/v sc
            + nq * 4 + 2 * h * 4 + 2 * d * 4     # out-bias + norms + qk-norms
            + b8 * h * 4 + b8 * 2 * d * 4        # x input + cos/sin
        )
        scratch = (
            3 * b8 * h * 4          # x, rn, acc
            + b8 * nq * 4           # qkv
            + b8 * dq * 4           # att
            + batch * hkv * gp * (2 * d + 2 * 128) * 4  # q, accA, m, l
        )
        outs = b8 * h * 4 + 2 * batch * hkv * 8 * d * 4 + batch * hkv * 8 * 128 * 4
        return 2 * w + scratch + 2 * outs

    best = None  # (phases, vmem_total), bnq, bkwo, ci, bkv
    for bkv in bkv_opts:
        for bnq in qkv_opts:
            for bkwo in wo_opts:
                for ci in ci_opts:
                    t = total(bnq, bkwo, ci, bkv)
                    if t > VMEM_BUDGET:
                        continue
                    phases = (nq // bnq + s // bkv + dq // bkwo
                              + i_dim // ci)
                    # tie-break: fewer phases, then more VMEM headroom
                    key = (phases, t)
                    if best is None or key < best[0]:
                        best = (key, bnq, bkwo, ci, bkv)
    if best is None:
        return None
    _, bnq, bkwo, ci, bkv = best
    return _Plan(
        bnq=bnq, n_qkv=nq // bnq,
        bkwo=bkwo, n_wo=dq // bkwo,
        ci=ci, n_mlp=i_dim // ci,
        bkv=bkv, nkv=s // bkv,
    )


def supports(config, params, cache, batch: int) -> bool:
    """Static eligibility of the megakernel for this (config, cache, batch)."""
    c = config
    if c.is_moe or c.kv_rotate:
        return False
    # gemma-family configs take the scan path (forward() forces it), but
    # guard here too: the kernel hardcodes swiglu/plain-norm/no-softcap
    if c.sandwich_norm or c.mlp_act != "silu" or c.attn_softcap \
            or c.swa_every_other:
        return False
    if cache.bits not in (8, 16):
        return False
    if batch > 8:
        return False
    if c.head_dim not in (64, 128):
        return False
    lay = params.layers
    if lay.wgu is None or lay.wdown is None:
        return False
    for ql in (lay.wqkv, lay.wo, lay.wgu, lay.wdown):
        if ql.act_bits != 16 or ql.bits not in (4, 8):
            return False
        if ql.out_bias is not None and ql is not lay.wqkv:
            return False
    if lay.wo.block_size != lay.wqkv.block_size:
        return False
    if lay.wgu.block_size != lay.wqkv.block_size:
        return False
    bs_h = lay.wqkv.block_size
    bs_i = lay.wdown.block_size
    if c.hidden_size % bs_h or c.q_dim % bs_h or c.intermediate_size % bs_i:
        return False
    # the in-kernel gate/up split assumes the 64-block interleave layout
    if c.intermediate_size % 64:
        return False
    if cache.capacity % min(512, cache.capacity) != 0:
        return False
    return _plan(c, lay, cache, batch) is not None


def _bf16r(v):
    """Round f32 -> bf16 -> f32: replicate the per-layer path's op-boundary
    dtype (decoder.py keeps x/qkv/act in bf16 between kernels; the
    megakernel keeps everything in f32 VMEM, so parity requires rounding at
    exactly the same points)."""
    return v.astype(jnp.bfloat16).astype(jnp.float32)


def _dequant_block(w_ref_slice, bits, dtype=jnp.bfloat16):
    """Unpack one quant block's packed rows -> [bs, bn] pattern matrix."""
    w32 = w_ref_slice.astype(jnp.int32)
    if bits == 4:
        lo = w32 & 0xF
        hi = (w32 >> 4) & 0xF
        return jnp.concatenate([lo, hi], axis=0).astype(dtype)
    return (w32 & 0xFF).astype(dtype)


def _qmatmul(x_f32, w_ref, s, b, *, bits, bs, k):
    """x @ dequant(W) with per-block scale/bias on partial products.

    x_f32: [M, k] f32 value; w_ref block [1, k//pack, bn]; s/b are LOADED
    [NB, bn] plane values holding exactly this chunk's quant-block rows
    (bf16 storage, upcast at use). Returns [M, bn] f32.
    """
    nb = k // bs
    half = bs // 2
    x = x_f32.astype(jnp.bfloat16)
    acc = None
    for kb in range(nb):
        if bits == 4:
            q = _dequant_block(w_ref[0, kb * half:(kb + 1) * half, :], bits)
        else:
            q = _dequant_block(w_ref[0, kb * bs:(kb + 1) * bs, :], bits)
        xb = x[:, kb * bs:(kb + 1) * bs]
        part = jnp.dot(xb, q, preferred_element_type=jnp.float32)
        # rowsum over the SAME bf16-rounded x the MXU dot consumes — the
        # dequant identity x@w = (x@q)*s + rowsum(x)*b needs one x, and
        # dequant_matmul sums its bf16 copy (numeric parity across paths)
        rsb = jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
        term = part * s[kb:kb + 1].astype(jnp.float32) \
            + rsb * b[kb:kb + 1].astype(jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _kernel(
    # scalar prefetch
    lens_ref,      # SMEM [B8] int32 pre-append lengths (padded rows = 0)
    # operands
    x_ref,         # [B8, H] f32 embedding-residual input
    cs_ref,        # [B8, 2, D] f32 full-width (cos; sin)
    wqkv_ref, sq_ref, bq_ref, qkvb_ref,   # qkv packed/scale/bias/out-bias
    wo_ref, so_ref, bo_ref,
    wgu_ref, sg_ref, bg_ref,
    wdn_ref, sd_ref, bd_ref,
    innorm_ref, postnorm_ref,             # [1, 1, H] f32
    qkn_ref,                              # [1, 2, D] f32 (q_norm; k_norm)
    k_ref, v_ref,                         # [1, BH, bkv, D] int8/bf16
    ks_ref, vs_ref,                       # [1, BH, 1, bkv] f32 (quantized)
    # outputs
    xo_ref,        # [B8, H] f32
    krow_ref, vrow_ref,                   # [1, BH, 8, D] f32
    kvsc_ref,                             # [1, BH, 8, 128] f32 rows 0/1
    # scratch
    x_scr,         # [B8, H] f32 residual stream
    rn_scr,        # [B8, H] f32 normed input (qkv phases) then MLP input
    qkv_scr,       # [B8, NQ] f32 assembled qkv projection
    acc_scr,       # [B8, H] f32 wo / down-proj accumulator
    q_scr,         # [BH, GP, D] f32 roped queries
    m_scr, l_scr,  # [BH, GP, 128] f32
    accA_scr,      # [BH, GP, D] f32 attention accumulator
    att_scr,       # [n_wo, B8, bkwo] f32 chunked attention output
    *,
    b, hkv, g, gp, d, h, nq, dq,
    plan: _Plan,
    bits, bs_h, bs_i, has_qkv_bias, use_qk_norm,
    scale, eps, quantized, window, sink,
):
    l = pl.program_id(0)
    p = pl.program_id(1)
    nl = pl.num_programs(0)
    n_qkv, nkv = plan.n_qkv, plan.nkv
    n_wo, n_mlp = plan.n_wo, plan.n_mlp
    bnq, bkwo, ci, bkv = plan.bnq, plan.bkwo, plan.ci, plan.bkv
    if plan.fused_attn:
        A0 = W0 = 0          # same grid step as qkv: bodies run in order
        M0 = 1
    else:
        A0 = n_qkv
        W0 = A0 + nkv
        M0 = W0 + n_wo

    # ---- qkv column chunks (+ rope/quant/seed on the last one) -------------
    for c_q in range(n_qkv):
        @pl.when(p == c_q)
        def _qkv_phase(c_q=c_q):
            @pl.when(jnp.logical_and(l == 0, p == 0))
            def _():
                x_scr[...] = x_ref[...]

            @pl.when(p == 0)
            def _():
                rn_scr[...] = _rms(x_scr[...], innorm_ref[0, 0], eps)

            rn = rn_scr[...]
            part = _qmatmul(rn, wqkv_ref, sq_ref[0], bq_ref[0],
                            bits=bits, bs=bs_h, k=h)       # [B8, bnq]
            if has_qkv_bias:
                part = part + qkvb_ref[0, 0, c_q * bnq:(c_q + 1) * bnq]
            part = _bf16r(part)   # per-layer qkv is a bf16 kernel output
            if n_qkv == 1:
                qkv_scr[...] = part
            else:
                qkv_scr[:, c_q * bnq:(c_q + 1) * bnq] = part

    @pl.when(p == n_qkv - 1)
    def _rope_seed_phase():
        qkv = qkv_scr[...]
        # per (batch, kv-head): extract rows, rope, qk-norm, quantize, seed
        for bi in range(b):
            cos = cs_ref[bi, 0:1]
            sin = cs_ref[bi, 1:2]
            # Mosaic concat requires identical vreg offsets: normalize the
            # batch row to sublane 0 (roll over sublanes), and pre-roll a
            # 64-lane-shifted copy so every D-wide slice below starts at a
            # 128-aligned lane (offset 0) regardless of D=64 parity.
            b8 = qkv.shape[0]
            qrow = pltpu.roll(qkv, (b8 - bi) % b8, 0)[0:1, :]
            qrow_s = pltpu.roll(qrow, nq - d, 1) if d % 128 else None
            for hi in range(hkv):
                bh = bi * hkv + hi
                off = hi * (g + 2) * d

                def lane_slice(start):
                    if start % 128 == 0 or qrow_s is None:
                        return qrow[:, start:start + d]
                    return qrow_s[:, start - d:start]

                rows = jnp.concatenate(
                    [lane_slice(off + r * d) for r in range(g + 2)], axis=0)
                q = rows[:g]
                kr = rows[g:g + 1]
                vr = rows[g + 1:g + 2]
                if use_qk_norm:
                    q = _rms(q, qkn_ref[0, 0:1], eps)
                    kr = _rms(kr, qkn_ref[0, 1:2], eps)
                q = _rope_full(q, cos, sin)
                kr = _rope_full(kr, cos, sin)
                if gp != g:
                    q = jnp.pad(q, ((0, gp - g), (0, 0)))
                q_scr[bh] = q

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
                    kvsc_ref[0, bh] = jnp.where(
                        rowid == 0, ksc, jnp.where(rowid == 1, vsc, 1.0))
                else:
                    kq = kr.astype(jnp.bfloat16).astype(jnp.float32)
                    vq = vr.astype(jnp.bfloat16).astype(jnp.float32)
                    k_att = kq
                    v_att = vq
                krow_ref[0, bh] = jnp.broadcast_to(kq, (8, d))
                vrow_ref[0, bh] = jnp.broadcast_to(vq, (8, d))

                s_new = (q @ k_att.T) * scale           # [GP, 1]
                m_scr[bh] = jnp.broadcast_to(s_new, (gp, 128))
                l_scr[bh] = jnp.ones((gp, 128), jnp.float32)
                accA_scr[bh] = jnp.broadcast_to(v_att, (gp, d))

    # ---- attention over cache tiles -----------------------------------------
    @pl.when(jnp.logical_and(p >= A0, p < A0 + nkv))
    def _att_phase():
        j = p - A0
        kv_start = j * bkv
        for bi in range(b):
            len_old = lens_ref[bi]

            @pl.when(kv_start < len_old)
            def _():
                for hi in range(hkv):
                    bh = bi * hkv + hi
                    q = q_scr[bh]
                    kt = k_ref[0, bh].astype(jnp.float32)
                    s = jax.lax.dot_general(
                        q, kt, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [GP, bkv]
                    if quantized:
                        s = s * ks_ref[0, bh]
                    s = s * scale
                    col = kv_start + jax.lax.broadcasted_iota(
                        jnp.int32, (gp, bkv), 1)
                    mask = col < len_old
                    if window:
                        in_w = col > len_old - window
                        if sink:
                            in_w = jnp.logical_or(in_w, col < sink)
                        mask = jnp.logical_and(mask, in_w)
                    s = jnp.where(mask, s, NEG_INF)

                    m_prev = m_scr[bh]
                    m_cur = jnp.max(s, axis=1, keepdims=True)
                    m_new = jnp.maximum(
                        m_prev, jnp.broadcast_to(m_cur, (gp, 128)))
                    pr = jnp.exp(s - m_new[:, :1])
                    pv = pr * vs_ref[0, bh] if quantized else pr
                    alpha = jnp.exp(m_prev - m_new)
                    l_scr[bh] = l_scr[bh] * alpha + jnp.broadcast_to(
                        jnp.sum(pr, axis=1, keepdims=True), (gp, 128))
                    m_scr[bh] = m_new
                    vt = v_ref[0, bh].astype(jnp.float32)
                    accA_scr[bh] = accA_scr[bh] * alpha[:, :1] + (
                        jax.lax.dot_general(
                            pv, vt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))

        # finalize on the last tile: flatten [G, D] heads into att rows.
        # Build each batch row as one full-width [1, DQ] value (repeat the
        # 64-lane head row across DQ, mask to its block, accumulate) so the
        # scr store is full-width — no unaligned sub-row stores, and every
        # addend is offset-0 (sublane-normalizing roll before the slice).
        # att_scr is [n_wo, B8, bkwo]: chunk-major so the wo phases index
        # their K-chunk with a plain dynamic major-dim read.
        @pl.when(p == A0 + nkv - 1)
        def _fin():
            n_wo_ = plan.n_wo
            bkwo_ = plan.bkwo
            colblk = jax.lax.broadcasted_iota(jnp.int32, (1, dq), 1) // d
            for bi in range(b):
                row = jnp.zeros((1, dq), jnp.float32)
                for hi in range(hkv):
                    bh = bi * hkv + hi
                    ln = l_scr[bh][:, :1]
                    ln = jnp.where(ln == 0.0, 1.0, ln)
                    o = accA_scr[bh] / ln               # [GP, D]
                    for r in range(g):
                        piece = pltpu.roll(o, (gp - r) % gp, 0)[0:1, :]
                        tiled = pltpu.repeat(piece, dq // d, 1)
                        row = row + jnp.where(colblk == hi * g + r, tiled, 0.0)
                for cw in range(n_wo_):
                    att_scr[cw, bi:bi + 1, :] = \
                        row[:, cw * bkwo_:(cw + 1) * bkwo_]

    # ---- output projection K-chunks + residual ------------------------------
    # ONE parametric body for every chunk phase (the chunk index appears
    # only in predicates and the att-chunk read): unrolled per-chunk copies
    # made the kernel's code size O(n_wo + n_mlp), which at 7B dims
    # (n_mlp=37) exploded Mosaic compile time and blew the instruction
    # budget at runtime.
    @pl.when(jnp.logical_and(p >= W0, p < W0 + n_wo))
    def _wo_phase():
        c_w = p - W0
        if n_wo == 1:
            att = att_scr[0]
        else:
            att = att_scr[c_w]        # dynamic MAJOR-dim index
        term = _qmatmul(att, wo_ref, so_ref[0, 0], bo_ref[0, 0],
                        bits=bits, bs=bs_h, k=bkwo)

        @pl.when(c_w == 0)
        def _():
            acc_scr[...] = term

        @pl.when(c_w > 0)
        def _():
            acc_scr[...] = acc_scr[...] + term

        @pl.when(c_w == n_wo - 1)
        def _():
            # per-layer: o is a bf16 kernel output, then x = x + o in
            # bf16 — round o first, then the bf16 residual sum.
            # (acc_scr already holds this phase's term: VMEM stores commit
            # in program order within the kernel body.)
            x = _bf16r(x_scr[...] + _bf16r(acc_scr[...]))
            x_scr[...] = x
            rn_scr[...] = _rms(x, postnorm_ref[0, 0], eps)

    # ---- fused MLP chunk pairs: gate/up chunk -> SwiGLU -> down chunk -------
    # wgu columns are 64-block gate/up interleaved (layers.GU_BLOCK): split
    # with aligned lane slices — Mosaic has no strided slice / pair reshape.
    @pl.when(jnp.logical_and(p >= M0, p < M0 + n_mlp))
    def _mlp_phase():
        c_m = p - M0
        rn2 = rn_scr[...]
        part = _qmatmul(rn2, wgu_ref, sg_ref[0], bg_ref[0],
                        bits=bits, bs=bs_h, k=h)      # [B8, 2*ci]
        part = _bf16r(part)   # per-layer gu is a bf16 kernel output
        # 64-lane-shifted copy so 'up' slices start 128-aligned too
        part_s = pltpu.roll(part, 2 * ci - 64, 1)
        gate = jnp.concatenate(
            [part[:, kb * 128:kb * 128 + 64]
             for kb in range(ci // 64)], axis=1)
        up = jnp.concatenate(
            [part_s[:, kb * 128:kb * 128 + 64]
             for kb in range(ci // 64)], axis=1)
        # per-layer swiglu: silu(gate f32) -> bf16, then a bf16 product
        act = _bf16r(_bf16r(gate * jax.lax.logistic(gate)) * up)
        term = _qmatmul(act, wdn_ref, sd_ref[0, 0], bd_ref[0, 0],
                        bits=bits, bs=bs_i, k=ci)     # [B8, H]

        @pl.when(c_m == 0)
        def _():
            acc_scr[...] = term

        @pl.when(c_m > 0)
        def _():
            acc_scr[...] = acc_scr[...] + term

        @pl.when(c_m == n_mlp - 1)
        def _():
            x = _bf16r(x_scr[...] + _bf16r(acc_scr[...]))
            x_scr[...] = x

            @pl.when(l == nl - 1)
            def _():
                xo_ref[...] = x


def fused_decode_model(
    x: jax.Array,              # [B, H] f32/bf16 embedding output
    layers,                    # LayerParams ([L, ...]-stacked)
    k_cache: jax.Array,        # [L, B, Hkv, S, D] int8/bf16
    v_cache: jax.Array,
    k_scale: Optional[jax.Array],   # [L, B, Hkv, S] f32
    v_scale: Optional[jax.Array],
    lengths: jax.Array,        # [B] int32 pre-append lengths
    cos: jax.Array,            # [B, D] f32 FULL-width rope phases
    sin: jax.Array,
    *,
    config,
    interpret: bool = False,
):
    """Run all decoder layers for one decode position in one kernel.

    Returns (x_out [B, H] f32, k_rows [L, B, Hkv, 1, D] f32,
    v_rows, k_sc [L, B, Hkv, 1] | None, v_sc): the caller scatters the rows
    into the cache at each sequence's length.
    """
    c = config
    b = x.shape[0]
    h = c.hidden_size
    d = c.head_dim
    hkv = c.num_kv_heads
    g = c.num_heads // c.num_kv_heads
    gp = round_up(g, 8)
    nq = (c.num_heads + 2 * hkv) * d
    dq = c.q_dim
    i_dim = c.intermediate_size
    nl = c.num_layers
    s = k_cache.shape[3]
    quantized = k_cache.dtype == jnp.int8
    bits = layers.wqkv.bits
    bs_h = layers.wqkv.block_size
    bs_i = layers.wdown.block_size
    if layers.wo.block_size != bs_h or layers.wgu.block_size != bs_h:
        raise ValueError("megakernel requires uniform hidden-dim block size")
    sm_scale = 1.0 / (d ** 0.5)

    @dataclasses.dataclass
    class _CacheView:
        capacity: int
        bits: int

    plan = _plan(c, layers,
                 _CacheView(capacity=s, bits=8 if quantized else 16), b)
    if plan is None:
        raise ValueError("megakernel: no VMEM-feasible chunk plan "
                         "(supports() should have gated this config)")
    n_qkv, nkv, n_wo, n_mlp = plan.n_qkv, plan.nkv, plan.n_wo, plan.n_mlp
    bnq, bkwo, ci, bkv = plan.bnq, plan.bkwo, plan.ci, plan.bkv

    if plan.fused_attn:
        A0 = W0 = 0          # same grid step as qkv: bodies run in order
        M0 = 1
    else:
        A0 = n_qkv
        W0 = A0 + nkv
        M0 = W0 + n_wo
    P = plan.phases

    b8 = 8
    xp = jnp.zeros((b8, h), jnp.float32).at[:b].set(x.astype(jnp.float32))
    lens = jnp.zeros((b8,), jnp.int32).at[:b].set(
        jnp.asarray(lengths, jnp.int32))
    cs = jnp.zeros((b8, 2, d), jnp.float32)
    cs = cs.at[:b, 0].set(jnp.concatenate([cos, cos], axis=-1)[:, :d]
                          if cos.shape[-1] * 2 == d else cos)
    cs = cs.at[:b, 1].set(jnp.concatenate([sin, sin], axis=-1)[:, :d]
                          if sin.shape[-1] * 2 == d else sin)

    lay = layers
    has_qkv_bias = lay.wqkv.out_bias is not None
    use_qk_norm = c.qk_norm

    pack = 2 if bits == 4 else 1

    # scale/bias planes as [L, nb, N]: 3D blocks keep the natural T(8,128)
    # tiling — a trailing singleton dim forced a T(1,128) relayout copy of
    # every plane inside the decode scan (measured ~48us/step on chip)
    def plane(a, k_dim, bs):
        return a.reshape(nl, k_dim // bs, a.shape[-1])

    # K-chunked planes (wo/wdown) go 4D [L, n_chunks, nb_chunk, N] so the
    # per-chunk block is FULL in its last two dims — a 3D block of
    # (1, nb_chunk, N) with nb_chunk neither a multiple of 8 nor the full
    # dim violates Mosaic's block-shape rule (hit on chip at 7B dims)
    def plane4(a, k_dim, bs, chunk):
        return a.reshape(nl, k_dim // chunk, chunk // bs, a.shape[-1])

    sq = plane(lay.wqkv.scale, h, bs_h)
    bq = plane(lay.wqkv.bias, h, bs_h)
    so = plane4(lay.wo.scale, dq, bs_h, bkwo)
    bo = plane4(lay.wo.bias, dq, bs_h, bkwo)
    sg = plane(lay.wgu.scale, h, bs_h)
    bg = plane(lay.wgu.bias, h, bs_h)
    sd = plane4(lay.wdown.scale, i_dim, bs_i, ci)
    bd = plane4(lay.wdown.bias, i_dim, bs_i, ci)
    if has_qkv_bias:
        qkvb = lay.wqkv.out_bias.reshape(nl, 1, nq)
    else:
        qkvb = jnp.zeros((1, 1, nq), jnp.float32)
    innorm = lay.input_norm.reshape(nl, 1, h).astype(jnp.float32)
    postnorm = lay.post_norm.reshape(nl, 1, h).astype(jnp.float32)
    if use_qk_norm:
        qkn = jnp.stack(
            [lay.q_norm, lay.k_norm], axis=1).astype(jnp.float32)  # [L, 2, D]
    else:
        qkn = jnp.ones((1, 2, d), jnp.float32)

    k4 = k_cache.reshape(nl, b * hkv, s, d)
    v4 = v_cache.reshape(nl, b * hkv, s, d)
    if quantized:
        ks4 = k_scale.reshape(nl, b * hkv, 1, s).astype(jnp.float32)
        vs4 = v_scale.reshape(nl, b * hkv, 1, s).astype(jnp.float32)
    else:
        ks4 = jnp.zeros((1, b * hkv, 1, 128), jnp.float32)
        vs4 = jnp.zeros((1, b * hkv, 1, 128), jnp.float32)

    # ---- staged index maps (fetch one step before the consuming phase) ----
    # Chunked operands clamp their chunk index into the phase range, so the
    # next chunk's DMA is issued during the previous phase and the first
    # chunk of layer l+1 is issued during layer l's last phase.
    def at_qkv(l_, p_, L):
        ch = jnp.clip(p_, 0, n_qkv - 1)
        return (l_, 0, ch)

    def at_qkvb(l_, p_, L):
        return (l_ if has_qkv_bias else 0, 0, 0)

    def at_wo(l_, p_, L):
        lw = jnp.where(p_ >= W0, l_, jnp.maximum(l_ - 1, 0))
        ch = jnp.where(p_ >= W0, jnp.clip(p_ - W0, 0, n_wo - 1), n_wo - 1)
        return (lw, ch, 0)

    def at_wo_sc(l_, p_, L):
        lw = jnp.where(p_ >= W0, l_, jnp.maximum(l_ - 1, 0))
        ch = jnp.where(p_ >= W0, jnp.clip(p_ - W0, 0, n_wo - 1), n_wo - 1)
        return (lw, ch, 0, 0)

    def mlp_chunk(l_, p_):
        in_phase = p_ >= M0
        lw = jnp.where(in_phase, l_, jnp.maximum(l_ - 1, 0))
        ch = jnp.where(in_phase, jnp.clip(p_ - M0, 0, n_mlp - 1), n_mlp - 1)
        return lw, ch

    def at_gu(l_, p_, L):
        lw, ch = mlp_chunk(l_, p_)
        return (lw, 0, ch)

    def at_dn(l_, p_, L):
        lw, ch = mlp_chunk(l_, p_)
        return (lw, ch, 0)

    def at_dn_sc(l_, p_, L):
        lw, ch = mlp_chunk(l_, p_)
        return (lw, ch, 0, 0)

    def kv_tile(l_, p_):
        in_phase = jnp.logical_and(p_ >= A0, p_ < A0 + nkv)
        lw = jnp.where(p_ >= A0, l_, jnp.maximum(l_ - 1, 0))
        t = jnp.where(in_phase, jnp.clip(p_ - A0, 0, nkv - 1), nkv - 1)
        return lw, t

    def at_kv(l_, p_, L):
        lw, t = kv_tile(l_, p_)
        return (lw, 0, t, 0)

    def at_kv_sc(l_, p_, L):
        lw, t = kv_tile(l_, p_)
        return ((lw, 0, 0, t) if quantized else (0, 0, 0, 0))

    def at_norm(l_, p_, L):
        return (l_, 0, 0)

    def at_qkn(l_, p_, L):
        return (l_ if use_qk_norm else 0, 0, 0)

    def const2(l_, p_, L):
        return (0, 0)

    def const3(l_, p_, L):
        return (0, 0, 0)

    kernel = functools.partial(
        _kernel,
        b=b, hkv=hkv, g=g, gp=gp, d=d, h=h, nq=nq, dq=dq,
        plan=plan, bits=bits, bs_h=bs_h, bs_i=bs_i,
        has_qkv_bias=has_qkv_bias, use_qk_norm=use_qk_norm,
        scale=sm_scale, eps=c.rms_norm_eps, quantized=quantized,
        window=c.sliding_window, sink=c.attention_sink,
    )

    nb_h = h // bs_h
    in_specs = [
        pl.BlockSpec((b8, h), const2),                      # x
        pl.BlockSpec((b8, 2, d), const3),                   # cos/sin
        pl.BlockSpec((1, h // pack, bnq), at_qkv),          # wqkv chunk
        pl.BlockSpec((1, nb_h, bnq), at_qkv),               # sq
        pl.BlockSpec((1, nb_h, bnq), at_qkv),               # bq
        pl.BlockSpec((1, 1, nq), at_qkvb),                  # qkv out-bias
        pl.BlockSpec((1, bkwo // pack, h), at_wo),          # wo chunk
        pl.BlockSpec((1, 1, bkwo // bs_h, h), at_wo_sc),    # so
        pl.BlockSpec((1, 1, bkwo // bs_h, h), at_wo_sc),    # bo
        pl.BlockSpec((1, h // pack, 2 * ci), at_gu),        # wgu chunk
        pl.BlockSpec((1, nb_h, 2 * ci), at_gu),             # sg
        pl.BlockSpec((1, nb_h, 2 * ci), at_gu),             # bg
        pl.BlockSpec((1, ci // pack, h), at_dn),            # wdown chunk
        pl.BlockSpec((1, 1, ci // bs_i, h), at_dn_sc),      # sd
        pl.BlockSpec((1, 1, ci // bs_i, h), at_dn_sc),      # bd
        pl.BlockSpec((1, 1, h), at_norm),                   # input_norm
        pl.BlockSpec((1, 1, h), at_norm),                   # post_norm
        pl.BlockSpec((1, 2, d), at_qkn),                    # qk norms
        pl.BlockSpec((1, b * hkv, bkv, d), at_kv),          # k tile
        pl.BlockSpec((1, b * hkv, bkv, d), at_kv),          # v tile
        pl.BlockSpec(
            (1, b * hkv, 1, bkv if quantized else 128), at_kv_sc),
        pl.BlockSpec(
            (1, b * hkv, 1, bkv if quantized else 128), at_kv_sc),
    ]

    out_shape = [
        jax.ShapeDtypeStruct((b8, h), jnp.float32),
        jax.ShapeDtypeStruct((nl, b * hkv, 8, d), jnp.float32),
        jax.ShapeDtypeStruct((nl, b * hkv, 8, d), jnp.float32),
        jax.ShapeDtypeStruct((nl, b * hkv, 8, 128), jnp.float32),
    ]
    row_spec = pl.BlockSpec((1, b * hkv, 8, d), lambda l_, p_, L: (l_, 0, 0, 0))
    out_specs = [
        pl.BlockSpec((b8, h), const2),
        row_spec, row_spec,
        pl.BlockSpec((1, b * hkv, 8, 128), lambda l_, p_, L: (l_, 0, 0, 0)),
    ]

    two_i = 2 * i_dim
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nl, P),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((b8, h), jnp.float32),          # x
                pltpu.VMEM((b8, h), jnp.float32),          # rn
                pltpu.VMEM((b8, nq), jnp.float32),         # qkv
                pltpu.VMEM((b8, h), jnp.float32),          # acc
                pltpu.VMEM((b * hkv, gp, d), jnp.float32),  # q
                pltpu.VMEM((b * hkv, gp, 128), jnp.float32),  # m
                pltpu.VMEM((b * hkv, gp, 128), jnp.float32),  # l
                pltpu.VMEM((b * hkv, gp, d), jnp.float32),  # accA
                pltpu.VMEM((plan.n_wo, b8, plan.bkwo),
                           jnp.float32),                   # att (chunked)
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nl * (h * nq + dq * h + h * two_i + i_dim * h),
            bytes_accessed=nl * (h * nq + dq * h + h * two_i + i_dim * h)
            // pack + nl * 2 * b * hkv * s * d,
            transcendentals=nl * b * hkv * s,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        lens, xp, cs,
        lay.wqkv.packed, sq, bq, qkvb,
        lay.wo.packed, so, bo,
        lay.wgu.packed, sg, bg,
        lay.wdown.packed, sd, bd,
        innorm, postnorm, qkn,
        k4, v4, ks4, vs4,
    )

    x_out = outs[0][:b]
    k_rows = outs[1][:, :, 0].reshape(nl, b, hkv, 1, d)
    v_rows = outs[2][:, :, 0].reshape(nl, b, hkv, 1, d)
    if quantized:
        k_sc = outs[3][:, :, 0, 0].reshape(nl, b, hkv, 1)
        v_sc = outs[3][:, :, 1, 0].reshape(nl, b, hkv, 1)
        return x_out, k_rows, v_rows, k_sc, v_sc
    return x_out, k_rows, v_rows, None, None


def scatter_rows(cache, k_rows, v_rows, k_sc, v_sc, lengths):
    """Write all layers' new-token rows into the stacked cache (4 scatters)."""
    import dataclasses

    from mnn_tpu.runtime.kvcache import KVCache  # noqa: F401

    b = cache.k.shape[1]
    s = cache.capacity
    pos = jnp.clip(lengths, 0, s - 1)
    zero = jnp.zeros((), jnp.int32)
    if b == 1:
        p0 = pos[0]
        k = jax.lax.dynamic_update_slice(
            cache.k, k_rows.astype(cache.k.dtype), (zero, zero, zero, p0, zero))
        v = jax.lax.dynamic_update_slice(
            cache.v, v_rows.astype(cache.v.dtype), (zero, zero, zero, p0, zero))
        if cache.quantized:
            ks = jax.lax.dynamic_update_slice(
                cache.k_scale, k_sc, (zero, zero, zero, p0))
            vs = jax.lax.dynamic_update_slice(
                cache.v_scale, v_sc, (zero, zero, zero, p0))
            return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs)
        return dataclasses.replace(cache, k=k, v=v)
    # non-adjacent advanced indices would move the broadcast batch dim to
    # the FRONT of the indexed shape ((B, L, Hkv, D) vs value (L, B, Hkv, D))
    # — scatter per batch row with scalar indices instead
    k, v = cache.k, cache.v
    ks, vs = cache.k_scale, cache.v_scale
    for bi in range(b):
        k = k.at[:, bi, :, pos[bi]].set(
            k_rows[:, bi, :, 0].astype(cache.k.dtype))
        v = v.at[:, bi, :, pos[bi]].set(
            v_rows[:, bi, :, 0].astype(cache.v.dtype))
        if cache.quantized:
            ks = ks.at[:, bi, :, pos[bi]].set(k_sc[:, bi, :, 0])
            vs = vs.at[:, bi, :, pos[bi]].set(v_sc[:, bi, :, 0])
    if cache.quantized:
        return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs)
    return dataclasses.replace(cache, k=k, v=v)
