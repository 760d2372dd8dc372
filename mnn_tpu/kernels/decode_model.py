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

# VMEM budget for the solver against the PADDED-tile accounting in
# _plan.total(): the chip's scoped-vmem limit is 16.00MB and the solver's
# byte model counts physical tiles (lane dim rounded to 128, sublane dim to
# the dtype tile), so only a small margin for Mosaic bookkeeping is left
# out. Round 4 shipped a VMEM OOM (16.01M/16.00M, kv4 cache at capacity
# 4096) precisely because the old model ignored tile padding — int4 KV
# tiles (d_store=32 lanes) occupy 4x their logical bytes.
VMEM_BUDGET = (15 << 20) + (1 << 19)  # 15.5 MB
# MLP runs as a manual-DMA loop when n_mlp is at most this (see
# _Plan.phases for the measured crossover vs revolving grid phases)
MLP_MANUAL_MAX = 8
# Deep mode (3-deep shared slot rings replacing all revolving weight
# phases) — module flag for A/B measurement.
DEEP_ENABLE = True


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
    bnv: int = 0  # lm-head vocab-column chunk (0 = head not fused)
    hslots: int = 2  # head slot depth (3 when dedicated slots have room)
    mlp_manual: bool = True  # manual-DMA MLP loop vs revolving grid phases
    deep: bool = False  # ALL weights stream through 3-deep manual rings

    @property
    def fused_attn(self) -> bool:
        # single-chunk qkv/kv/wo co-reside in VMEM (the planner budgets all
        # chunks simultaneously), so the whole attention block collapses
        # into ONE grid step: qkv -> rope/seed -> attend -> wo -> residual
        # execute back-to-back in program order.
        if self.deep:
            return False
        return self.n_qkv == 1 and self.nkv == 1 and self.n_wo == 1

    @property
    def phases(self) -> int:
        # mlp_manual: MLP chunks run as a manual-DMA loop INSIDE the last
        # wo phase (a revolving-buffer grid step costs ~2us fixed vs
        # ~0.7us per manually pipelined chunk — measured on the 0.5B
        # bench, 72 -> 25 steps/token). At large n_mlp the revolving
        # pipeline wins at 2-deep manual slots (7B, n_mlp=37: manual cost
        # ~1.6us/chunk and regressed 5242 -> 5890us/step); the DEEP
        # mode's 3-deep rings collapse a layer to one qkv phase + the KV
        # phases with qkv/wo/MLP/head chunks all hand-pipelined.
        if self.deep:
            return 1 + self.nkv
        base = 1 if self.fused_attn else self.n_qkv + self.nkv + self.n_wo
        return base + (0 if self.mlp_manual else self.n_mlp)


def _plan(c, layers, cache, batch: int, head=None,
          head_reuse: bool = False) -> Optional[_Plan]:
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

    def _vb(shape, esize):
        """Physical VMEM bytes of a buffer: the lane (last) dim pads to
        128 and the sublane (second-to-last) dim pads to the dtype's tile
        rows (f32/i32: 8, bf16: 16, int8: 32). This padding is REAL
        occupancy — an int4-packed KV tile with d_store=32 lanes costs 4x
        its logical bytes — and ignoring it is what let round 4 ship a
        scoped-vmem OOM."""
        sub = {4: 8, 2: 16, 1: 32}[esize]
        lead = 1
        for v in shape[:-2]:
            lead *= v
        s, l2 = shape[-2], shape[-1]
        return lead * round_up(s, sub) * round_up(l2, 128) * esize

    # KV tile: candidates up to 4096 (measured: one 1024-tile beats two
    # 512-tiles by ~50us/step on the 0.5B bench — one less phase/layer —
    # and long caches want even fewer attention phases: at capacity 4096
    # the 1024-tile plan pays 3 extra grid steps/layer, most of the
    # round-4 long-context gap). The solver weighs them jointly with the
    # weight chunks under the VMEM budget; a non-512 tile reorders the
    # online-softmax f32 sums vs decode_step.py by ~1e-8, which the
    # parity tests' KV-tie tolerance already covers.
    bkv0 = largest_divisor_leq(s, min(512, s), min(512, s))
    if s % bkv0:
        return None
    bkv_opts = [bkv0]
    for big in (1024, 2048, 4096):
        if s % big == 0:
            bkv_opts.insert(0, big)

    # lm-head fusion: the head streams through 2 manually double-buffered
    # VMEM slots inside ONE grid step (per-grid-step fixed cost ~2us would
    # otherwise eat the head's own HBM-ideal time). When the head's quant
    # geometry matches the layers' (same bits + block size — the common
    # case), the head REUSES the MLP chunk slots (the head runs after the
    # last layer has drained them), so fusing it costs only the small
    # logits out-slots: bnv is pinned to the gu slot width 2*ci. Otherwise
    # dedicated slots are budgeted and bnv searched.
    vocab = c.vocab_size
    vocab128 = vocab // 128 * 128
    if head is not None:
        nbh = h // head.block_size
        sb_h = sbytes(head)
        bnv_opts = [v for v in (4096, 2048, 1024, 512, 256, 128)
                    if v <= vocab]
        if not bnv_opts:
            head = None
            head_reuse = False

    def head_bnv(ci):
        # reuse mode: bnv == the gu slot width so the slot DMAs stay
        # contiguous (a narrower bnv in a wider slot is a strided write,
        # measured ~4% slower on the 0.5B bench)
        return min(2 * ci, vocab128)

    def head_bytes(bnv, hslots):
        if head is None:
            return 0
        # logits slots + best/besti running-argmax scratch + token out x2
        out_slots = _vb((2, b8, bnv), 4) + 2 * _vb((b8, 128), 4) \
            + 2 * _vb((b8, 128), 4)
        if head_reuse:
            # slot-reuse head: the weight/plane slots are the (drained)
            # MLP gu slots — only the logits/argmax extras are new
            return out_slots
        nbh_p = round_up(nbh, 8)  # planes padded to 8-row DMA alignment
        slot = _vb((h * head.bits // 8, bnv), 1) \
            + _vb((2 * nbh_p, bnv), sb_h)
        return hslots * slot + out_slots

    qkv_opts = _divisor_chunks(nq, 128) if nq % 128 == 0 else [nq]
    wo_opts = _divisor_chunks(dq, bs_h)
    # ci must divide i_dim, be a multiple of bs_i (plane4 reshape + sd/bd
    # block specs), and give a 128-aligned 2*ci gate/up chunk
    ci_align = bs_i * 64 // math.gcd(bs_i, 64)  # lcm: multiple of 64 => 2*ci%128==0
    ci_opts = _divisor_chunks(i_dim, ci_align)
    if not (qkv_opts and wo_opts and ci_opts):
        return None

    d_store = d // 2 if cache.bits == 4 else d
    kv_es = 2 if cache.bits == 16 else 1

    def total(bnq, bkwo, ci, bkv, manual):
        """Physical VMEM bytes for one candidate plan: double-buffered
        revolving operand/output blocks (x2) + single-copy scratch,
        every buffer at its PADDED tile size (_vb). Mirrors the in_specs
        / out_specs / scratch_shapes built in fused_decode_model."""
        dbl = (
            _vb((b8, h), 4)                     # x
            + _vb((b8, 4, d), 4)                # cos/sin
            + _vb((h * bits // 8, bnq), 1)      # wqkv chunk
            + 2 * _vb((h // bs_h, bnq), sb_q)   # sq/bq
            + _vb((1, nq), 4)                   # qkv out-bias
            + _vb((bkwo * bits // 8, h), 1)     # wo chunk
            + 2 * _vb((bkwo // bs_h, h), sb_o)  # so/bo
            + 4 * _vb((1, h), 4)                # in/post/preffn/postffn norms
            + _vb((2, d), 4)                    # qk norms
            + 2 * _vb((batch * hkv, bkv, d_store), kv_es)   # k/v tiles
            + (2 * _vb((batch * hkv, 1, bkv), 4)
               if cache.bits < 16 else 2 * _vb((batch * hkv, 1, 128), 4))
        )
        if not manual:  # revolving MLP chunks are pipeline operands
            dbl += (
                _vb((h * bits // 8, 2 * ci), 1)         # wgu chunk
                + _vb((2 * (h // bs_h), 2 * ci), sb_g)  # gsb chunk
                + _vb((ci * bits // 8, h), 1)           # wdown chunk
                + _vb((2 * (ci // bs_i), h), sb_d)      # dsb chunk
            )
        outs = (
            _vb((b8, h), 4)                          # xo
            + 2 * _vb((batch * hkv, 8, d_store), 4)  # krow/vrow
            + _vb((batch * hkv, 8, 128), 4)          # kvsc
        )
        scratch = (
            3 * _vb((b8, h), 4)                      # x, rn, acc
            + _vb((b8, nq), 4)                       # qkv
            + 2 * _vb((batch * hkv, gp, d), 4)       # q, accA
            + 2 * _vb((batch * hkv, gp, 128), 4)     # m, l
            + (dq // bkwo) * _vb((b8, bkwo), 4)      # att (chunk-major)
        )
        if manual:  # MLP manual-DMA double-buffer slots
            nb_h_p = round_up(h // bs_h, 8)
            nb_ci_p = round_up(ci // bs_i, 8)
            scratch += (
                2 * _vb((h * bits // 8, 2 * ci), 1)
                + 2 * _vb((2 * nb_h_p, 2 * ci), sb_g)
                + 2 * _vb((ci * bits // 8, h), 1)
                + 2 * _vb((2 * nb_ci_p, h), sb_d)
            )
        return 2 * (dbl + outs) + scratch

    best = None  # (phases, -bnv, vmem_total), bnq, bkwo, ci, bkv, bnv, ...
    if head_reuse:
        outer_bnv = [None]       # bnv derived from ci inside the loop
    elif head is not None:
        outer_bnv = bnv_opts
    else:
        outer_bnv = [0]
    for bnv_o in outer_bnv:
        for bkv in bkv_opts:
            for bnq in qkv_opts:
                for bkwo in wo_opts:
                    for ci in ci_opts:
                        n_mlp_ = i_dim // ci
                        manual = n_mlp_ <= MLP_MANUAL_MAX
                        if head_reuse and not manual:
                            continue  # slot reuse needs the manual loop
                        bnv = head_bnv(ci) if head_reuse else bnv_o
                        base = total(bnq, bkwo, ci, bkv, manual)
                        # a third head slot deepens the manual DMA
                        # pipeline (absorbs per-chunk turnaround, measured
                        # ~34us of 122 on the 0.5B head) — take it when
                        # the REAL footprint allows, else fall back to 2
                        hs = 2
                        if head is not None and not head_reuse and bnv:
                            if base + head_bytes(bnv, 3) <= VMEM_BUDGET:
                                hs = 3
                        t = base + head_bytes(bnv, hs)
                        if t > VMEM_BUDGET:
                            continue
                        # overhead units: a grid step costs ~3x a manually
                        # pipelined MLP chunk (measured ~2us vs ~0.7us)
                        grid = nq // bnq + s // bkv + dq // bkwo \
                            + (0 if manual else n_mlp_)
                        phases = 3 * grid + (n_mlp_ if manual else 0)
                        # tie-break: lowest overhead, then the largest
                        # head chunk (fewer DMA turnarounds), then headroom
                        key = (phases, -bnv, t)
                        if best is None or key < best[0]:
                            best = (key, bnq, bkwo, ci, bkv, bnv, manual,
                                    hs)
    if best is None:
        return None
    key, bnq, bkwo, ci, bkv, bnv, manual, hslots = best

    # ---- DEEP mode: every weight chunk hand-pipelined through 3-deep ----
    # shared slot rings. When the best standard plan keeps the MLP on
    # revolving grid phases (big models: 7B pays ~1 grid step/chunk of
    # fixed cost, ~1030 steps/token), try collapsing the whole layer to
    # 1 + nkv grid steps: an A-ring of (h//pack, 2ci) slots carries the
    # qkv column chunks, then the gate/up chunks, then (after the last
    # layer) the lm-head chunks; a B-ring of (ci//pack, h) slots carries
    # the wo row chunks then the down-proj chunks. Shapes are shared so
    # both rings stream continuously across operand and layer boundaries.
    if (DEEP_ENABLE and not manual and head is None and not head_reuse
            and bs_h == bs_i and nq % 128 == 0
            # ring slots are shared across operands: one plane dtype per
            # ring (A: qkv/gu/head, B: wo/down)
            and lay.wqkv.scale.dtype == lay.wgu.scale.dtype
            and lay.wo.scale.dtype == lay.wdown.scale.dtype
            # packed slots shared: one weight bit-width for the layer
            and lay.wo.bits == bits and lay.wgu.bits == bits
            and lay.wdown.bits == bits):

        def deep_total(ci_, bkv_):
            two = 2 * ci_
            nbp_b = round_up(ci_ // bs_i, 8)
            nb_h_p = round_up(h // bs_h, 8)
            n_wo_ = dq // ci_
            pools = 3 * (
                _vb((h * bits // 8, two), 1)        # A weight slots
                + _vb((2 * nb_h_p, two), sb_g)      # A plane slots
                + _vb((ci_ * bits // 8, h), 1)      # B weight slots
                + _vb((2 * nbp_b, h), sb_d)         # B plane slots
            )
            dbl = (
                _vb((b8, h), 4) + _vb((b8, 4, d), 4)
                + _vb((1, nq), 4)                   # qkv out-bias
                + 2 * _vb((1, 128), 4)              # dummy bq/bo blocks
                + 4 * _vb((1, h), 4) + _vb((2, d), 4)
                + 2 * _vb((batch * hkv, bkv_, d_store), kv_es)
                + (2 * _vb((batch * hkv, 1, bkv_), 4)
                   if cache.bits < 16 else 2 * _vb((batch * hkv, 1, 128), 4))
            )
            outs = (
                _vb((b8, h), 4)
                + 2 * _vb((batch * hkv, 8, d_store), 4)
                + _vb((batch * hkv, 8, 128), 4)
                + 2 * _vb((b8, 128), 4)             # token (head may fuse)
            )
            scratch = (
                3 * _vb((b8, h), 4) + _vb((b8, nq), 4)
                + 2 * _vb((batch * hkv, gp, d), 4)
                + 2 * _vb((batch * hkv, gp, 128), 4)
                + n_wo_ * _vb((b8, ci_), 4)         # att chunk-major
                + _vb((2, b8, two), 4)              # head logits slots
                + 2 * _vb((b8, 128), 4)             # best/besti
            )
            return pools + 2 * (dbl + outs) + scratch

        best_d = None
        for bkv_ in bkv_opts:
            for ci_ in ci_opts:
                if dq % ci_ or i_dim // ci_ < 2:
                    continue
                two = 2 * ci_
                n_qkv_ = -(-nq // two)
                if (nq - (n_qkv_ - 1) * two) % 128:
                    continue
                t = deep_total(ci_, bkv_)
                if t > VMEM_BUDGET:
                    continue
                chunks = n_qkv_ + dq // ci_ + 2 * (i_dim // ci_) \
                    + 3 * (s // bkv_ + 1)
                kd = (chunks, t)
                if best_d is None or kd < best_d[0]:
                    best_d = (kd, ci_, bkv_)
        if best_d is not None:
            _, ci_, bkv_ = best_d
            two = 2 * ci_
            return _Plan(
                bnq=two, n_qkv=-(-nq // two),
                bkwo=ci_, n_wo=dq // ci_,
                ci=ci_, n_mlp=i_dim // ci_,
                bkv=bkv_, nkv=s // bkv_,
                bnv=min(two, vocab128), hslots=3,
                mlp_manual=False, deep=True,
            )

    return _Plan(
        bnq=bnq, n_qkv=nq // bnq,
        bkwo=bkwo, n_wo=dq // bkwo,
        ci=ci, n_mlp=i_dim // ci,
        bkv=bkv, nkv=s // bkv, bnv=bnv, hslots=hslots, mlp_manual=manual,
    )


def supports(config, params, cache, batch: int) -> bool:
    """Static eligibility of the megakernel for this (config, cache, batch)."""
    c = config
    if c.is_moe or c.kv_rotate:
        return False
    # gemma2-class configs (sandwich norms, gelu, score softcap,
    # alternating windows) and gemma3's N:1 sliding pattern + dual rope
    # are all handled by kernel flags (swa_alt / swa_p + a second
    # cos/sin pair in the phase operand)
    if c.mlp_act not in ("silu", "gelu_tanh"):
        return False
    if cache.bits not in (4, 8, 16) or getattr(cache, "codebook", False):
        return False
    if batch > 8:
        return False
    if c.head_dim not in (64, 128, 256):
        return False
    lay = params.layers
    if lay.wgu is None or lay.wdown is None:
        return False
    for ql in (lay.wqkv, lay.wo, lay.wgu, lay.wdown):
        if ql.act_bits != 16 or ql.bits not in (2, 3, 4, 8):
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


def supports_head(config, params) -> bool:
    """Can the lm head + greedy argmax be fused into the kernel's last step?

    Requires a quantized (int4/int8, W-A16) head with no out-bias, a
    128-aligned vocab (whole-lane DMA tiles; the clamped-overlap tail trick
    then needs no masking), and no logit softcap (gemma is megakernel-
    ineligible anyway). Reference analog: the decode-side deferred-dequant
    vocab GEMV + argmax that MNN runs as separate executions after the
    module forward (llm.cpp sample loop, sampler.cpp:236).
    """
    from mnn_tpu.quant.quantize import QuantizedLinear

    head = params.lm_head
    if not isinstance(head, QuantizedLinear):
        return False
    # Sub-4-bit heads are excluded: the in-kernel head chunk loop with
    # the W2/W3 unpack hard-faults the TPU worker (Mosaic-level crash,
    # reproduced on chip at bench shapes; the megakernel BODY runs W2/W3
    # fine — only the head's manual-slot loop trips it). W2/W3 run the
    # separate autotuned head GEMV instead.
    if head.bits not in (4, 8) or head.act_bits != 16:
        return False
    if head.out_bias is not None:
        return False
    if head.packed.ndim != 2:
        return False
    c = config
    if c.vocab_size % 128:
        return False
    if c.hidden_size % head.block_size:
        return False
    return True


def _bf16r(v):
    """Round f32 -> bf16 -> f32: replicate the per-layer path's op-boundary
    dtype (decoder.py keeps x/qkv/act in bf16 between kernels; the
    megakernel keeps everything in f32 VMEM, so parity requires rounding at
    exactly the same points)."""
    return v.astype(jnp.bfloat16).astype(jnp.float32)


def _dequant_block(w_ref_slice, bits, dtype=jnp.bfloat16, bs=128):
    """Unpack one quant block's packed rows -> [bs, bn] pattern matrix.

    Layouts per quant/quantize.py: W4 nibble pairs (i, i + bs/2); W2 four
    2-bit groups (i + m*bs/4); W3 a 2-bit plane (bs/4 rows) + a 1-bit
    plane (bs/8 rows), q = lo2 + 4*hi1 — bitplanes keep every shift/mask
    lane-aligned (byte-spanning 3-bit codes would not be; the same
    constraint keeps TQ3 KV off the fast path).
    """
    w32 = w_ref_slice.astype(jnp.int32)
    if bits == 4:
        lo = w32 & 0xF
        hi = (w32 >> 4) & 0xF
        return jnp.concatenate([lo, hi], axis=0).astype(dtype)
    if bits == 2:
        return jnp.concatenate(
            [(w32 >> (2 * m)) & 3 for m in range(4)], axis=0).astype(dtype)
    if bits == 3:
        lo_r = w32[:bs // 4]
        hi_r = w32[bs // 4:]
        lo = jnp.concatenate(
            [(lo_r >> (2 * m)) & 3 for m in range(4)], axis=0)
        hi = jnp.concatenate([(hi_r >> m) & 1 for m in range(8)], axis=0)
        return (lo + 4 * hi).astype(dtype)
    return (w32 & 0xFF).astype(dtype)


def _qmatmul_rows(x_f32, read_rows, s, b, *, bits, bs, k):
    """x @ dequant(W) with per-block scale/bias on partial products.

    x_f32: [M, k] f32 value; read_rows(r0, r1) returns packed-weight rows
    [r1-r0, bn] (from a revolving block or a manual-DMA slot); s/b are
    LOADED [NB, bn] plane values holding exactly this chunk's quant-block
    rows (bf16 storage, upcast at use). Returns [M, bn] f32.
    """
    nb = k // bs
    rpb = bs * bits // 8   # packed rows per quant block
    x = x_f32.astype(jnp.bfloat16)
    acc = None
    for kb in range(nb):
        q = _dequant_block(read_rows(kb * rpb, (kb + 1) * rpb), bits, bs=bs)
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


def _qmatmul(x_f32, w_ref, s, b, *, bits, bs, k):
    """_qmatmul_rows over a revolving-buffer block [1, k//pack, bn]."""
    return _qmatmul_rows(
        x_f32, lambda r0, r1: w_ref[0, r0:r1, :], s, b, bits=bits, bs=bs,
        k=k)


def _kernel(
    # scalar prefetch
    lens_ref,      # SMEM [B8] int32 pre-append lengths (padded rows = 0)
    # operands
    x_ref,         # [B8, H] f32 embedding-residual input
    cs_ref,        # [B8, 2, D] f32 full-width (cos; sin)
    wqkv_ref, sq_ref, bq_ref, qkvb_ref,   # qkv packed/scale/bias/out-bias
    wo_ref, so_ref, bo_ref,
    gw_ref, gsb_ref,   # ANY: [L, H//pack, 2I] + [L, 2*pad8, 2I] scale||bias
    dw_ref, dsb_ref,   # ANY: [L, n_mlp, ci//pack, H] + stacked planes
    innorm_ref, postnorm_ref,             # [1, 1, H] f32
    preffn_ref, postffn_ref,              # [1, 1, H] f32 (sandwich; ones)
    qkn_ref,                              # [1, 2, D] f32 (q_norm; k_norm)
    k_ref, v_ref,                         # [1, BH, bkv, D] int8/bf16
    ks_ref, vs_ref,                       # [1, BH, 1, bkv] f32 (quantized)
    # with fuse_head, inputs continue: fnorm_ref [1, H] f32 (VMEM),
    #   hw_ref [H//pack, V] int8 (ANY), hs_ref/hb_ref [H//bs, V] (ANY)
    # outputs: xo_ref [B8, H] f32, krow/vrow [1, BH, 8, D] f32,
    #   kvsc [1, BH, 8, 128] f32; fuse_head adds logits_ref [B8, V] f32
    #   (ANY) and token_ref [B8, 128] int32
    # scratch: x/rn/qkv/acc/q/m/l/accA/att, MLP manual-DMA slots
    #   (gu/gs/gb/dn/ds/db + msems DMA[2,6]); fuse_head adds hw/hs/hb
    #   double-buffer slots, lo_scr out slots, best/besti, in_sems
    #   DMA[2,3], out_sems DMA[2]
    *rest,
    b, hkv, g, gp, d, h, nq, dq, nl,
    plan: _Plan,
    bits, bs_h, bs_i, has_qkv_bias, use_qk_norm,
    scale, eps, kv_bits, window, sink,
    softcap=0.0, gelu=False, sandwich=False, swa_alt=False, swa_p=0,
    fuse_head=False, head_reuse=False, n_chunks=0, vocab=0, head_bits=4,
    bs_head=128,
):
    rest = list(rest)
    if fuse_head:
        fnorm_ref, hw_ref, hsb_ref = rest[:3]
        rest = rest[3:]
    xo_ref, krow_ref, vrow_ref, kvsc_ref = rest[:4]
    rest = rest[4:]
    if fuse_head:
        logits_ref, token_ref = rest[:2]
        rest = rest[2:]
    (x_scr, rn_scr, qkv_scr, acc_scr, q_scr, m_scr, l_scr, accA_scr,
     att_scr) = rest[:9]
    rest = rest[9:]
    if plan.deep:
        a_w, a_p, b_w, b_p, a_sems, b_sems = rest[:6]
        rest = rest[6:]
        if fuse_head:
            lo_scr, best_scr, besti_scr, out_sems = rest
            rest = []
        assert not rest
    if plan.mlp_manual:
        gu_s, gsb_s, dn_s, dsb_s, msems = rest[:5]
        rest = rest[5:]
    if plan.deep:
        pass
    elif fuse_head and head_reuse:
        # head streams through the (drained) MLP gu slots — see _plan
        lo_scr, best_scr, besti_scr, out_sems = rest
        hw_scr, hsb_scr = gu_s, gsb_s
        in_sems = msems
    elif fuse_head:
        (hw_scr, hsb_scr, lo_scr, best_scr, besti_scr,
         in_sems, out_sems) = rest
    else:
        assert not rest
    # 2D grid (nl [+1 with fuse_head], P): the extra ROW is the lm-head
    # step (runs at p == 0; other p in that row are no-ops). A flat 1D
    # grid with l = i // P in every index map costs ~1us/step of scalar
    # index math — measured ~900us/token at 7B's 888 grid steps.
    l_raw = pl.program_id(0)
    p = pl.program_id(1)
    l = jnp.minimum(l_raw, nl - 1)
    lv = l_raw < nl          # layer-phase validity (false on the head row)
    n_qkv, nkv = plan.n_qkv, plan.nkv
    n_wo, n_mlp = plan.n_wo, plan.n_mlp
    bnq, bkwo, ci, bkv = plan.bnq, plan.bkwo, plan.ci, plan.bkv
    if plan.deep:
        A0 = 1               # phase 0 = manual qkv loop + rope/seed
        W0 = 1 + nkv         # unused: wo/MLP run inside the last KV phase
    elif plan.fused_attn:
        A0 = W0 = 0          # same grid step as qkv: bodies run in order
    else:
        A0 = n_qkv
        W0 = A0 + nkv
    quantized = kv_bits < 16

    def unpack4(p32):
        # nibble pairing (j, j + D/2), unsigned storage (q + 8):
        # kvcache.quantize_kv4
        lo4 = (p32 & 0xF) - 8
        hi4 = ((p32 >> 4) & 0xF) - 8
        return jnp.concatenate([lo4, hi4], axis=-1)

    # ---- DEEP mode slot-ring DMA helpers ------------------------------------
    # Two independent rings of 3 VMEM slots each stream EVERY weight chunk
    # of the model in a fixed global order (ring position g -> slot g % 3;
    # while chunk g computes, chunks g+1 and g+2 are in flight):
    #   A ring, slots (h//pack, 2ci): per layer [qkv chunks..., gu chunks...],
    #     then after the last layer the lm-head vocab chunks
    #   B ring, slots (ci//pack, h): per layer [wo chunks..., down chunks...]
    # Each chunk is 2 DMAs: packed weights + one stacked scale||bias plane.
    if plan.deep:
        S_r = 3
        RA = n_qkv + n_mlp
        RB = n_wo + n_mlp
        two_ci = 2 * ci
        w_last = nq - (n_qkv - 1) * two_ci
        nbp_hd = round_up(h // bs_h, 8)
        nbp_bd = round_up(ci // bs_i, 8)

        def a_dma_qkv(l_, j, w):
            # j/w static (qkv chunks are an unrolled Python loop)
            st = j * two_ci
            slot = jax.lax.rem(l_ * RA + j, S_r)
            dw_dst = a_w.at[slot] if w == two_ci \
                else a_w.at[slot, :, pl.ds(0, w)]
            dp_dst = a_p.at[slot] if w == two_ci \
                else a_p.at[slot, :, pl.ds(0, w)]
            return (
                pltpu.make_async_copy(
                    wqkv_ref.at[l_, :, pl.ds(st, w)], dw_dst,
                    a_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    sq_ref.at[l_, :, pl.ds(st, w)], dp_dst,
                    a_sems.at[slot, 1]),
            )

        def a_dma_gu(l_, c_):
            slot = jax.lax.rem(l_ * RA + n_qkv + c_, S_r)
            st = pl.multiple_of(c_ * two_ci, 128)
            return (
                pltpu.make_async_copy(
                    gw_ref.at[l_, :, pl.ds(st, two_ci)], a_w.at[slot],
                    a_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    gsb_ref.at[l_, :, pl.ds(st, two_ci)], a_p.at[slot],
                    a_sems.at[slot, 1]),
            )

        def a_dma_head(c_):
            # clamped-overlap tail: the last chunk re-covers columns
            slot = jax.lax.rem(nl * RA + c_, S_r)
            st = pl.multiple_of(
                jnp.minimum(c_ * two_ci, vocab - two_ci), 128)
            return (
                pltpu.make_async_copy(
                    hw_ref.at[:, pl.ds(st, two_ci)], a_w.at[slot],
                    a_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    hsb_ref.at[:, pl.ds(st, two_ci)], a_p.at[slot],
                    a_sems.at[slot, 1]),
            )

        def b_dma_wo(l_, c_):
            slot = jax.lax.rem(l_ * RB + c_, S_r)
            rows = ci * bits // 8
            return (
                pltpu.make_async_copy(
                    wo_ref.at[l_, pl.ds(c_ * rows, rows), :], b_w.at[slot],
                    b_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    so_ref.at[l_, c_], b_p.at[slot], b_sems.at[slot, 1]),
            )

        def b_dma_dn(l_, c_):
            slot = jax.lax.rem(l_ * RB + n_wo + c_, S_r)
            return (
                pltpu.make_async_copy(
                    dw_ref.at[l_, c_], b_w.at[slot], b_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    dsb_ref.at[l_, c_], b_p.at[slot], b_sems.at[slot, 1]),
            )

        def a_start_pos01(l_, j):
            """Start layer l_'s A-ring position j in {0, 1} (static)."""
            if j < n_qkv:
                for dma in a_dma_qkv(
                        l_, j, two_ci if j < n_qkv - 1 else w_last):
                    dma.start()
            elif j - n_qkv < n_mlp:
                for dma in a_dma_gu(l_, j - n_qkv):
                    dma.start()

        def b_start_pos01(l_, j):
            if j < n_wo:
                for dma in b_dma_wo(l_, j):
                    dma.start()
            elif j - n_wo < n_mlp:
                for dma in b_dma_dn(l_, j - n_wo):
                    dma.start()

    # MLP weights stream through manually double-buffered VMEM slots (see
    # _mlp_block): chunk c of layer l lives in slot (l*n_mlp + c) % 2, so
    # the parity chain is continuous across layers and the cross-layer
    # prefetch (chunk 0 of l+1, issued during l's last chunk) lands in the
    # free slot. Scale and bias planes are pre-stacked into ONE array per
    # operand (rows [0, pad) = scale, [pad, 2*pad) = bias): 4 DMAs + waits
    # per chunk instead of 6 — per-chunk fixed cost is what bounds the
    # manual pipeline (measured ~0.7-1us per wait-round).
    if plan.mlp_manual:
        def mlp_dma(l_, c_, slot):
            st = pl.multiple_of(c_ * (2 * ci), 128)
            return (
                pltpu.make_async_copy(
                    gw_ref.at[l_, :, pl.ds(st, 2 * ci)], gu_s.at[slot],
                    msems.at[slot, 0]),
                pltpu.make_async_copy(
                    gsb_ref.at[l_, :, pl.ds(st, 2 * ci)], gsb_s.at[slot],
                    msems.at[slot, 1]),
                pltpu.make_async_copy(
                    dw_ref.at[l_, c_], dn_s.at[slot], msems.at[slot, 2]),
                pltpu.make_async_copy(
                    dsb_ref.at[l_, c_], dsb_s.at[slot], msems.at[slot, 3]),
            )

    # ---- qkv column chunks (+ rope/quant/seed on the last one) -------------
    if not plan.deep:
        for c_q in range(n_qkv):
            @pl.when(jnp.logical_and(p == c_q, lv))
            def _qkv_phase(c_q=c_q):
                @pl.when(jnp.logical_and(l_raw == 0, p == 0))
                def _():
                    x_scr[...] = x_ref[...]

                if plan.mlp_manual:
                    @pl.when(jnp.logical_and(l_raw == 0, p == 0))
                    def _():
                        # warm-up: layer 0's first MLP chunk pair starts
                        # streaming now, overlapping the qkv/attention
                        # compute
                        for dma in mlp_dma(0, 0, 0):
                            dma.start()

                @pl.when(p == 0)
                def _():
                    rn_scr[...] = _rms(x_scr[...], innorm_ref[0, 0], eps)

                rn = rn_scr[...]
                part = _qmatmul(rn, wqkv_ref, sq_ref[0], bq_ref[0],
                                bits=bits, bs=bs_h, k=h)       # [B8, bnq]
                if has_qkv_bias:
                    part = part + qkvb_ref[0, 0, c_q * bnq:(c_q + 1) * bnq]
                part = _bf16r(part)  # per-layer qkv is a bf16 kernel output
                if n_qkv == 1:
                    qkv_scr[...] = part
                else:
                    qkv_scr[:, c_q * bnq:(c_q + 1) * bnq] = part

    if plan.deep:
        @pl.when(jnp.logical_and(p == 0, lv))
        def _deep_qkv_phase():
            @pl.when(l_raw == 0)
            def _():
                x_scr[...] = x_ref[...]
                # warm-up: both rings' first two positions start streaming
                for j in range(min(2, RA)):
                    a_start_pos01(0, j)
                for j in range(min(2, RB)):
                    b_start_pos01(0, j)

            rn_scr[...] = _rms(x_scr[...], innorm_ref[0, 0], eps)
            rn = rn_scr[...]
            for cq in range(n_qkv):
                w = two_ci if cq < n_qkv - 1 else w_last
                slot = jax.lax.rem(l * RA + cq, S_r)
                # prefetch ring position cq + 2 (qkv tail or first gu's)
                nxt = cq + 2
                if nxt < n_qkv:
                    for dma in a_dma_qkv(
                            l, nxt, two_ci if nxt < n_qkv - 1 else w_last):
                        dma.start()
                elif nxt - n_qkv < min(2, n_mlp):
                    for dma in a_dma_gu(l, nxt - n_qkv):
                        dma.start()
                for dma in a_dma_qkv(l, cq, w):
                    dma.wait()
                part = _qmatmul_rows(
                    rn,
                    lambda r0, r1, slot=slot, w=w: a_w[slot, r0:r1, :w],
                    a_p[slot][:nbp_hd, :w], a_p[slot][nbp_hd:, :w],
                    bits=bits, bs=bs_h, k=h)
                if has_qkv_bias:
                    part = part + qkvb_ref[0, 0,
                                           cq * two_ci:cq * two_ci + w]
                part = _bf16r(part)
                qkv_scr[:, cq * two_ci:cq * two_ci + w] = part

    @pl.when(jnp.logical_and(p == (0 if plan.deep else n_qkv - 1), lv))
    def _rope_seed_phase():
        qkv = qkv_scr[...]
        # per (batch, kv-head): extract rows, rope, qk-norm, quantize, seed
        if swa_p:
            # gemma3 dual rope: sliding layers use the LOCAL phase pair
            # (cs rows 2/3); every swa_p-th layer is global (rows 0/1)
            l_glob = jax.lax.rem(l + 1, swa_p) == 0
        for bi in range(b):
            if swa_p:
                cos = jnp.where(l_glob, cs_ref[bi, 0:1], cs_ref[bi, 2:3])
                sin = jnp.where(l_glob, cs_ref[bi, 1:2], cs_ref[bi, 3:4])
            else:
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
                    qmax = 127.0 if kv_bits == 8 else 7.0
                    kabs = jnp.max(jnp.abs(kr))
                    vabs = jnp.max(jnp.abs(vr))
                    ksc = jnp.where(kabs == 0, 1.0, kabs / qmax)
                    vsc = jnp.where(vabs == 0, 1.0, vabs / qmax)
                    kq = jnp.clip(jnp.round(kr / ksc), -qmax - 1, qmax)
                    vq = jnp.clip(jnp.round(vr / vsc), -qmax - 1, qmax)
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
                if kv_bits == 4:
                    # pack as f32-held bytes (scatter casts to int8):
                    # byte j = (q[j]+8) | (q[j+D/2]+8)<<4, wrapped signed
                    def pack4(qv):
                        qi = qv.astype(jnp.int32) + 8
                        byte = qi[:, :d // 2] | (qi[:, d // 2:] << 4)
                        return jnp.where(
                            byte > 127, byte - 256, byte).astype(jnp.float32)
                    krow_ref[0, bh] = jnp.broadcast_to(pack4(kq), (8, d // 2))
                    vrow_ref[0, bh] = jnp.broadcast_to(pack4(vq), (8, d // 2))
                else:
                    krow_ref[0, bh] = jnp.broadcast_to(kq, (8, d))
                    vrow_ref[0, bh] = jnp.broadcast_to(vq, (8, d))

                s_new = (q @ k_att.T) * scale           # [GP, 1]
                if softcap:
                    s_new = jnp.tanh(s_new / softcap) * softcap
                m_scr[bh] = jnp.broadcast_to(s_new, (gp, 128))
                l_scr[bh] = jnp.ones((gp, 128), jnp.float32)
                accA_scr[bh] = jnp.broadcast_to(v_att, (gp, d))

    # ---- attention over cache tiles -----------------------------------------
    @pl.when(jnp.logical_and(jnp.logical_and(p >= A0, p < A0 + nkv), lv))
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
                    if kv_bits == 4:
                        kt = unpack4(k_ref[0, bh].astype(jnp.int32)) \
                            .astype(jnp.float32)
                    s = jax.lax.dot_general(
                        q, kt, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [GP, bkv]
                    if quantized:
                        s = s * ks_ref[0, bh]
                    s = s * scale
                    if softcap:
                        s = jnp.tanh(s / softcap) * softcap
                    col = kv_start + jax.lax.broadcasted_iota(
                        jnp.int32, (gp, bkv), 1)
                    mask = col < len_old
                    if window and swa_alt:
                        # gemma2: even layers slide, odd layers are global
                        win_l = jnp.where(l % 2 == 0, window, 0)
                        in_w = jnp.logical_or(
                            win_l <= 0, col > len_old - win_l)
                        if sink:
                            in_w = jnp.logical_or(in_w, col < sink)
                        mask = jnp.logical_and(mask, in_w)
                    elif window and swa_p:
                        # gemma3: every swa_p-th layer is global, the
                        # rest slide
                        win_l = jnp.where(
                            jax.lax.rem(l + 1, swa_p) == 0, 0, window)
                        in_w = jnp.logical_or(
                            win_l <= 0, col > len_old - win_l)
                        if sink:
                            in_w = jnp.logical_or(in_w, col < sink)
                        mask = jnp.logical_and(mask, in_w)
                    elif window:
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
                    if kv_bits == 4:
                        vt = unpack4(v_ref[0, bh].astype(jnp.int32)) \
                            .astype(jnp.float32)
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
    if not plan.deep:
        @pl.when(jnp.logical_and(
                jnp.logical_and(p >= W0, p < W0 + n_wo), lv))
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
                # (acc_scr already holds this phase's term: VMEM stores
                # commit in program order within the kernel body.)
                o = _bf16r(acc_scr[...])
                if sandwich:  # gemma: post-ATTENTION norm on the output
                    o = _bf16r(_rms(o, postnorm_ref[0, 0], eps))
                x = _bf16r(x_scr[...] + o)
                x_scr[...] = x
                rn_scr[...] = _rms(
                    x, preffn_ref[0, 0] if sandwich else postnorm_ref[0, 0],
                    eps)

    # ---- fused MLP chunk pairs: gate/up chunk -> SwiGLU -> down chunk -------
    # Two modes (plan.mlp_manual, measured crossover in _Plan.phases):
    # shallow-chunk plans run a manually double-buffered DMA loop INSIDE
    # the last wo grid step (program order after _wo_phase's
    # residual+postnorm); deep-chunk plans keep one revolving-buffer grid
    # phase per chunk. wgu columns are 64-block gate/up interleaved
    # (layers.GU_BLOCK): split with aligned lane slices — Mosaic has no
    # strided slice / pair reshape.
    def _mlp_math(read_gu, sb_g, read_dn, sb_d):
        """One chunk pair: gate/up matmul -> swiglu -> down matmul term.

        sb_* stack scale rows then bias rows; the split offset is padded
        to 8 rows only in manual/deep mode (a DMA-slice alignment
        requirement that the revolving pipeline does not have — and padded
        rows there would be wasted HBM traffic)."""
        pad8 = plan.mlp_manual or plan.deep
        nbp_h = round_up(h // bs_h, 8) if pad8 else h // bs_h
        nbp_i = round_up(ci // bs_i, 8) if pad8 else ci // bs_i
        rn2 = rn_scr[...]
        part = _qmatmul_rows(rn2, read_gu, sb_g[:nbp_h], sb_g[nbp_h:],
                             bits=bits, bs=bs_h, k=h)
        part = _bf16r(part)   # per-layer gu is a bf16 kernel output
        # 64-lane-shifted copy so 'up' slices start 128-aligned too
        part_s = pltpu.roll(part, 2 * ci - 64, 1)
        gate = jnp.concatenate(
            [part[:, kb * 128:kb * 128 + 64]
             for kb in range(ci // 64)], axis=1)
        up = jnp.concatenate(
            [part_s[:, kb * 128:kb * 128 + 64]
             for kb in range(ci // 64)], axis=1)
        # per-layer activation: silu/gelu on the f32 gate -> bf16, then a
        # bf16 product (matches _gated_act's rounding points)
        if gelu:
            act = _bf16r(_bf16r(jax.nn.gelu(gate, approximate=True)) * up)
        else:
            act = _bf16r(_bf16r(gate * jax.lax.logistic(gate)) * up)
        return _qmatmul_rows(act, read_dn, sb_d[:nbp_i], sb_d[nbp_i:],
                             bits=bits, bs=bs_i, k=ci)

    if not plan.mlp_manual and not plan.deep:
        M0 = W0 + n_wo

        @pl.when(jnp.logical_and(
                jnp.logical_and(p >= M0, p < M0 + n_mlp), lv))
        def _mlp_phase():
            c_m = p - M0
            term = _mlp_math(
                lambda r0, r1: gw_ref[0, r0:r1, :],
                gsb_ref[0], lambda r0, r1: dw_ref[0, 0, r0:r1, :],
                dsb_ref[0, 0])

            @pl.when(c_m == 0)
            def _():
                acc_scr[...] = term

            @pl.when(c_m > 0)
            def _():
                acc_scr[...] = acc_scr[...] + term

            @pl.when(c_m == n_mlp - 1)
            def _():
                dn_o = _bf16r(acc_scr[...])
                if sandwich:
                    dn_o = _bf16r(_rms(dn_o, postffn_ref[0, 0], eps))
                x = _bf16r(x_scr[...] + dn_o)
                x_scr[...] = x

                @pl.when(l == nl - 1)
                def _():
                    xo_ref[...] = x

    if plan.mlp_manual:
        @pl.when(jnp.logical_and(p == W0 + n_wo - 1, lv))
        def _mlp_block():
            def chunk(c_m, _):
                slot = jax.lax.rem(l * n_mlp + c_m, 2)

                @pl.when(c_m + 1 < n_mlp)
                def _():
                    for dma in mlp_dma(l, c_m + 1, 1 - slot):
                        dma.start()

                @pl.when(jnp.logical_and(c_m + 1 == n_mlp, l + 1 < nl))
                def _():
                    for dma in mlp_dma(l + 1, 0, 1 - slot):
                        dma.start()

                for dma in mlp_dma(l, c_m, slot):
                    dma.wait()

                term = _mlp_math(
                    lambda r0, r1: gu_s[slot, r0:r1, :], gsb_s[slot],
                    lambda r0, r1: dn_s[slot, r0:r1, :], dsb_s[slot])

                @pl.when(c_m == 0)
                def _():
                    acc_scr[...] = term

                @pl.when(c_m > 0)
                def _():
                    acc_scr[...] = acc_scr[...] + term

                return 0

            jax.lax.fori_loop(0, n_mlp, chunk, 0)
            dn_o = _bf16r(acc_scr[...])
            if sandwich:
                dn_o = _bf16r(_rms(dn_o, postffn_ref[0, 0], eps))
            x = _bf16r(x_scr[...] + dn_o)
            x_scr[...] = x

            @pl.when(l == nl - 1)
            def _():
                xo_ref[...] = x

    # ---- DEEP tail: manual wo loop + MLP ring loop in the last KV phase ----
    if plan.deep:
        @pl.when(jnp.logical_and(p == A0 + nkv - 1, lv))
        def _deep_tail():
            # output projection: B-ring wo chunks (unrolled, static)
            for cw in range(n_wo):
                slot = jax.lax.rem(l * RB + cw, S_r)
                nxt = cw + 2
                if nxt < n_wo:
                    for dma in b_dma_wo(l, nxt):
                        dma.start()
                elif nxt - n_wo < min(2, n_mlp):
                    for dma in b_dma_dn(l, nxt - n_wo):
                        dma.start()
                for dma in b_dma_wo(l, cw):
                    dma.wait()
                att = att_scr[cw] if n_wo > 1 else att_scr[0]
                term = _qmatmul_rows(
                    att, lambda r0, r1, slot=slot: b_w[slot, r0:r1, :],
                    b_p[slot][:nbp_bd], b_p[slot][nbp_bd:],
                    bits=bits, bs=bs_h, k=ci)
                if cw == 0:
                    acc_scr[...] = term
                else:
                    acc_scr[...] = acc_scr[...] + term
            o = _bf16r(acc_scr[...])
            if sandwich:
                o = _bf16r(_rms(o, postnorm_ref[0, 0], eps))
            x1 = _bf16r(x_scr[...] + o)
            x_scr[...] = x1
            rn_scr[...] = _rms(
                x1, preffn_ref[0, 0] if sandwich else postnorm_ref[0, 0],
                eps)

            # MLP chunk pairs, both rings at depth 3
            def chunk(c_m, _):
                a_sl = jax.lax.rem(l * RA + n_qkv + c_m, S_r)
                b_sl = jax.lax.rem(l * RB + n_wo + c_m, S_r)
                nxt = c_m + 2

                @pl.when(nxt < n_mlp)
                def _():
                    for dma in a_dma_gu(l, nxt):
                        dma.start()
                    for dma in b_dma_dn(l, nxt):
                        dma.start()

                @pl.when(nxt >= n_mlp)
                def _():
                    j = nxt - n_mlp       # 0 or 1 (n_mlp >= 2 by plan)

                    @pl.when(l + 1 < nl)
                    def _():
                        for jj in range(2):
                            @pl.when(j == jj)
                            def _(jj=jj):
                                a_start_pos01(l + 1, jj)
                                b_start_pos01(l + 1, jj)

                    if fuse_head:
                        @pl.when(l + 1 == nl)
                        def _():
                            for dma in a_dma_head(j):
                                dma.start()

                for dma in a_dma_gu(l, c_m):
                    dma.wait()
                for dma in b_dma_dn(l, c_m):
                    dma.wait()
                term = _mlp_math(
                    lambda r0, r1, a_sl=a_sl: a_w[a_sl, r0:r1, :],
                    a_p[a_sl],
                    lambda r0, r1, b_sl=b_sl: b_w[b_sl, r0:r1, :],
                    b_p[b_sl])

                @pl.when(c_m == 0)
                def _():
                    acc_scr[...] = term

                @pl.when(c_m > 0)
                def _():
                    acc_scr[...] = acc_scr[...] + term

                return 0

            jax.lax.fori_loop(0, n_mlp, chunk, 0)
            dn_o = _bf16r(acc_scr[...])
            if sandwich:
                dn_o = _bf16r(_rms(dn_o, postffn_ref[0, 0], eps))
            x2 = _bf16r(x_scr[...] + dn_o)
            x_scr[...] = x2

            @pl.when(l == nl - 1)
            def _():
                xo_ref[...] = x2

    # ---- fused lm head + greedy argmax (one extra grid step) ---------------
    # The head streams through 2 manually double-buffered VMEM slots inside
    # THIS single step: a revolving-buffer grid phase per vocab chunk would
    # pay the ~2us fixed per-step cost n_chunks times (comparable to the
    # head's entire HBM-ideal read time). Logits are written out chunkwise
    # via async copies; a running (max, argmax) pair lives in VMEM so the
    # greedy token needs no XLA pass over the 150k-logit row afterwards.
    if fuse_head and plan.deep:
        # The head streams through the A ring, continuing from the last
        # layer's gate/up chunks (positions nl*RA + c; chunks 0/1 were
        # started by the last layer's MLP loop). Logits go out through 2
        # manually double-buffered slots; running (max, argmax) in VMEM.
        bnv = plan.bnv
        nbh_d = h // bs_head
        nbh_dp = round_up(nbh_d, 8)

        def d_dma_out(c_i, slot):
            st = pl.multiple_of(jnp.minimum(c_i * bnv, vocab - bnv), 128)
            return pltpu.make_async_copy(
                lo_scr.at[slot], logits_ref.at[:, pl.ds(st, bnv)],
                out_sems.at[slot])

        @pl.when(jnp.logical_and(l_raw == nl, p == 0))
        def _deep_head_phase():
            rn_scr[...] = _rms(x_scr[...], fnorm_ref[0:1, :], eps)
            best_scr[...] = jnp.full((x_scr.shape[0], 128), NEG_INF,
                                     jnp.float32)
            besti_scr[...] = jnp.zeros((x_scr.shape[0], 128), jnp.int32)

            def chunk_body(c_i, _):
                slot = jax.lax.rem(nl * RA + c_i, S_r)

                @pl.when(c_i + 2 < n_chunks)
                def _():
                    for dma in a_dma_head(c_i + 2):
                        dma.start()

                for dma in a_dma_head(c_i):
                    dma.wait()
                st = jnp.minimum(c_i * bnv, vocab - bnv)
                acc = _qmatmul_rows(
                    rn_scr[...],
                    lambda r0, r1, slot=slot: a_w[slot, r0:r1, :],
                    a_p[slot][:nbh_dp], a_p[slot][nbh_dp:2 * nbh_dp],
                    bits=head_bits, bs=bs_head, k=h)

                @pl.when(c_i >= 2)
                def _():
                    d_dma_out(c_i - 2, jax.lax.rem(c_i, 2)).wait()

                lo_scr[jax.lax.rem(c_i, 2)] = acc
                d_dma_out(c_i, jax.lax.rem(c_i, 2)).start()

                b8_ = acc.shape[0]
                m_c = jnp.max(acc, axis=1, keepdims=True)
                col = st + jax.lax.broadcasted_iota(
                    jnp.int32, (b8_, bnv), 1)
                idx_c = jnp.min(
                    jnp.where(acc == m_c, col, jnp.int32(2 ** 30)),
                    axis=1, keepdims=True)
                upd = m_c > best_scr[:, 0:1]
                best_scr[...] = jnp.where(
                    upd, jnp.broadcast_to(m_c, (b8_, 128)), best_scr[...])
                besti_scr[...] = jnp.where(
                    upd, jnp.broadcast_to(idx_c, (b8_, 128)),
                    besti_scr[...])
                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
            for back in (2, 1):
                c_i = n_chunks - back
                if c_i >= 0:
                    d_dma_out(c_i, c_i % 2).wait()
            token_ref[...] = besti_scr[...]

    if fuse_head and not plan.deep:
        bnv = plan.bnv
        nbh = h // bs_head

        def dma_in(c_i, slot):
            st = pl.multiple_of(jnp.minimum(c_i * bnv, vocab - bnv), 128)
            # dst sliced to bnv columns: in slot-reuse mode the gu slots
            # can be wider than the head chunk (width 2*ci vs bnv)
            return (
                pltpu.make_async_copy(
                    hw_ref.at[:, pl.ds(st, bnv)],
                    hw_scr.at[slot, :, pl.ds(0, bnv)],
                    in_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    hsb_ref.at[:, pl.ds(st, bnv)],
                    hsb_scr.at[slot, :, pl.ds(0, bnv)],
                    in_sems.at[slot, 1]),
            )

        def dma_out(c_i, slot):
            st = pl.multiple_of(jnp.minimum(c_i * bnv, vocab - bnv), 128)
            return pltpu.make_async_copy(
                lo_scr.at[slot], logits_ref.at[:, pl.ds(st, bnv)],
                out_sems.at[slot])

        S_h = plan.hslots if not head_reuse else 2

        @pl.when(jnp.logical_and(l_raw == nl, p == 0))
        def _head_phase():
            for c0 in range(min(S_h - 1, n_chunks)):
                for dma in dma_in(c0, c0):
                    dma.start()
            rn_scr[...] = _rms(x_scr[...], fnorm_ref[0:1, :], eps)
            best_scr[...] = jnp.full((x_scr.shape[0], 128), NEG_INF,
                                     jnp.float32)
            besti_scr[...] = jnp.zeros((x_scr.shape[0], 128), jnp.int32)

            def chunk_body(c_i, _):
                slot = jax.lax.rem(c_i, S_h)

                @pl.when(c_i + S_h - 1 < n_chunks)
                def _():
                    nslot = jax.lax.rem(c_i + S_h - 1, S_h)
                    for dma in dma_in(c_i + S_h - 1, nslot):
                        dma.start()

                for dma in dma_in(c_i, slot):
                    dma.wait()
                st = jnp.minimum(c_i * bnv, vocab - bnv)
                nbh_p = round_up(nbh, 8)
                hsb = hsb_scr[slot]
                acc = _qmatmul_rows(
                    rn_scr[...],
                    lambda r0, r1: hw_scr[slot, r0:r1, :bnv],
                    hsb[:nbh_p, :bnv], hsb[nbh_p:, :bnv],
                    bits=head_bits, bs=bs_head, k=h)

                # logits out: the slot's previous DMA (chunk c_i-2) must have
                # drained before overwriting its buffer
                @pl.when(c_i >= 2)
                def _():
                    dma_out(c_i - 2, slot).wait()

                lo_scr[slot] = acc
                dma_out(c_i, slot).start()

                b8_ = acc.shape[0]
                m_c = jnp.max(acc, axis=1, keepdims=True)          # [B8, 1]
                col = st + jax.lax.broadcasted_iota(
                    jnp.int32, (b8_, bnv), 1)
                idx_c = jnp.min(
                    jnp.where(acc == m_c, col, jnp.int32(2 ** 30)),
                    axis=1, keepdims=True)
                upd = m_c > best_scr[:, 0:1]                       # strict >
                best_scr[...] = jnp.where(
                    upd, jnp.broadcast_to(m_c, (b8_, 128)), best_scr[...])
                besti_scr[...] = jnp.where(
                    upd, jnp.broadcast_to(idx_c, (b8_, 128)),
                    besti_scr[...])
                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
            for back in (2, 1):
                c_i = n_chunks - back
                if c_i >= 0:
                    dma_out(c_i, c_i % 2).wait()
            token_ref[...] = besti_scr[...]


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
    head=None,                 # QuantizedLinear [hidden, vocab] to fuse
    final_norm: Optional[jax.Array] = None,  # [hidden] (required with head)
    cos_l: Optional[jax.Array] = None,  # [B, D] gemma3 LOCAL rope phases
    sin_l: Optional[jax.Array] = None,  # (required when config.swa_pattern)
):
    """Run all decoder layers for one decode position in one kernel.

    Returns (x_out [B, H] f32, k_rows [L, B, Hkv, 1, D] f32,
    v_rows, k_sc [L, B, Hkv, 1] | None, v_sc): the caller scatters the rows
    into the cache at each sequence's length. With `head` (gate:
    supports_head), two more trailing results: (logits [B, vocab] f32,
    token [B] int32 greedy argmax) — the final-norm + lm-head GEMV + argmax
    run inside the kernel's last grid step, so a greedy decode step leaves
    the kernel with the next token already chosen.
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
    d_store = k_cache.shape[4]
    if k_cache.dtype == jnp.int8:
        kv_bits = 4 if d_store * 2 == d else 8
    else:
        kv_bits = 16
    quantized = kv_bits < 16
    bits = layers.wqkv.bits
    bs_h = layers.wqkv.block_size
    bs_i = layers.wdown.block_size
    if layers.wo.block_size != bs_h or layers.wgu.block_size != bs_h:
        raise ValueError("megakernel requires uniform hidden-dim block size")
    sm_scale = c.query_scale if c.query_scale else 1.0 / (d ** 0.5)

    @dataclasses.dataclass
    class _CacheView:
        capacity: int
        bits: int

    cview = _CacheView(capacity=s, bits=kv_bits)
    plan0 = _plan(c, layers, cview, b)
    if plan0 is None:
        raise ValueError("megakernel: no VMEM-feasible chunk plan "
                         "(supports() should have gated this config)")
    plan = plan0
    head_reuse = False
    if plan0.deep and head is not None:
        # deep mode: the head streams through the shared A ring when its
        # quant geometry matches the slots (bits, block size, plane dtype);
        # otherwise the caller's separate autotuned head GEMV runs after
        if not (head.bits == bits and head.block_size == bs_h
                and head.scale.dtype == layers.wgu.scale.dtype):
            head = None
    elif head is not None:
        # Prefer DEDICATED head slots (exact-width buffers -> contiguous
        # slot DMAs, measured faster) but only when they fit WITHOUT
        # degrading the layer plan; else REUSE the drained MLP gu slots
        # (costs ~70KB, layer plan identical to plan0); else drop fusion.
        reusable = (head.bits == layers.wqkv.bits
                    and head.block_size == bs_h
                    and head.scale.dtype == layers.wgu.scale.dtype
                    and head.bias.dtype == layers.wgu.bias.dtype)
        plan_d = _plan(c, layers, cview, b, head=head)
        if (plan_d is not None and plan_d.bnv >= 1024
                and plan_d.phases == plan0.phases
                and plan_d.n_mlp == plan0.n_mlp
                and plan_d.mlp_manual == plan0.mlp_manual):
            # dedicated slots need a real chunk width to be worth it —
            # a starved bnv (e.g. 128 -> 2000 DMA rounds on a 256k vocab)
            # costs more in per-chunk overhead than slot reuse saves
            plan = plan_d
        elif reusable:
            plan = _plan(c, layers, cview, b, head=head, head_reuse=True)
            head_reuse = plan is not None and plan.bnv > 0
            if plan is None:
                plan = plan0
                head = None
        else:
            head = None
    fuse_head = head is not None
    if fuse_head and final_norm is None:
        raise ValueError("head fusion requires final_norm")
    n_qkv, nkv, n_wo, n_mlp = plan.n_qkv, plan.nkv, plan.n_wo, plan.n_mlp
    bnq, bkwo, ci, bkv = plan.bnq, plan.bkwo, plan.ci, plan.bkv

    if plan.deep:
        A0 = 1
        W0 = 1 + nkv
    elif plan.fused_attn:
        A0 = W0 = 0          # same grid step as qkv: bodies run in order
    else:
        A0 = n_qkv
        W0 = A0 + nkv
    quantized = kv_bits < 16
    P = plan.phases

    b8 = 8
    xp = jnp.zeros((b8, h), jnp.float32).at[:b].set(x.astype(jnp.float32))
    lens = jnp.zeros((b8,), jnp.int32).at[:b].set(
        jnp.asarray(lengths, jnp.int32))
    if c.swa_pattern and (cos_l is None or sin_l is None):
        raise ValueError("swa_pattern config requires cos_l/sin_l phases")

    def _full_width(a):
        return (jnp.concatenate([a, a], axis=-1)[:, :d]
                if a.shape[-1] * 2 == d else a)

    # rows 0/1: global cos/sin; rows 2/3: gemma3 local-theta cos/sin
    # (zeros when unused — the kernel only reads them under swa_p)
    cs = jnp.zeros((b8, 4, d), jnp.float32)
    cs = cs.at[:b, 0].set(_full_width(cos))
    cs = cs.at[:b, 1].set(_full_width(sin))
    if cos_l is not None:
        cs = cs.at[:b, 2].set(_full_width(cos_l))
        cs = cs.at[:b, 3].set(_full_width(sin_l))

    lay = layers
    has_qkv_bias = lay.wqkv.out_bias is not None
    use_qk_norm = c.qk_norm

    kp8 = bits  # packed rows per 8 logical K rows

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

    # MLP planes feed MANUAL DMAs (not revolving blocks): slice shapes must
    # be 8-row aligned in the sublane dim, so pad the row dims up front
    # (loop-invariant — XLA hoists the pads out of the decode scan)
    nb_h_pad = round_up(h // bs_h, 8)
    nb_ci = ci // bs_i
    nb_ci_pad = round_up(nb_ci, 8)

    def pad_rows(a, rows, dim):
        if a.shape[dim] == rows:
            return a
        widths = [(0, 0)] * a.ndim
        widths[dim] = (0, rows - a.shape[dim])
        return jnp.pad(a, widths)

    if plan.deep:
        # qkv planes stacked scale||bias [L, 2*nb_h_pad, NQ] (A-ring
        # format); wo planes per chunk [L, n_wo, 2*nb_ci_pad, H] (B-ring)
        sq = jnp.concatenate([
            pad_rows(plane(lay.wqkv.scale, h, bs_h), nb_h_pad, 1),
            pad_rows(plane(lay.wqkv.bias.astype(lay.wqkv.scale.dtype),
                           h, bs_h), nb_h_pad, 1),
        ], axis=1)
        bq = jnp.zeros((1, 1, 128), jnp.float32)     # dummy block
        so = jnp.concatenate([
            pad_rows(plane4(lay.wo.scale, dq, bs_h, bkwo), nb_ci_pad, 2),
            pad_rows(plane4(lay.wo.bias.astype(lay.wo.scale.dtype),
                            dq, bs_h, bkwo), nb_ci_pad, 2),
        ], axis=2)
        bo = jnp.zeros((1, 1, 128), jnp.float32)     # dummy block
    else:
        sq = plane(lay.wqkv.scale, h, bs_h)
        bq = plane(lay.wqkv.bias, h, bs_h)
        so = plane4(lay.wo.scale, dq, bs_h, bkwo)
        bo = plane4(lay.wo.bias, dq, bs_h, bkwo)
    pad_manual = plan.mlp_manual or plan.deep
    gr = nb_h_pad if pad_manual else h // bs_h
    dr = nb_ci_pad if pad_manual else nb_ci
    gsb = jnp.concatenate([
        pad_rows(plane(lay.wgu.scale, h, bs_h), gr, 1),
        pad_rows(plane(lay.wgu.bias.astype(lay.wgu.scale.dtype), h, bs_h),
                 gr, 1),
    ], axis=1)                      # [L, 2*rows, 2I] scale||bias
    dsb = jnp.concatenate([
        pad_rows(plane4(lay.wdown.scale, i_dim, bs_i, ci), dr, 2),
        pad_rows(plane4(lay.wdown.bias.astype(lay.wdown.scale.dtype),
                        i_dim, bs_i, ci), dr, 2),
    ], axis=2)                      # [L, n_mlp, 2*rows, H]
    dw4 = lay.wdown.packed.reshape(nl, n_mlp, ci * kp8 // 8, h)
    if has_qkv_bias:
        qkvb = lay.wqkv.out_bias.reshape(nl, 1, nq)
    else:
        qkvb = jnp.zeros((1, 1, nq), jnp.float32)
    innorm = lay.input_norm.reshape(nl, 1, h).astype(jnp.float32)
    postnorm = lay.post_norm.reshape(nl, 1, h).astype(jnp.float32)
    if c.sandwich_norm:
        preffn = lay.pre_ffn_norm.reshape(nl, 1, h).astype(jnp.float32)
        postffn = lay.post_ffn_norm.reshape(nl, 1, h).astype(jnp.float32)
    else:
        preffn = postffn = jnp.ones((1, 1, h), jnp.float32)
    if use_qk_norm:
        qkn = jnp.stack(
            [lay.q_norm, lay.k_norm], axis=1).astype(jnp.float32)  # [L, 2, D]
    else:
        qkn = jnp.ones((1, 2, d), jnp.float32)

    k4 = k_cache.reshape(nl, b * hkv, s, d_store)
    v4 = v_cache.reshape(nl, b * hkv, s, d_store)
    if quantized:
        ks4 = k_scale.reshape(nl, b * hkv, 1, s).astype(jnp.float32)
        vs4 = v_scale.reshape(nl, b * hkv, 1, s).astype(jnp.float32)
    else:
        ks4 = jnp.zeros((1, b * hkv, 1, 128), jnp.float32)
        vs4 = jnp.zeros((1, b * hkv, 1, 128), jnp.float32)

    # ---- staged index maps (fetch one step before the consuming phase) ----
    # 2D grid (layer row, phase): chunked operands clamp their chunk index
    # into the phase range, so the next chunk's DMA is issued during the
    # previous phase and the first chunk of layer l+1 is issued during
    # layer l's last phase. The head row (l_ == nl, fuse_head only) clamps
    # everything (no new layer fetches).
    def _cl(l_):
        return jnp.minimum(l_, nl - 1)

    def at_qkv(l_, p_, L):
        ch = jnp.clip(p_, 0, n_qkv - 1)
        return (_cl(l_), 0, ch)

    def at_qkvb(l_, p_, L):
        return (_cl(l_) if has_qkv_bias else 0, 0, 0)

    def _wo_lc(l_, p_):
        l_ = _cl(l_)
        in_w = jnp.logical_and(p_ >= W0, p_ < W0 + n_wo)
        lw = jnp.where(p_ >= W0, l_, jnp.maximum(l_ - 1, 0))
        ch = jnp.where(in_w, jnp.clip(p_ - W0, 0, n_wo - 1), n_wo - 1)
        return lw, ch

    def at_wo(l_, p_, L):
        lw, ch = _wo_lc(l_, p_)
        return (lw, ch, 0)

    def at_wo_sc(l_, p_, L):
        lw, ch = _wo_lc(l_, p_)
        return (lw, ch, 0, 0)

    M0 = W0 + n_wo   # first revolving MLP phase (non-manual plans)

    def mlp_chunk(l_, p_):
        l_ = _cl(l_)
        in_phase = jnp.logical_and(p_ >= M0, p_ < M0 + n_mlp)
        lw = jnp.where(p_ >= M0, l_, jnp.maximum(l_ - 1, 0))
        ch = jnp.where(in_phase, jnp.clip(p_ - M0, 0, n_mlp - 1), n_mlp - 1)
        return lw, ch

    def at_gu(l_, p_, L):
        lw, ch = mlp_chunk(l_, p_)
        return (lw, 0, ch)

    def at_dn4(l_, p_, L):
        lw, ch = mlp_chunk(l_, p_)
        return (lw, ch, 0, 0)

    def kv_tile(l_, p_):
        l_ = _cl(l_)
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
        return (_cl(l_), 0, 0)

    def at_qkn(l_, p_, L):
        return (_cl(l_) if use_qk_norm else 0, 0, 0)

    def const2(l_, p_, L):
        return (0, 0)

    def const3(l_, p_, L):
        return (0, 0, 0)

    vocab = c.vocab_size
    n_chunks = -(-vocab // plan.bnv) if fuse_head else 0
    kernel = functools.partial(
        _kernel,
        b=b, hkv=hkv, g=g, gp=gp, d=d, h=h, nq=nq, dq=dq, nl=nl,
        plan=plan, bits=bits, bs_h=bs_h, bs_i=bs_i,
        has_qkv_bias=has_qkv_bias, use_qk_norm=use_qk_norm,
        scale=sm_scale, eps=c.rms_norm_eps, kv_bits=kv_bits,
        window=c.sliding_window, sink=c.attention_sink,
        softcap=c.attn_softcap, gelu=c.mlp_act == "gelu_tanh",
        sandwich=c.sandwich_norm, swa_alt=c.swa_every_other, swa_p=c.swa_pattern,
        fuse_head=fuse_head, head_reuse=head_reuse, n_chunks=n_chunks,
        vocab=vocab,
        head_bits=head.bits if fuse_head else 4,
        bs_head=head.block_size if fuse_head else 128,
    )

    nb_h = h // bs_h
    in_specs = ([
        pl.BlockSpec((b8, h), const2),                      # x
        pl.BlockSpec((b8, 4, d), const3),                   # cos/sin
        pl.BlockSpec(memory_space=pltpu.ANY),               # wqkv packed
        pl.BlockSpec(memory_space=pltpu.ANY),               # sqb stacked
        pl.BlockSpec((1, 1, 128), const3),                  # dummy bq
        pl.BlockSpec((1, 1, nq), at_qkvb),                  # qkv out-bias
        pl.BlockSpec(memory_space=pltpu.ANY),               # wo packed
        pl.BlockSpec(memory_space=pltpu.ANY),               # wosb stacked
        pl.BlockSpec((1, 1, 128), const3),                  # dummy bo
    ] if plan.deep else [
        pl.BlockSpec((b8, h), const2),                      # x
        pl.BlockSpec((b8, 4, d), const3),                   # cos/sin
        pl.BlockSpec((1, h * kp8 // 8, bnq), at_qkv),       # wqkv chunk
        pl.BlockSpec((1, nb_h, bnq), at_qkv),               # sq
        pl.BlockSpec((1, nb_h, bnq), at_qkv),               # bq
        pl.BlockSpec((1, 1, nq), at_qkvb),                  # qkv out-bias
        pl.BlockSpec((1, bkwo * kp8 // 8, h), at_wo),       # wo chunk
        pl.BlockSpec((1, 1, bkwo // bs_h, h), at_wo_sc),    # so
        pl.BlockSpec((1, 1, bkwo // bs_h, h), at_wo_sc),    # bo
    ]) + ([
        pl.BlockSpec(memory_space=pltpu.ANY),               # wgu packed
        pl.BlockSpec(memory_space=pltpu.ANY),               # gsb planes
        pl.BlockSpec(memory_space=pltpu.ANY),               # wdown packed 4D
        pl.BlockSpec(memory_space=pltpu.ANY),               # dsb planes
    ] if pad_manual else [
        pl.BlockSpec((1, h * kp8 // 8, 2 * ci), at_gu),     # wgu chunk
        pl.BlockSpec((1, 2 * (h // bs_h), 2 * ci), at_gu),  # gsb chunk
        pl.BlockSpec((1, 1, ci * kp8 // 8, h), at_dn4),     # wdown chunk
        pl.BlockSpec((1, 1, 2 * nb_ci, h), at_dn4),         # dsb chunk
    ]) + [
        pl.BlockSpec((1, 1, h), at_norm),                   # input_norm
        pl.BlockSpec((1, 1, h), at_norm),                   # post_norm
        pl.BlockSpec((1, 1, h),
                     at_norm if c.sandwich_norm else const3),  # pre_ffn
        pl.BlockSpec((1, 1, h),
                     at_norm if c.sandwich_norm else const3),  # post_ffn
        pl.BlockSpec((1, 2, d), at_qkn),                    # qk norms
        pl.BlockSpec((1, b * hkv, bkv, d_store), at_kv),    # k tile
        pl.BlockSpec((1, b * hkv, bkv, d_store), at_kv),    # v tile
        pl.BlockSpec(
            (1, b * hkv, 1, bkv if quantized else 128), at_kv_sc),
        pl.BlockSpec(
            (1, b * hkv, 1, bkv if quantized else 128), at_kv_sc),
    ]

    out_shape = [
        jax.ShapeDtypeStruct((b8, h), jnp.float32),
        jax.ShapeDtypeStruct((nl, b * hkv, 8, d_store), jnp.float32),
        jax.ShapeDtypeStruct((nl, b * hkv, 8, d_store), jnp.float32),
        jax.ShapeDtypeStruct((nl, b * hkv, 8, 128), jnp.float32),
    ]
    def at_l4(l_, p_, L):
        return (_cl(l_), 0, 0, 0)

    row_spec = pl.BlockSpec((1, b * hkv, 8, d_store), at_l4)
    out_specs = [
        pl.BlockSpec((b8, h), const2),
        row_spec, row_spec,
        pl.BlockSpec((1, b * hkv, 8, 128), at_l4),
    ]
    scratch = [
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
    ]
    if plan.deep:
        scratch += [
            # 3-deep shared slot rings: A (qkv/gu/head chunks), B (wo/dn)
            pltpu.VMEM((3, h * kp8 // 8, 2 * ci), jnp.int8),     # A weights
            pltpu.VMEM((3, 2 * nb_h_pad, 2 * ci), lay.wgu.scale.dtype),
            pltpu.VMEM((3, ci * kp8 // 8, h), jnp.int8),         # B weights
            pltpu.VMEM((3, 2 * nb_ci_pad, h), lay.wdown.scale.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),                     # A sems
            pltpu.SemaphoreType.DMA((3, 2)),                     # B sems
        ]
    elif plan.mlp_manual:
        scratch += [
            # MLP manual-DMA double-buffer slots + semaphores
            pltpu.VMEM((2, h * kp8 // 8, 2 * ci), jnp.int8),     # gu slots
            pltpu.VMEM((2, 2 * nb_h_pad, 2 * ci), lay.wgu.scale.dtype),
            pltpu.VMEM((2, ci * kp8 // 8, h), jnp.int8),         # dn slots
            pltpu.VMEM((2, 2 * nb_ci_pad, h), lay.wdown.scale.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ]
    head_args = ()
    if fuse_head:
        nbh = h // head.block_size
        # Mosaic DMA slices must be 8-row aligned in the sublane dim: pad
        # the scale/bias planes to a multiple of 8 rows (loop-invariant —
        # XLA hoists the pad out of the decode scan, so it costs once)
        nbh_pad = round_up(nbh, 8)
        hsb_in = jnp.concatenate([
            pad_rows(head.scale, nbh_pad, 0),
            pad_rows(head.bias.astype(head.scale.dtype), nbh_pad, 0),
        ], axis=0)                  # [2*pad8, V] scale||bias
        in_specs += [
            pl.BlockSpec((1, h), const2),                    # final_norm
            pl.BlockSpec(memory_space=pltpu.ANY),            # head packed
            pl.BlockSpec(memory_space=pltpu.ANY),            # head planes
        ]
        out_shape += [
            jax.ShapeDtypeStruct((b8, vocab), jnp.float32),  # logits
            jax.ShapeDtypeStruct((b8, 128), jnp.int32),      # greedy token
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((b8, 128), const2),
        ]
        dedicated = not head_reuse and not plan.deep
        if dedicated:
            scratch += [
                pltpu.VMEM((plan.hslots, h * head.bits // 8, plan.bnv),
                           jnp.int8),
                pltpu.VMEM((plan.hslots, 2 * nbh_pad, plan.bnv),
                           head.scale.dtype),
            ]
        scratch += [
            pltpu.VMEM((2, b8, plan.bnv), jnp.float32),            # lo slots
            pltpu.VMEM((b8, 128), jnp.float32),                    # best
            pltpu.VMEM((b8, 128), jnp.int32),                      # besti
        ]
        if dedicated:
            scratch += [pltpu.SemaphoreType.DMA((plan.hslots, 2))]
        scratch += [pltpu.SemaphoreType.DMA((2,))]
        head_args = (
            final_norm.astype(jnp.float32).reshape(1, h),
            head.packed, hsb_in,
        )

    two_i = 2 * i_dim
    head_flops = 2 * h * vocab if fuse_head else 0
    head_bytes_ = (h * vocab // (2 if fuse_head and head.bits == 4 else 1)
                   if fuse_head else 0)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nl + (1 if fuse_head else 0), P),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nl * (h * nq + dq * h + h * two_i + i_dim * h)
            + head_flops,
            bytes_accessed=nl * (h * nq + dq * h + h * two_i + i_dim * h)
            * bits // 8 + nl * 2 * b * hkv * s * d + head_bytes_,
            transcendentals=nl * b * hkv * s,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        lens, xp, cs,
        lay.wqkv.packed, sq, bq, qkvb,
        lay.wo.packed, so, bo,
        lay.wgu.packed, gsb,
        dw4, dsb,
        innorm, postnorm, preffn, postffn, qkn,
        k4, v4, ks4, vs4,
        *head_args,
    )

    x_out = outs[0][:b]
    k_rows = outs[1][:, :, 0].reshape(nl, b, hkv, 1, d_store)
    v_rows = outs[2][:, :, 0].reshape(nl, b, hkv, 1, d_store)
    if quantized:
        k_sc = outs[3][:, :, 0, 0].reshape(nl, b, hkv, 1)
        v_sc = outs[3][:, :, 1, 0].reshape(nl, b, hkv, 1)
    else:
        k_sc = v_sc = None
    if fuse_head:
        logits = outs[4][:b]
        token = outs[5][:b, 0]
        return x_out, k_rows, v_rows, k_sc, v_sc, logits, token
    return x_out, k_rows, v_rows, k_sc, v_sc


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
