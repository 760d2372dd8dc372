"""Decoder-only transformer forward pass (Qwen2/2.5, Qwen3, Llama-3 family).

TPU-native replacement for the reference's exported-graph + Module runtime:
where MNN-LLM rebuilds the HF graph with fused custom ops at export time
(/root/reference/transformers/llm/export/utils/mnn_converter.py:400-650) and
executes it through StaticModule/Session (express/module/StaticModule.cpp),
here the model is one jitted function over a pytree of quantized weights:

* all linear projections run through the fused dequant-matmul Pallas kernel,
  with QKV fused into one matmul and gate/up fused into another (the
  reference's converter does the same fusions as graph passes);
* attention runs the prefill flash kernel or the decode kernel against the
  fixed-capacity (optionally int8) KV cache;
* layers are stacked on a leading axis and driven by `lax.scan`, so compile
  time is O(1) in depth;
* two entry shapes (prefill T>1, decode T=1) correspond to the reference's
  prefill/decode module pool (llm.cpp:351-398, switchMode llm.cpp:511).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mnn_tpu.kernels.dequant_matmul import dequant_matmul
from mnn_tpu.kernels.flash_attention import decode_attention, flash_attention
from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.layers import (apply_rope, rms_norm, rope_cos_sin,
                                   rope_cos_sin_mrope, rotate_heads,
                                   split_gate_up, swiglu)
from mnn_tpu.quant.quantize import QuantizedLinear, quantize
from mnn_tpu.runtime import kvcache
from mnn_tpu.runtime.kvcache import KVCache


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerParams:
    """Per-layer weights, stacked on a leading num_layers axis.

    wqkv output layout is grouped BY KV HEAD: [Hkv, G+2, D] flattened, where
    G = H/Hkv query heads, then that group's K row, then its V row. Any TP
    degree dividing Hkv then shards whole (q,k,v) groups contiguously, so
    the same slicing code serves sharded and unsharded execution (a plain
    [Q|K|V] concat would interleave wrongly under contiguous N-sharding).
    """

    wqkv: QuantizedLinear      # [hidden, Hkv * (G+2) * D]
    wo: QuantizedLinear        # [H*D, hidden]
    wgu: Optional[QuantizedLinear]   # [hidden, intermediate*2], columns in
                               # 64-block gate/up interleave (layers.GU_BLOCK;
                               # blocks survive N-sharding and split with
                               # aligned lane slices in the decode
                               # megakernel); None for pure-MoE layers
    wdown: Optional[QuantizedLinear]  # [intermediate, hidden]
    input_norm: jax.Array      # [L, hidden]
    post_norm: jax.Array       # [L, hidden]
    q_norm: Optional[jax.Array]  # [L, head_dim] (qwen3)
    k_norm: Optional[jax.Array]
    # gemma2/3 sandwich norms (post_norm becomes the post-ATTENTION-output
    # norm; these wrap the MLP). None for the qwen/llama families.
    pre_ffn_norm: Optional[jax.Array] = None   # [L, hidden]
    post_ffn_norm: Optional[jax.Array] = None  # [L, hidden]
    # MoE (reference: MoEModule express/module/MoEModule.cpp re-designed as
    # an expert-stacked einsum; SURVEY.md §2.7/§2.11 expert parallel)
    router: Optional[jax.Array] = None        # [L, hidden, E] f32
    wgu_e: Optional[QuantizedLinear] = None   # [L, E, hidden, 2*moe_inter]
    wdown_e: Optional[QuantizedLinear] = None  # [L, E, moe_inter, hidden]
    wgu_shared: Optional[QuantizedLinear] = None   # qwen2-moe shared expert
    wdown_shared: Optional[QuantizedLinear] = None
    shared_gate: Optional[jax.Array] = None   # [L, hidden] sigmoid gate
    # gemma-3n per-layer embeddings (PLE): projection of the token's
    # per-layer embedding row into the residual stream after each layer
    # (reference: DiskEmbedding PLE, diskembedding.hpp:19)
    ple_proj: Optional[jax.Array] = None      # [L, ple_dim, hidden]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Params:
    embedding: jax.Array       # [vocab, hidden] bf16
    final_norm: jax.Array      # [hidden]
    # [hidden, vocab] bf16, a QuantizedLinear (int8/int4 head — the decode
    # output projection is pure weight streaming, so quantizing it is the
    # TPU analog of the reference's DiskEmbedding keeping the matrix out of
    # RAM), or None when tied to the embedding
    lm_head: Optional[jax.Array | QuantizedLinear]
    layers: LayerParams
    # PLE table (gemma-3n): per-token per-layer embedding rows, scale
    # pre-folded at load (omni.cpp ple_embed_scale)
    ple_table: Optional[jax.Array] = None     # [vocab, L, ple_dim]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LoraParams:
    """Low-rank adapters per projection, stacked on the layer axis.

    ≈ the reference's LoRA finetune support (transformers/llm/finetune/):
    y = frozen_quantized(x) + (x @ a) @ b * (alpha / rank). Entries may be
    None to adapt a subset of projections.
    """

    a_qkv: Optional[jax.Array]   # [L, hidden, r]
    b_qkv: Optional[jax.Array]   # [L, r, qkv_n]
    a_o: Optional[jax.Array]
    b_o: Optional[jax.Array]
    a_gu: Optional[jax.Array]
    b_gu: Optional[jax.Array]
    a_down: Optional[jax.Array]
    b_down: Optional[jax.Array]
    scaling: float = dataclasses.field(metadata=dict(static=True), default=1.0)


# Expert capacity = factor * ceil(n*k/E) for the grouped MoE prefill path
# (clamped to n, so small batches are exact). 2.0 keeps drops negligible
# for near-uniform routing while bounding redundant compute at ~2x active.
MOE_CAPACITY_FACTOR = 2.0


def _moe_mlp(c: ModelConfig, h2: jax.Array, lp: LayerParams,
             tp_axis, interpret):
    """Top-k routed expert MLP, experts stacked and scanned.

    Dense-dispatch formulation: every (local) expert processes all tokens,
    masked by the router weight — compute is E/k-fold redundant but every
    shape is static and under expert-parallelism each shard only touches
    its local experts, combining partial sums with one psum (no all_to_all).
    The reference routes tokens to lazily-loaded expert submodules serially
    (MoEModule.cpp:49-90); on TPU static shapes + a reduce win.
    """
    b, t, hidden = h2.shape
    n = b * t
    x = h2.reshape(n, hidden)
    logits = jnp.dot(x.astype(jnp.float32), lp.router,
                     preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, c.num_experts_per_tok)
    if c.norm_topk_prob:
        vals = vals / jnp.maximum(vals.sum(-1, keepdims=True), 1e-9)

    e_local = lp.wgu_e.packed.shape[0]

    # DECODE path (few tokens, unsharded experts): gather ONLY the routed
    # experts' weights. The expert axis rides dequant_matmul's stacked
    # `layer_index` BlockSpec offset, so each of the n*k expert MLPs
    # streams exactly one expert's int4 tiles from HBM — k/E of the
    # dense-dispatch traffic, which is what makes batch-1 MoE decode
    # HBM-proportional to ACTIVE params (the reference's sequential
    # decode routing, MoEModule.cpp:49-61, reached the same way).
    if n <= 8 and tp_axis is None and e_local == c.num_experts:
        k_exp = c.num_experts_per_tok
        flat_e = idx.reshape(-1).astype(jnp.int32)        # [n*k]
        flat_t = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k_exp)
        flat_w = vals.reshape(-1)

        def pair_body(acc, pair):
            ei, ti, wv = pair
            xt = jax.lax.dynamic_slice_in_dim(x, ti, 1, axis=0)   # [1, H]
            gu = dequant_matmul(xt, lp.wgu_e, layer_index=ei,
                                interpret=interpret)
            actv = swiglu(*split_gate_up(gu))
            out = dequant_matmul(actv, lp.wdown_e, layer_index=ei,
                                 interpret=interpret, out_dtype=jnp.float32)
            row = jax.lax.dynamic_slice_in_dim(acc, ti, 1, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, row + out * wv, ti, axis=0), None

        y, _ = jax.lax.scan(
            pair_body, jnp.zeros_like(x, dtype=jnp.float32),
            (flat_e, flat_t, flat_w))
        if lp.wgu_shared is not None:
            gu = dequant_matmul(x, lp.wgu_shared, interpret=interpret)
            actv = swiglu(*split_gate_up(gu))
            out = dequant_matmul(actv, lp.wdown_shared, interpret=interpret,
                                 out_dtype=jnp.float32)
            if lp.shared_gate is not None:
                gate = jax.nn.sigmoid(
                    jnp.dot(x.astype(jnp.float32), lp.shared_gate)[:, None])
                out = out * gate
            y = y + out
        return y.reshape(b, t, hidden)

    # PREFILL path (many tokens, unsharded experts): token-sorted
    # expert-grouped matmuls. Dense dispatch runs every expert over every
    # token (E/k-fold redundant — 15x for qwen1.5-moe, measured 4.0%
    # prefill MFU); here each expert processes only its routed tokens,
    # gathered into a static-capacity buffer (C = capacity_factor * mean
    # load, clamped to n so small batches are drop-free/exact). This is
    # the TPU analog of MoEModule's prefill token bucketing
    # (/root/reference/express/module/MoEModule.cpp:64-90): theirs builds
    # dynamic per-expert batches; XLA needs static shapes, so capacity
    # padding + out-of-range scatter-drop replace the dynamic split.
    if n > 8 and tp_axis is None and e_local == c.num_experts:
        k_exp = c.num_experts_per_tok
        avg = -(-n * k_exp // e_local)
        cap = min(n, max(8, -(-int(MOE_CAPACITY_FACTOR * avg) // 8) * 8))
        flat_e = idx.reshape(-1).astype(jnp.int32)            # [n*k]
        flat_t = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k_exp)
        flat_w = vals.reshape(-1)
        order = jnp.argsort(flat_e)
        se = flat_e[order]
        st = flat_t[order]
        sw = flat_w[order]
        # slot within the expert's capacity bucket; overflow (rank >= cap)
        # maps out of range, which scatter DROPS (standard capacity-factor
        # semantics; cap == n makes drops impossible)
        rank = jnp.arange(n * k_exp, dtype=jnp.int32) - jnp.searchsorted(
            se, se, side="left").astype(jnp.int32)
        slot = jnp.where(rank < cap, se * cap + rank, e_local * cap)
        tok_tab = jnp.full((e_local * cap,), n, jnp.int32).at[slot].set(
            st, mode="drop")
        w_tab = jnp.zeros((e_local * cap,), jnp.float32).at[slot].set(
            sw, mode="drop")
        x_pad = jnp.concatenate(
            [x, jnp.zeros((1, hidden), x.dtype)], axis=0)
        xe = x_pad[tok_tab].reshape(e_local, cap, hidden)
        w_e = w_tab.reshape(e_local, cap)
        t_e = tok_tab.reshape(e_local, cap)

        from mnn_tpu.kernels.common import use_pallas as _use_pallas
        from mnn_tpu.kernels import moe_prefill

        acc0 = jnp.zeros((n + 1, hidden), jnp.float32)  # row n: padding sink
        if (_use_pallas(interpret)
                and moe_prefill.supports(lp.wgu_e, lp.wdown_e, hidden, cap)):
            # one kernel, grid over experts: weights stream via BlockSpec
            # offsets (the lax.scan fallback below dynamic-slices every
            # expert's stack per iteration — measured ~50us/expert of pure
            # overhead, 6.9% MFU)
            ye = moe_prefill.moe_prefill_mlp(
                xe.astype(jnp.bfloat16), w_e, lp.wgu_e, lp.wdown_e,
                interpret=bool(interpret))
            # combine by GATHER (invert the sort permutation): each token
            # reads its k slots and sums — a scatter-add over colliding
            # indices serializes on TPU
            inv = jnp.argsort(order)
            slot_of_a = slot[inv]       # [n*k]; dropped -> e_local*cap
            ye_pad = jnp.concatenate([
                ye.reshape(e_local * cap, hidden),
                jnp.zeros((1, hidden), jnp.float32)], axis=0)
            y = ye_pad[slot_of_a].reshape(n, k_exp, hidden).sum(axis=1)
        else:
            def grouped_body(acc, ex):
                gu_q, down_q, xrows, wrow, toks = ex
                gu = dequant_matmul(xrows, gu_q, interpret=interpret)
                act = swiglu(*split_gate_up(gu))
                out = dequant_matmul(act, down_q, interpret=interpret,
                                     out_dtype=jnp.float32)
                return acc.at[toks].add(out * wrow[:, None]), None

            y, _ = jax.lax.scan(
                grouped_body, acc0, (lp.wgu_e, lp.wdown_e, xe, w_e, t_e))
            y = y[:n]
        if lp.wgu_shared is not None:
            gu = dequant_matmul(x, lp.wgu_shared, interpret=interpret)
            act = swiglu(*split_gate_up(gu))
            out = dequant_matmul(act, lp.wdown_shared, interpret=interpret,
                                 out_dtype=jnp.float32)
            if lp.shared_gate is not None:
                gate = jax.nn.sigmoid(
                    jnp.dot(x.astype(jnp.float32), lp.shared_gate)[:, None])
                out = out * gate
            y = y + out
        return y.reshape(b, t, hidden)

    weights = jnp.zeros((n, c.num_experts), jnp.float32).at[
        jnp.arange(n)[:, None], idx
    ].set(vals)
    if tp_axis is not None and e_local != c.num_experts:
        e0 = jax.lax.axis_index(tp_axis) * e_local
        w_local = jax.lax.dynamic_slice(weights, (0, e0), (n, e_local))
    else:
        w_local = weights[:, :e_local]

    def expert_body(acc, ex):
        gu_q, down_q, wcol = ex
        gu = dequant_matmul(x, gu_q, interpret=interpret)
        act = swiglu(*split_gate_up(gu))
        out = dequant_matmul(act, down_q, interpret=interpret,
                             out_dtype=jnp.float32)
        return acc + out * wcol[:, None], None

    # derive from x so the carry inherits shard_map's varying-axes type;
    # expert weights are tp-sharded so the partial sums additionally vary
    # over the tp axis
    acc0 = jnp.zeros_like(x, dtype=jnp.float32)
    if tp_axis is not None:
        if hasattr(jax.lax, "pvary"):
            acc0 = jax.lax.pvary(acc0, (tp_axis,))
        else:
            acc0 = jax.lax.pcast(acc0, (tp_axis,), to="varying")
    y, _ = jax.lax.scan(expert_body, acc0,
                        (lp.wgu_e, lp.wdown_e, jnp.transpose(w_local)))
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)

    if lp.wgu_shared is not None:
        gu = dequant_matmul(x, lp.wgu_shared, interpret=interpret)
        act = swiglu(*split_gate_up(gu))
        out = dequant_matmul(act, lp.wdown_shared, interpret=interpret,
                             out_dtype=jnp.float32)
        if lp.shared_gate is not None:
            gate = jax.nn.sigmoid(
                jnp.dot(x.astype(jnp.float32), lp.shared_gate)[:, None]
            )
            out = out * gate
        y = y + out
    return y.reshape(b, t, hidden)


def _moe_mlp_fused(c: ModelConfig, h2: jax.Array, layers: "LayerParams",
                   layer_index, interpret) -> jax.Array:
    """Routing in XLA (tiny), all expert GEMVs in ONE Pallas kernel.

    Decode-path replacement for _moe_mlp's scan-of-GEMVs: the scan
    dynamic-slices the whole layer's expert stack per layer and runs each
    routed expert as a separate kernel execution (measured 6.2% of the
    HBM roofline); kernels/moe_decode.py streams only the routed experts
    via scalar-prefetched BlockSpec offsets into the [L*E]-flat stacks.
    """
    from mnn_tpu.kernels.moe_decode import moe_decode_mlp

    b, t, hidden = h2.shape
    n = b * t
    x = h2.reshape(n, hidden)
    router = jax.lax.dynamic_index_in_dim(
        layers.router, layer_index, 0, keepdims=False)
    logits = jnp.dot(x.astype(jnp.float32), router,
                     preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, c.num_experts_per_tok)
    if c.norm_topk_prob:
        vals = vals / jnp.maximum(vals.sum(-1, keepdims=True), 1e-9)
    gate = None
    if layers.shared_gate is not None:
        gw = jax.lax.dynamic_index_in_dim(
            layers.shared_gate, layer_index, 0, keepdims=False)
        gate = jax.nn.sigmoid(jnp.dot(x.astype(jnp.float32), gw))
    y = moe_decode_mlp(x, layers, idx, vals, layer_index, gate,
                       config=c, interpret=bool(interpret))
    return y.reshape(b, t, hidden)


def _gated_act(c: ModelConfig, gu: jax.Array) -> jax.Array:
    """Gated MLP activation: SwiGLU (qwen/llama) or GeGLU-tanh (gemma)."""
    gate, up = split_gate_up(gu)
    if c.mlp_act == "gelu_tanh":
        return jax.nn.gelu(gate.astype(jnp.float32),
                           approximate=True).astype(up.dtype) * up
    return swiglu(gate, up)


def _attention_xla(c: ModelConfig, q, k_cache, v_cache, k_scale, v_scale,
                   kv_len, lengths, window, bits, tree=None,
                   codebook=False):
    """Dense masked attention in plain XLA — the path for configs the
    Pallas kernels don't cover (gemma2 score softcapping, per-layer
    alternating windows). `window` may be traced (scan-carried layer
    index selects it). Per-row lengths: each batch row masks by its own
    pre-append length (continuous batching has ragged slots)."""
    b, h, t, d = q.shape
    if k_cache.dtype == jnp.int8:
        kf = kvcache.dequant_kv(k_cache, k_scale, bits, codebook=codebook)
        vf = kvcache.dequant_kv(v_cache, v_scale, bits, codebook=codebook)
    else:
        kf, vf = k_cache, v_cache
    hkv = kf.shape[1]
    g = h // hkv
    cap = kf.shape[2]
    qg = q.reshape(b, hkv, g, t, d)
    scale = c.query_scale if c.query_scale else d ** -0.5
    s = jnp.einsum("bkgtd,bksd->bkgts", qg.astype(jnp.float32),
                   kf.astype(jnp.float32)) * scale
    if c.attn_softcap:
        s = jnp.tanh(s / c.attn_softcap) * c.attn_softcap
    pos_k = jnp.arange(cap)                             # [cap]
    if tree is not None:
        # token-tree visibility: the t new rows sit at cache offsets
        # start..start+t-1 (append order), but their LOGICAL positions are
        # depths — position-causality cannot separate sibling branches, so
        # node-to-node visibility comes from the explicit ancestor mask.
        depths, tmask = tree
        start = lengths[0]          # tree verify is uniform-start (batch 1)
        rel = pos_k - start                                  # [cap]
        in_new = (rel >= 0) & (rel < t)
        node_vis = tmask[:, jnp.clip(rel, 0, t - 1)]         # [t, cap]
        prefix_vis = jnp.broadcast_to(pos_k[None] < start, (t, cap))
        ok = jnp.where(in_new[None], node_vis, prefix_vis)[None] \
            & (pos_k[None, None] < kv_len[:, None, None])
    else:
        pos_q = lengths[:, None] + jnp.arange(t)[None]      # [b, t]
        causal = (pos_k[None, None] <= pos_q[..., None]) \
            & (pos_k[None, None] < kv_len[:, None, None])   # [b, t, cap]
        win_lo = pos_q[..., None] - window                  # traced ok
        win_ok = (window <= 0) | (pos_k[None, None] > win_lo)
        if c.attention_sink:
            # sink widens the WINDOW only — it must never unmask future or
            # unwritten positions (matches the Pallas kernels' composition)
            win_ok |= pos_k[None, None] < c.attention_sink
        ok = causal & win_ok
    s = jnp.where(ok[:, None, None], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgts,bksd->bkgtd", a, vf.astype(jnp.float32))
    return o.reshape(b, h, t, d).astype(q.dtype)


def _add_lora(y, h, a, b, scaling):
    if a is None:
        return y
    xa = jnp.einsum("btk,kr->btr", h.astype(jnp.float32), a)
    delta = jnp.einsum("btr,rn->btn", xa, b) * scaling
    return y + delta.astype(y.dtype)


def init_random_params(
    config: ModelConfig,
    rng: jax.Array,
    quant_bits: int = 4,
    quant_block: int = 128,
    sym: bool = False,
    scale: float = 0.02,
    tp_shards: int = 1,
    fast: bool = False,
    act_bits: int = 16,
    lm_head_bits: int = 0,
) -> Params:
    """Random quantized weights (bench/tests; real weights come from convert/).

    tp_shards: row-parallel layers (wo, wdown) get a block size that tiles
    each K-partition so TP sharding keeps whole quant blocks.
    fast: generate weights directly in packed form (skips the quantize pass;
    use for large-model benchmarks where only statistics matter).
    """
    c = config
    keys = jax.random.split(rng, 8)

    from mnn_tpu.quant.quantize import choose_block_size

    def ql(key, k_dim, n_dim, with_bias, shards=1):
        bs = choose_block_size(k_dim, quant_block, shards)
        if fast:
            # statistically-equivalent quantized weights, built directly in
            # packed form (quantizing random floats costs minutes of
            # dispatch/compile on the tunnel for zero benefit)
            # one layer of random int8 broadcast across the stack: a
            # full-stack randint holds multi-GB generation transients that
            # OOM the MoE synthetic init on a 16GB chip, and kernel
            # timing is data-independent
            base = jax.random.randint(
                key, (k_dim * quant_bits // 8, n_dim), -128, 128, jnp.int8
            )
            packed = jnp.broadcast_to(
                base, (c.num_layers, k_dim * quant_bits // 8, n_dim))
            qmax = (1 << quant_bits) - 1
            s = jnp.full(
                (c.num_layers, k_dim // bs, n_dim), 2 * scale / qmax, jnp.bfloat16
            )
            stacked = QuantizedLinear(
                packed=packed, scale=s, bias=-s * (qmax / 2), out_bias=None,
                bits=quant_bits, block_size=bs, act_bits=act_bits,
            )
        else:
            w = jax.random.normal(
                key, (c.num_layers, k_dim, n_dim), jnp.float32
            ) * scale
            stacked = jax.vmap(
                lambda wi: quantize(wi, bits=quant_bits, block_size=bs,
                                    sym=sym, act_bits=act_bits)
            )(w)
        if with_bias:
            stacked = dataclasses.replace(
                stacked, out_bias=jnp.zeros((c.num_layers, n_dim), jnp.float32)
            )
        return stacked

    def ql_experts(key, k_dim, n_dim):
        """Stacked [L, E, ...] expert weights (leading axes folded for quantize)."""
        bs = choose_block_size(k_dim, quant_block)
        le = c.num_layers * c.num_experts
        if fast:
            base = jax.random.randint(
                key, (k_dim * quant_bits // 8, n_dim), -128, 128, jnp.int8
            )
            packed = jnp.broadcast_to(
                base, (le, k_dim * quant_bits // 8, n_dim))
            qmax = (1 << quant_bits) - 1
            s = jnp.full((le, k_dim // bs, n_dim), 2 * scale / qmax, jnp.bfloat16)
            stacked = QuantizedLinear(
                packed=packed, scale=s, bias=-s * (qmax / 2), out_bias=None,
                bits=quant_bits, block_size=bs,
            )
        else:
            w = jax.random.normal(key, (le, k_dim, n_dim), jnp.float32) * scale
            stacked = jax.vmap(
                lambda wi: quantize(wi, bits=quant_bits, block_size=bs, sym=sym)
            )(w)
        return jax.tree_util.tree_map(
            lambda a: a.reshape(c.num_layers, c.num_experts, *a.shape[1:]),
            stacked,
        )

    qkv_n = (c.num_heads + 2 * c.num_kv_heads) * c.head_dim
    moe_fields = {}
    if c.is_moe:
        mi = c.moe_intermediate_size
        moe_fields = dict(
            router=jax.random.normal(
                keys[6], (c.num_layers, c.hidden_size, c.num_experts),
                jnp.float32) * scale,
            wgu_e=ql_experts(keys[7], c.hidden_size, 2 * mi),
            wdown_e=ql_experts(
                jax.random.fold_in(keys[7], 1), mi, c.hidden_size),
        )
        si = c.shared_expert_intermediate_size
        if si:
            moe_fields.update(
                wgu_shared=ql(jax.random.fold_in(keys[7], 2),
                              c.hidden_size, 2 * si, False),
                wdown_shared=ql(jax.random.fold_in(keys[7], 3),
                                si, c.hidden_size, False),
                shared_gate=jnp.zeros(
                    (c.num_layers, c.hidden_size), jnp.float32),
            )
    dense = not c.is_moe
    layers = LayerParams(
        wqkv=ql(keys[0], c.hidden_size, qkv_n, c.attention_bias),
        wo=ql(keys[1], c.q_dim, c.hidden_size, False, tp_shards),
        wgu=ql(keys[2], c.hidden_size, 2 * c.intermediate_size, False)
        if dense else None,
        wdown=ql(keys[3], c.intermediate_size, c.hidden_size, False, tp_shards)
        if dense else None,
        input_norm=jnp.ones((c.num_layers, c.hidden_size), jnp.float32),
        post_norm=jnp.ones((c.num_layers, c.hidden_size), jnp.float32),
        q_norm=jnp.ones((c.num_layers, c.head_dim), jnp.float32) if c.qk_norm else None,
        k_norm=jnp.ones((c.num_layers, c.head_dim), jnp.float32) if c.qk_norm else None,
        pre_ffn_norm=jnp.ones((c.num_layers, c.hidden_size), jnp.float32)
        if c.sandwich_norm else None,
        post_ffn_norm=jnp.ones((c.num_layers, c.hidden_size), jnp.float32)
        if c.sandwich_norm else None,
        **moe_fields,
    )
    emb = jax.random.normal(keys[4], (c.vocab_size, c.hidden_size), jnp.bfloat16) * scale
    if lm_head_bits in (2, 3, 4, 8):
        bs_h = choose_block_size(c.hidden_size, quant_block)
        if fast:

            qmax = (1 << lm_head_bits) - 1
            s = jnp.full(
                (c.hidden_size // bs_h, c.vocab_size), 2 * scale / qmax,
                jnp.bfloat16,
            )
            lm_head = QuantizedLinear(
                packed=jax.random.randint(
                    keys[5], (c.hidden_size * lm_head_bits // 8,
                              c.vocab_size),
                    -128, 128, jnp.int8),
                scale=s, bias=-s * (qmax / 2), out_bias=None,
                bits=lm_head_bits, block_size=bs_h,
            )
        else:
            w = jax.random.normal(
                keys[5], (c.hidden_size, c.vocab_size), jnp.float32) * scale
            lm_head = quantize(w, bits=lm_head_bits, block_size=bs_h, sym=sym)
    elif c.tie_word_embeddings:
        lm_head = None
    else:
        lm_head = jax.random.normal(
            keys[5], (c.hidden_size, c.vocab_size), jnp.bfloat16) * scale
    return Params(
        embedding=emb,
        final_norm=jnp.ones((c.hidden_size,), jnp.float32),
        lm_head=lm_head,
        layers=layers,
    )


def _attention(
    config: ModelConfig,
    q: jax.Array,             # [B, H, T, D]
    k_cache, v_cache, k_scale, v_scale,
    kv_len: jax.Array,        # [B] valid length AFTER append
    start: jax.Array,         # [] write offset (= length before append)
    interpret: Optional[bool],
    bits: int = 8,
    codebook: bool = False,
):
    b, h, t, d = q.shape
    if bits == 3 or (bits == 4 and codebook):
        # TQ3/TQ4 codebook storage: unpack once to bf16 and attend on
        # values (the sub-byte layout is for HBM capacity, not kernel
        # reads; the uniform-int4 kernel unpack cannot apply a LUT)
        k_cache = kvcache.dequant_kv(k_cache, k_scale, bits,
                                     codebook=codebook)
        v_cache = kvcache.dequant_kv(v_cache, v_scale, bits,
                                     codebook=codebook)
        k_scale = v_scale = None
        bits = 16
    if t == 1:
        return decode_attention(
            q[:, :, 0], k_cache, v_cache, kv_len,
            k_scale=k_scale, v_scale=v_scale, interpret=interpret,
            window=config.sliding_window, sink=config.attention_sink,
        )[:, :, None]
    if k_cache.dtype == jnp.int8:
        # Prefill reads freshly appended bf16 K/V via their dequantized form:
        # dequantize the whole cache window once (prefill is compute-bound,
        # and XLA fuses the dequant into the attention input pipeline).
        kf = kvcache.dequant_kv(k_cache, k_scale, bits, codebook=codebook)
        vf = kvcache.dequant_kv(v_cache, v_scale, bits, codebook=codebook)
    else:
        kf, vf = k_cache, v_cache
    return flash_attention(
        q, kf, vf, kv_len=kv_len[0], q_offset=start, interpret=interpret,
        window=config.sliding_window, sink=config.attention_sink,
    )


def _forward_unrolled(
    params, c, x, cache, cos, sin, start, kv_len, b, t,
    *, lora, tp_axis, interpret, qkv_split, megakernel=None,
    fuse_head=False, cos_l=None, sin_l=None, deepstack=None, ple_x=None,
):
    """Unrolled layer loop over [L, ...]-stacked weights and KV cache.

    Heavy tensors (quantized weights, KV tiles) are addressed in place by
    the Pallas kernels' `layer_index` (scalar-prefetch BlockSpec offsets);
    only O(hidden)-sized per-layer vectors (norms, biases, LoRA adapters)
    are sliced. The KV cache is updated with in-place
    dynamic-update-slices on the stacked buffers — no per-layer copies, no
    re-stacking, which is what makes batch-1 decode HBM-bandwidth-bound
    rather than copy-bound.
    """
    from mnn_tpu.kernels.common import use_pallas
    from mnn_tpu.kernels.decode_step import fused_decode_attention

    layers = params.layers
    out_f32 = jnp.float32 if tp_axis else jnp.bfloat16
    group = c.num_heads // c.num_kv_heads

    # whole-model megakernel: all layers in ONE pallas_call (see
    # kernels/decode_model.py). Strictly better than the per-layer fused
    # path when eligible — falls through otherwise.
    if megakernel is True and not (
            t == 1 and use_pallas(interpret)
            and lora is None and tp_axis is None):
        raise ValueError(
            "megakernel=True requires t==1, a Pallas backend, no LoRA and "
            "no tp_axis")
    if (megakernel is not False and t == 1 and use_pallas(interpret)
            and lora is None and tp_axis is None
            and deepstack is None and ple_x is None):
        from mnn_tpu.kernels import decode_model

        eligible = decode_model.supports(c, params, cache, b)
        if megakernel is True and not eligible:
            # explicit request must not silently measure the per-layer path
            raise ValueError(
                "megakernel=True but decode_model.supports() rejects this "
                f"(config={c.name}, batch={b}, kv_bits={cache.bits}); use "
                "megakernel=None for auto-fallback")
        if eligible:
            cos_f = jnp.concatenate([cos[:, 0], cos[:, 0]], axis=-1)
            sin_f = jnp.concatenate([sin[:, 0], sin[:, 0]], axis=-1)
            if cos_l is not None:  # gemma3 local-theta phases
                cos_lf = jnp.concatenate([cos_l[:, 0], cos_l[:, 0]], axis=-1)
                sin_lf = jnp.concatenate([sin_l[:, 0], sin_l[:, 0]], axis=-1)
            else:
                cos_lf = sin_lf = None
            head = (params.lm_head
                    if fuse_head and decode_model.supports_head(c, params)
                    else None)
            outs = decode_model.fused_decode_model(
                x[:, 0], layers, cache.k, cache.v, cache.k_scale,
                cache.v_scale, cache.length, cos_f, sin_f, config=c,
                interpret=bool(interpret),
                head=head, final_norm=params.final_norm,
                cos_l=cos_lf, sin_l=sin_lf,
            )
            if len(outs) == 7:
                xh, k_rows, v_rows, k_sc, v_sc, logits, token = outs
            else:
                xh, k_rows, v_rows, k_sc, v_sc = outs
                logits = token = None
            cache = decode_model.scatter_rows(
                cache, k_rows, v_rows, k_sc, v_sc, cache.length
            )
            new_cache = dataclasses.replace(cache, length=kv_len)
            return xh[:, None].astype(x.dtype), new_cache, logits, token

    fused = (t == 1 and use_pallas(interpret)
             and cache.bits not in (3, 4) and not cache.codebook
             and not c.kv_rotate)
    if fused:
        # full-width rope phases for the fused kernel (neox halves tiled 2x)
        cos_f = jnp.concatenate([cos[:, 0], cos[:, 0]], axis=-1)  # [B, D]
        sin_f = jnp.concatenate([sin[:, 0], sin[:, 0]], axis=-1)
        if cos_l is not None:  # gemma3 local-rope phases for sliding layers
            cos_lf = jnp.concatenate([cos_l[:, 0], cos_l[:, 0]], axis=-1)
            sin_lf = jnp.concatenate([sin_l[:, 0], sin_l[:, 0]], axis=-1)

    for i in range(c.num_layers):
        lo = (
            None if lora is None
            else jax.tree_util.tree_map(lambda a: a[i], lora)
        )
        h = rms_norm(x, layers.input_norm[i], c.rms_norm_eps)
        qkv = dequant_matmul(
            h, layers.wqkv, layer_index=i, interpret=interpret
        )
        if lo is not None:
            qkv = _add_lora(qkv, h, lo.a_qkv, lo.b_qkv, lora.scaling)

        # per-layer window/rope are PYTHON-static in the unrolled loop —
        # gemma2 slides on even layers, gemma3 slides everywhere except
        # every swa_pattern-th (global) layer, which also uses the global
        # rope theta (the scan path pays ~3x decode HBM for the same)
        window_i = c.sliding_window
        cos_i, sin_i = (cos_f, sin_f) if fused else (None, None)
        if c.swa_every_other:
            window_i = c.sliding_window if i % 2 == 0 else 0
        elif c.swa_pattern:
            if (i + 1) % c.swa_pattern == 0:
                window_i = 0
            elif fused:
                cos_i, sin_i = cos_lf, sin_lf
        if fused:
            # rope + QK-norm + KV-quantize + attention in one kernel; the
            # grouped projection layout goes in untouched
            qkv_g = qkv.reshape(b, c.num_kv_heads, group + 2, c.head_dim)
            att, k_row, v_row, k_sc, v_sc = fused_decode_attention(
                qkv_g, cache.k, cache.v, cache.k_scale, cache.v_scale,
                i, cache.length, cos_i, sin_i,
                q_norm=layers.q_norm[i] if c.qk_norm else None,
                k_norm=layers.k_norm[i] if c.qk_norm else None,
                eps=c.rms_norm_eps, window=window_i,
                sink=c.attention_sink, softcap=c.attn_softcap,
                sm_scale=c.query_scale if c.query_scale else None,
                interpret=bool(interpret),
            )
            cache = kvcache.scatter_decode_row(
                cache, i, k_row, v_row, k_sc, v_sc, cache.length
            )
            att = att.reshape(b, t, c.q_dim)
        else:
            q, k, v = qkv_split(
                qkv,
                layers.q_norm[i] if c.qk_norm else None,
                layers.k_norm[i] if c.qk_norm else None,
            )
            if t == 1:
                cache = kvcache.append_decode_stacked(
                    cache, i, k, v, cache.length
                )
                if cache.bits == 3 or cache.codebook:
                    # TQ3/TQ4 codebook: unpack this layer to bf16 values
                    kf = kvcache.dequant_kv(cache.k[i], cache.k_scale[i],
                                            cache.bits,
                                            codebook=cache.codebook)
                    vf = kvcache.dequant_kv(cache.v[i], cache.v_scale[i],
                                            cache.bits,
                                            codebook=cache.codebook)
                    att = decode_attention(
                        q[:, :, 0], kf, vf, kv_len, interpret=interpret,
                        window=c.sliding_window, sink=c.attention_sink,
                    )[:, :, None]
                else:
                    att = decode_attention(
                        q[:, :, 0], cache.k, cache.v, kv_len,
                        k_scale=cache.k_scale, v_scale=cache.v_scale,
                        layer_index=i, interpret=interpret,
                        window=c.sliding_window, sink=c.attention_sink,
                    )[:, :, None]
            else:
                cache = kvcache.append_stacked(cache, i, k, v, start)
                att = _attention(
                    c, q, cache.k[i], cache.v[i],
                    None if cache.k_scale is None else cache.k_scale[i],
                    None if cache.v_scale is None else cache.v_scale[i],
                    kv_len, start, interpret, bits=cache.bits,
                    codebook=cache.codebook,
                )
            if c.kv_rotate:
                att = rotate_heads(att, inverse=True)
            att = att.transpose(0, 2, 1, 3).reshape(b, t, c.q_dim)
        o = dequant_matmul(
            att, layers.wo, layer_index=i, interpret=interpret,
            out_dtype=out_f32,
        )
        if lo is not None:
            o = _add_lora(o, att, lo.a_o, lo.b_o, lora.scaling)
        if tp_axis:
            o = jax.lax.psum(o, tp_axis)
        if c.sandwich_norm:  # gemma2/3: post-attention norm on the OUTPUT
            o = rms_norm(o, layers.post_norm[i], c.rms_norm_eps)
        x = x + o.astype(x.dtype)

        h2 = rms_norm(
            x,
            layers.pre_ffn_norm[i] if c.sandwich_norm
            else layers.post_norm[i],
            c.rms_norm_eps,
        )
        if c.is_moe:
            d = _moe_mlp_fused(c, h2, layers, jnp.int32(i), interpret)
        else:
            gu = dequant_matmul(
                h2, layers.wgu, layer_index=i, interpret=interpret
            )
            if lo is not None:
                gu = _add_lora(gu, h2, lo.a_gu, lo.b_gu, lora.scaling)
            act = _gated_act(c, gu)
            d = dequant_matmul(
                act, layers.wdown, layer_index=i, interpret=interpret,
                out_dtype=out_f32,
            )
            if lo is not None:
                d = _add_lora(d, act, lo.a_down, lo.b_down, lora.scaling)
            if tp_axis:
                d = jax.lax.psum(d, tp_axis)
        if c.sandwich_norm:
            d = rms_norm(d, layers.post_ffn_norm[i], c.rms_norm_eps)
        x = x + d.astype(x.dtype)
        if ple_x is not None:
            # gemma-3n PLE: per-layer embedding row -> residual stream
            # (reference: diskembedding.hpp:19, omni.cpp PLE lookup)
            add = jnp.dot(ple_x[:, :, i].astype(jnp.float32),
                          layers.ple_proj[i].astype(jnp.float32),
                          preferred_element_type=jnp.float32)
            x = x + add.astype(x.dtype)
        if deepstack is not None and i < deepstack.shape[0]:
            # qwen3-VL deepstack: ViT level-i features spliced into the
            # hidden states after layer i (reference: omni.hpp:150-183,
            # omni.cpp deepstack embeddings)
            x = x + deepstack[i].astype(x.dtype)

    new_cache = dataclasses.replace(cache, length=kv_len)
    return x, new_cache, None, None


@functools.partial(
    jax.jit,
    static_argnames=("config", "all_logits", "interpret", "tp_axis",
                     "return_hidden", "layer_scan", "megakernel",
                     "return_token"),
)
def forward(
    params: Params,
    config: ModelConfig,
    tokens: jax.Array,        # [B, T] int32
    cache: KVCache,
    *,
    all_logits: bool = False,
    interpret: Optional[bool] = None,
    tp_axis: Optional[str] = None,
    lora: Optional["LoraParams"] = None,
    inputs_embeds: Optional[jax.Array] = None,  # [B, T, hidden] (multimodal)
    position_ids: Optional[jax.Array] = None,   # [B, T, 3] mrope (t, h, w)
    return_hidden: bool = False,  # pipeline stages: skip the head
    layer_scan: Optional[bool] = None,  # None = auto (scan only for MoE)
    megakernel: Optional[bool] = None,  # None = auto; False = force per-layer
    return_token: bool = False,  # also return the greedy next token
    tree: Optional[tuple] = None,  # (depths [T] i32, mask [T, T] bool):
                                   # token-tree verify (EAGLE); see below
    deepstack: Optional[jax.Array] = None,  # [levels, B, T, hidden]:
                                   # qwen3-VL multi-level ViT features
                                   # added after layers 0..levels-1
) -> Tuple[jax.Array, KVCache]:
    """Run the model over `tokens`, appending T positions to the cache.

    Returns (logits [B, V] or [B, T, V], updated cache); with
    `return_token=True`, ((logits, greedy_token [B] int32), cache) — on the
    megakernel decode path the final-norm, lm-head GEMV, and argmax run
    INSIDE the kernel's last grid step (decode_model.supports_head), so a
    greedy decode loop has no XLA pass over the vocab-sized logit row.

    Layer iteration has two modes. The default (dense models) unrolls the
    layer loop and reads each layer's weights and KV tiles IN PLACE from the
    [L, ...]-stacked HBM buffers (kernel `layer_index` offsets) — a lax.scan
    over stacked weights would materialize a dynamic-slice copy of every
    layer's weights every step, which measures as ~3x decode HBM traffic on
    chip. `layer_scan=True` (forced for MoE, whose expert stacks the scan
    already streams) keeps the O(1)-compile-time scan body.

    Tensor parallelism (inside shard_map): when `tp_axis` names a mesh axis,
    this function sees the LOCAL shard of every weight — attention heads and
    MLP intermediate are output-sharded, `wo`/`wdown` are input-sharded — and
    inserts the two reduce collectives (psum after attention out-proj and
    after MLP down-proj), the standard Megatron-style cut re-expressed with
    jax collectives over ICI (SURVEY.md §2.11: the distributed layer the
    single-device reference lacks).
    """
    c = config
    b, t = tokens.shape
    # gemma configs run the scan path: per-layer alternating windows,
    # score softcaps, and sandwich norms aren't wired into the unrolled
    # in-place kernels (yet) — the scan body below handles every config
    gemma_like = (c.sandwich_norm or c.mlp_act != "silu"
                  or c.attn_softcap > 0 or c.swa_every_other
                  or c.swa_pattern > 0)
    if layer_scan is None:
        from mnn_tpu.kernels.common import use_pallas

        moe_fast = False
        if c.is_moe and t == 1 and not gemma_like and tree is None:
            from mnn_tpu.kernels import moe_decode

            moe_fast = (
                use_pallas(interpret) and tp_axis is None and lora is None
                and params.layers.wgu_e is not None
                and params.layers.wgu_e.packed.shape[1] == c.num_experts
                and moe_decode.supports(c, params.layers, b)
            )
        # gemma-family decode: the unrolled per-layer path handles
        # softcap / sandwich norms / gelu / alternating + N:1 windows /
        # dual rope with PYTHON-static per-layer parameters, reading
        # weights in place (the scan path pays ~3x decode HBM traffic).
        # Requires the fused decode-attention kernel (softcap lives there).
        gemma_fast = (
            gemma_like and t == 1 and not c.is_moe and tree is None
            and use_pallas(interpret) and tp_axis is None and lora is None
            and cache.bits not in (3, 4) and not cache.codebook
            and not c.kv_rotate
        )
        layer_scan = ((c.is_moe and not moe_fast)
                      or (gemma_like and not gemma_fast)
                      or tree is not None)
        if deepstack is not None or params.ple_table is not None:
            layer_scan = False   # per-layer splices live on the unrolled path
    if tree is not None and not layer_scan:
        raise ValueError("tree verify requires the layer-scan path")
    if inputs_embeds is not None:
        x = inputs_embeds.astype(params.embedding.dtype)
    else:
        x = params.embedding[tokens]  # [B, T, hidden]
    if c.embed_scale:  # gemma: normalizer cast to activation dtype (HF)
        x = x * jnp.asarray(c.hidden_size ** 0.5, x.dtype)
    start = cache.length[0]       # uniform write offset (prefill)
    if tree is not None:
        # token-tree verify (EAGLE): rope positions come from each node's
        # DEPTH in the tree, not its append offset; attention visibility is
        # the ancestor mask (reference tokentree.hpp retrieve/verify).
        if c.sliding_window or c.swa_every_other or c.attention_sink:
            raise NotImplementedError(
                "tree verify not supported with windowed attention")
        positions = cache.length[:, None] + tree[0][None]
    else:
        positions = cache.length[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    if position_ids is not None and c.mrope_section is not None:
        cos, sin = rope_cos_sin_mrope(position_ids, c.head_dim, c.rope_theta,
                                      c.mrope_section)
    else:
        cos, sin = rope_cos_sin(positions, c.head_dim, c.rope_theta,
                                scaling=c.rope_scaling)
    kv_len = jnp.minimum(cache.length + t, cache.capacity)

    # gemma3 dual rope: local (sliding) layers rotate with
    # rope_local_theta and no long-context scaling; global layers with
    # rope_theta (+ linear scaling) — selected per layer in layer_step
    if c.swa_pattern:
        cos_l, sin_l = rope_cos_sin(positions, c.head_dim,
                                    c.rope_local_theta)
    else:
        cos_l = sin_l = None

    q_dim, kv_dim = c.q_dim, c.kv_dim

    def qkv_split(qkv, q_norm, k_norm, cos_in=None, sin_in=None):
        cos_i = cos_in if cos_in is not None else cos
        sin_i = sin_in if sin_in is not None else sin
        g = c.num_heads // c.num_kv_heads
        qkv = qkv.reshape(b, t, c.num_kv_heads, g + 2, c.head_dim)
        q = qkv[..., :g, :].reshape(b, t, c.num_heads, c.head_dim)
        q = q.transpose(0, 2, 1, 3)                 # [B, H, T, D]
        k = qkv[..., g, :].transpose(0, 2, 1, 3)    # [B, Hkv, T, D]
        v = qkv[..., g + 1, :].transpose(0, 2, 1, 3)
        if c.qk_norm:
            q = rms_norm(q, q_norm, c.rms_norm_eps)
            k = rms_norm(k, k_norm, c.rms_norm_eps)
        q = apply_rope(q, cos_i, sin_i)
        k = apply_rope(k, cos_i, sin_i)
        if c.kv_rotate:
            # TurboQuant-style WHT: scores invariant, outliers flattened
            q, k, v = rotate_heads(q), rotate_heads(k), rotate_heads(v)
        return q, k, v

    def layer_step(x, layer):
        if lora is not None:
            li, lp, k_c, v_c, ks_c, vs_c, lo = layer
        else:
            li, lp, k_c, v_c, ks_c, vs_c = layer
            lo = None
        h = rms_norm(x, lp.input_norm, c.rms_norm_eps)
        qkv = dequant_matmul(h, lp.wqkv, interpret=interpret)
        if lo is not None:
            qkv = _add_lora(qkv, h, lo.a_qkv, lo.b_qkv, lo.scaling)
        if c.swa_pattern:
            is_global = (li + 1) % c.swa_pattern == 0
            q, k, v = qkv_split(qkv, lp.q_norm, lp.k_norm,
                                jnp.where(is_global, cos, cos_l),
                                jnp.where(is_global, sin, sin_l))
        else:
            q, k, v = qkv_split(qkv, lp.q_norm, lp.k_norm)

        if t == 1:
            # decode: each slot writes at its own offset (continuous batching)
            k_c, v_c, ks_c, vs_c = kvcache.append_decode_layer(
                k_c, v_c, ks_c, vs_c, k, v, cache.length, bits=cache.bits,
                codebook=cache.codebook,
            )
        else:
            k_c, v_c, ks_c, vs_c = kvcache.append_layer(
                k_c, v_c, ks_c, vs_c, k, v, start, bits=cache.bits,
                codebook=cache.codebook,
            )
        if tree is not None:
            att = _attention_xla(c, q, k_c, v_c, ks_c, vs_c, kv_len,
                                 cache.length, 0, cache.bits, tree=tree,
                                 codebook=cache.codebook)
        elif gemma_like:
            # per-layer window: gemma2 slides on even layers only; gemma3
            # slides everywhere except every swa_pattern-th (global) layer
            window = c.sliding_window
            if c.swa_every_other:
                window = jnp.where(li % 2 == 0, c.sliding_window, 0)
            if c.swa_pattern:
                window = jnp.where((li + 1) % c.swa_pattern == 0, 0,
                                   c.sliding_window)
            att = _attention_xla(c, q, k_c, v_c, ks_c, vs_c, kv_len,
                                 cache.length, window, cache.bits,
                                 codebook=cache.codebook)
        else:
            att = _attention(c, q, k_c, v_c, ks_c, vs_c, kv_len, start,
                             interpret, bits=cache.bits,
                             codebook=cache.codebook)
        if c.kv_rotate:
            att = rotate_heads(att, inverse=True)
        att = att.transpose(0, 2, 1, 3).reshape(b, t, q_dim)
        o = dequant_matmul(
            att, lp.wo, interpret=interpret,
            out_dtype=jnp.float32 if tp_axis else jnp.bfloat16,
        )
        if lo is not None:
            o = _add_lora(o, att, lo.a_o, lo.b_o, lo.scaling)
        if tp_axis:
            o = jax.lax.psum(o, tp_axis)
        if c.sandwich_norm:  # gemma2: post-attention norm on the OUTPUT
            o = rms_norm(o, lp.post_norm, c.rms_norm_eps)
        x = x + o.astype(x.dtype)

        h2 = rms_norm(x, lp.pre_ffn_norm if c.sandwich_norm else lp.post_norm,
                      c.rms_norm_eps)
        if c.is_moe and lp.router is not None:
            d = _moe_mlp(c, h2, lp, tp_axis, interpret)
        else:
            gu = dequant_matmul(h2, lp.wgu, interpret=interpret)
            if lo is not None:
                gu = _add_lora(gu, h2, lo.a_gu, lo.b_gu, lo.scaling)
            act = _gated_act(c, gu)
            d = dequant_matmul(
                act, lp.wdown, interpret=interpret,
                out_dtype=jnp.float32 if tp_axis else jnp.bfloat16,
            )
            if lo is not None:
                d = _add_lora(d, act, lo.a_down, lo.b_down, lo.scaling)
            if tp_axis:
                d = jax.lax.psum(d, tp_axis)
        if c.sandwich_norm:
            d = rms_norm(d, lp.post_ffn_norm, c.rms_norm_eps)
        x = x + d.astype(x.dtype)
        return x, (k_c, v_c, ks_c, vs_c)

    if layer_scan:
        def scan_body(x, layer):
            x, updated = layer_step(x, layer)
            return x, updated

        xs = (jnp.arange(c.num_layers, dtype=jnp.int32), params.layers,
              cache.k, cache.v, cache.k_scale, cache.v_scale)
        if lora is not None:
            xs = xs + (lora,)
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(scan_body, x, xs)
        new_cache = KVCache(
            k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new, length=kv_len,
            bits=cache.bits, codebook=cache.codebook,
        )
    else:
        ple_x = (params.ple_table[tokens]
                 if params.ple_table is not None else None)  # [B,T,L,dim]
        x, new_cache, fused_logits, fused_token = _forward_unrolled(
            params, c, x, cache, cos, sin, start, kv_len, b, t,
            lora=lora, tp_axis=tp_axis, interpret=interpret,
            qkv_split=qkv_split, megakernel=megakernel,
            fuse_head=not return_hidden, cos_l=cos_l, sin_l=sin_l,
            deepstack=deepstack, ple_x=ple_x,
        )
        if fused_logits is not None and not return_hidden:
            if c.final_softcap:
                # tanh cap is monotone, so the in-kernel argmax token is
                # already correct; only the logit VALUES need capping
                fused_logits = (jnp.tanh(fused_logits / c.final_softcap)
                                * c.final_softcap)
            logits = fused_logits[:, None] if all_logits else fused_logits
            if return_token:
                return (logits, fused_token), new_cache
            return logits, new_cache

    if return_hidden:
        return x, new_cache

    x = rms_norm(x, params.final_norm, c.rms_norm_eps)
    if not all_logits:
        x = x[:, -1]  # logits_index = -1 (reference llm.cpp io names)
    logits = head_logits(params, x, interpret=interpret, tp_axis=tp_axis)
    if c.final_softcap:  # gemma2 logit softcapping
        logits = (jnp.tanh(logits.astype(jnp.float32) / c.final_softcap)
                  * c.final_softcap).astype(logits.dtype)
    if return_token:
        tok_logits = logits[:, -1] if all_logits else logits
        token = jnp.argmax(tok_logits, axis=-1).astype(jnp.int32)
        return (logits, token), new_cache
    return logits, new_cache


def head_logits(
    params: Params,
    x: jax.Array,             # [..., hidden] already final-norm'd
    *,
    interpret: Optional[bool] = None,
    tp_axis: Optional[str] = None,
) -> jax.Array:
    """Project hidden states through the (possibly quantized) lm head.

    Factored out of `forward` so draft models (EAGLE / MTP heads, reference:
    transformers/llm/engine/src/speculative_decoding/generate.hpp:29-105)
    can reuse the target's output head on their own hidden states."""
    if isinstance(params.lm_head, QuantizedLinear):
        logits = dequant_matmul(
            x, params.lm_head, out_dtype=jnp.float32, interpret=interpret
        )
    else:
        head = params.embedding.T if params.lm_head is None else params.lm_head
        logits = jnp.dot(
            x.astype(jnp.bfloat16), head.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if tp_axis and params.lm_head is not None:
        # vocab-sharded head: gather the full logit row for sampling
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits
