"""HF checkpoint -> quantized mnn_tpu checkpoint.

Equivalent of the reference's `llmexport.py` (SURVEY.md §2.9:
/root/reference/transformers/llm/export/llmexport.py + utils/model_mapper.py):
reads a local HuggingFace model directory (config.json + *.safetensors),
re-packs weights into the decoder's fused layouts, quantizes with per-block
scales, and writes the self-contained checkpoint directory.

Layout re-packing (must mirror mnn_tpu.models.decoder.LayerParams):
  * wqkv grouped by kv head: [Hkv, (G q-heads | K | V), D] on the output axis;
  * wgu gate/up channel-interleaved: output col 2i = gate_i, 2i+1 = up_i;
  * all weights transposed to [in, out] (HF/torch store [out, in]).
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.models.config import ModelConfig, RuntimeConfig
from mnn_tpu.models.layers import interleave_gate_up
from mnn_tpu.models.decoder import LayerParams, Params
from mnn_tpu.quant.quantize import choose_block_size, quantize


def _load_hf_tensors(model_dir: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {model_dir}")
    out = {}
    for path in files:
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
    return out


def _f32(x: np.ndarray) -> np.ndarray:
    if x.dtype == np.uint16:  # raw bf16 storage
        import ml_dtypes

        x = x.view(ml_dtypes.bfloat16)
    return np.asarray(x, np.float32)


def _awq_transform(
    c: ModelConfig,
    calib_tokens: np.ndarray,      # [B, T] int32
    emb_w: np.ndarray,             # [V, H]
    wqkv_mats, wqkv_biases, wo_mats, wgu_mats, wdown_mats,
    in_norms, post_norms, q_norms, k_norms,
    *,
    bits: int, block_size: int, sym: bool, clip: bool,
    max_rows: int = 512,
) -> None:
    """In-place AWQ pass over the collected float layer mats.

    One sequential float forward over the calibration tokens; at each layer
    the four linear inputs are captured (subsampled to `max_rows` rows),
    quant/awq_search.awq_scale_block searches the scales + clips, and the
    layer's mats/norms are replaced. The folds are float-exact, so the
    forward continues with the ORIGINAL weights and still produces the
    activations the transformed model would see. Capability parity:
    reference utils/awq_quantizer.py:202,470 (independent implementation).
    """
    from mnn_tpu.models.layers import (apply_rope, gu_block_for, rms_norm,
                                       rope_cos_sin, split_gate_up, swiglu)
    from mnn_tpu.quant.awq_search import awq_scale_block

    g = c.num_heads // c.num_kv_heads
    d = c.head_dim
    hkv = c.num_kv_heads
    b, t = calib_tokens.shape
    scale_att = 1.0 / (d ** 0.5)

    # fused-layout index maps (see the layer loop below for the layout)
    stride = (g + 2) * d
    v_cols = np.concatenate(
        [np.arange(h * stride + (g + 1) * d, h * stride + (g + 2) * d)
         for h in range(hkv)])
    blk = gu_block_for(c.intermediate_size)
    up_cols = np.concatenate(
        [np.arange(2 * i * blk + blk, 2 * i * blk + 2 * blk)
         for i in range(c.intermediate_size // blk)])
    # att channel (head i, dim k) reads V column (kv-head i//g, dim k)
    o_groups = np.concatenate(
        [np.arange(d) + (i // g) * d for i in range(c.num_heads)])

    rng = np.random.default_rng(0)

    def sample_rows(a2d):
        n = a2d.shape[0]
        if n <= max_rows:
            return np.asarray(a2d, np.float32)
        idx = rng.choice(n, size=max_rows, replace=False)
        return np.asarray(a2d[idx], np.float32)

    x = jnp.asarray(emb_w, jnp.float32)[calib_tokens]   # [B, T, H]
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    cos, sin = rope_cos_sin(positions, d, c.rope_theta, scaling=c.rope_scaling)
    causal = jnp.tril(jnp.ones((t, t), bool))

    for i in range(len(wqkv_mats)):
        h = rms_norm(x, jnp.asarray(in_norms[i]), c.rms_norm_eps)
        qkv = h @ jnp.asarray(wqkv_mats[i])
        if wqkv_biases[i] is not None:
            qkv = qkv + jnp.asarray(wqkv_biases[i])
        qkv5 = qkv.reshape(b, t, hkv, g + 2, d)
        q = qkv5[..., :g, :].reshape(b, t, c.num_heads, d).transpose(0, 2, 1, 3)
        k = qkv5[..., g, :].transpose(0, 2, 1, 3)
        v = qkv5[..., g + 1, :].transpose(0, 2, 1, 3)
        if q_norms is not None:
            q = rms_norm(q, jnp.asarray(q_norms[i]), c.rms_norm_eps)
            k = rms_norm(k, jnp.asarray(k_norms[i]), c.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kr = jnp.repeat(k, g, axis=1)
        vr = jnp.repeat(v, g, axis=1)
        s = jnp.einsum("bhtd,bhsd->bhts", q, kr) * scale_att
        s = jnp.where(causal[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("bhts,bhsd->bhtd", p, vr)
        att = att.transpose(0, 2, 1, 3).reshape(b, t, c.q_dim)
        o = att @ jnp.asarray(wo_mats[i])
        x = x + o
        h2 = rms_norm(x, jnp.asarray(post_norms[i]), c.rms_norm_eps)
        gu = h2 @ jnp.asarray(wgu_mats[i])
        gate, up = split_gate_up(gu)
        act = swiglu(gate, up)
        dn = act @ jnp.asarray(wdown_mats[i])
        x = x + dn

        acts = {
            "qkv": sample_rows(np.asarray(h).reshape(-1, c.hidden_size)),
            "o": sample_rows(np.asarray(att).reshape(-1, c.q_dim)),
            "gu": sample_rows(np.asarray(h2).reshape(-1, c.hidden_size)),
            "down": sample_rows(
                np.asarray(act).reshape(-1, c.intermediate_size)),
        }
        res = awq_scale_block(
            acts, wqkv_mats[i], wo_mats[i], wgu_mats[i], wdown_mats[i],
            in_norms[i], post_norms[i],
            v_cols=v_cols, up_cols=up_cols,
            qkv_bias=wqkv_biases[i], o_groups=o_groups,
            bits=bits, block_size=block_size, sym=sym, clip=clip,
        )
        wqkv_mats[i] = res.wqkv
        wo_mats[i] = res.wo
        wgu_mats[i] = res.wgu
        wdown_mats[i] = res.wdown
        in_norms[i] = res.input_norm
        post_norms[i] = res.post_norm
        if res.qkv_bias is not None:
            wqkv_biases[i] = res.qkv_bias


def convert_hf(
    model_dir: Optional[str],
    out_dir: str,
    *,
    bits: int = 4,
    block_size: int = 128,
    sym: bool = False,
    tp_shards: int = 1,
    act_bits: int = 16,
    lm_head_bits: int = 8,
    rt: Optional[RuntimeConfig] = None,
    hf_config: Optional[dict] = None,
    tensors: Optional[Dict[str, np.ndarray]] = None,
    awq: bool = False,
    awq_clip: bool = True,
    calib_tokens: Optional[np.ndarray] = None,   # [B, T] int32
) -> None:
    """Convert + quantize an HF decoder checkpoint (qwen2/qwen3/llama/
    mistral/phi3/gemma2 ...). `hf_config`/`tensors` override the on-disk
    files — used by the GGUF importer to feed decoded tensors in memory.

    awq=True: run activation-aware scale search + per-channel clipping
    (quant/awq_search.py; parity with the reference's
    utils/awq_quantizer.py _search_best_scale/apply_clip) on `calib_tokens`
    before quantizing."""
    if hf_config is not None:
        hf_cfg = hf_config
    else:
        with open(os.path.join(model_dir, "config.json")) as f:
            hf_cfg = json.load(f)
    name = (os.path.basename(model_dir.rstrip("/")) if model_dir
            else hf_cfg.get("architectures", ["model"])[0])
    config = ModelConfig.from_hf_config(hf_cfg, name=name)
    t = tensors if tensors is not None else _load_hf_tensors(model_dir)
    c = config
    g = c.num_heads // c.num_kv_heads
    d = c.head_dim

    def get(name):
        if name in t:
            return _f32(t[name])
        # phi-3-style fused projections: qkv_proj / gate_up_proj
        for part, sl in (("q_proj", (0, c.q_dim)),
                         ("k_proj", (c.q_dim, c.q_dim + c.kv_dim)),
                         ("v_proj", (c.q_dim + c.kv_dim,
                                     c.q_dim + 2 * c.kv_dim))):
            if f".{part}." in name:
                fused = name.replace(part, "qkv_proj")
                if fused in t:
                    return _f32(t[fused])[sl[0]: sl[1]]
        for part, half in (("gate_proj", 0), ("up_proj", 1)):
            if f".{part}." in name:
                fused = name.replace(part, "gate_up_proj")
                if fused in t:
                    inter = c.intermediate_size
                    return _f32(t[fused])[half * inter: (half + 1) * inter]
        # AWQ/GPTQ-quantized checkpoint: {base}.qweight/qzeros/scales
        base = name[: -len(".weight")] if name.endswith(".weight") else name
        if base + ".qweight" in t:
            from mnn_tpu.convert.awq import load_awq_weight

            w, _group = load_awq_weight(t, base)  # [in, out] on the AWQ grid
            return w.T.astype(np.float32)  # [out, in] like HF float weights
        raise KeyError(name)

    def maybe(name):
        return _f32(t[name]) if name in t else None

    def quantize_stacked(mats, biases, bs):
        """mats: list of [K, N] per layer -> stacked QuantizedLinear."""
        qs = [
            quantize(m, bits=bits, block_size=bs, sym=sym, act_bits=act_bits)
            for m in mats
        ]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qs)
        if biases[0] is not None:
            stacked = dataclasses.replace(
                stacked, out_bias=jnp.asarray(np.stack(biases), jnp.float32)
            )
        return stacked

    # gemma RMSNorm computes x * (1 + w): bake the offset into the stored
    # weights so the runtime norm stays a single multiply
    norm_off = 1.0 if "gemma" in (hf_cfg.get("architectures") or [""])[0].lower() \
        else 0.0

    def get_norm(name):
        return get(name) + norm_off

    wqkv_mats, wqkv_biases = [], []
    wo_mats, wgu_mats, wdown_mats = [], [], []
    in_norms, post_norms, q_norms, k_norms = [], [], [], []
    pre_ffn_norms, post_ffn_norms = [], []
    routers, wgu_expert_mats, wdown_expert_mats = [], [], []
    wgu_shared_mats, wdown_shared_mats, shared_gates = [], [], []
    for i in range(c.num_layers):
        p = f"model.layers.{i}."
        wq = get(p + "self_attn.q_proj.weight").T  # [H, q_dim]
        wk = get(p + "self_attn.k_proj.weight").T  # [H, kv_dim]
        wv = get(p + "self_attn.v_proj.weight").T
        hidden = wq.shape[0]
        # group by kv head: [H, Hkv, G+2, D]
        wq4 = wq.reshape(hidden, c.num_kv_heads, g, d)
        wk4 = wk.reshape(hidden, c.num_kv_heads, 1, d)
        wv4 = wv.reshape(hidden, c.num_kv_heads, 1, d)
        wqkv = np.concatenate([wq4, wk4, wv4], axis=2).reshape(hidden, -1)
        wqkv_mats.append(wqkv)
        bq = maybe(p + "self_attn.q_proj.bias")
        if bq is not None:
            bk = get(p + "self_attn.k_proj.bias")
            bv = get(p + "self_attn.v_proj.bias")
            b4 = np.concatenate(
                [
                    bq.reshape(c.num_kv_heads, g, d),
                    bk.reshape(c.num_kv_heads, 1, d),
                    bv.reshape(c.num_kv_heads, 1, d),
                ],
                axis=1,
            ).reshape(-1)
            wqkv_biases.append(b4)
        else:
            wqkv_biases.append(None)

        wo_mats.append(get(p + "self_attn.o_proj.weight").T)  # [q_dim, H]
        if c.is_moe:
            routers.append(get(p + "mlp.gate.weight").T)  # [H, E]
            for e in range(c.num_experts):
                ep = p + f"mlp.experts.{e}."
                wg = get(ep + "gate_proj.weight").T
                wu = get(ep + "up_proj.weight").T
                wgu_expert_mats.append(
                    interleave_gate_up(wg, wu))
                wdown_expert_mats.append(get(ep + "down_proj.weight").T)
            if c.shared_expert_intermediate_size:
                sp = p + "mlp.shared_expert."
                wg = get(sp + "gate_proj.weight").T
                wu = get(sp + "up_proj.weight").T
                wgu_shared_mats.append(
                    interleave_gate_up(wg, wu))
                wdown_shared_mats.append(get(sp + "down_proj.weight").T)
                shared_gates.append(
                    get(p + "mlp.shared_expert_gate.weight")[0])  # [H]
        else:
            wg = get(p + "mlp.gate_proj.weight").T  # [H, inter]
            wu = get(p + "mlp.up_proj.weight").T
            wgu_mats.append(interleave_gate_up(wg, wu))
            wdown_mats.append(get(p + "mlp.down_proj.weight").T)  # [inter, H]

        in_norms.append(get_norm(p + "input_layernorm.weight"))
        post_norms.append(get_norm(p + "post_attention_layernorm.weight"))
        if c.sandwich_norm:
            pre_ffn_norms.append(
                get_norm(p + "pre_feedforward_layernorm.weight"))
            post_ffn_norms.append(
                get_norm(p + "post_feedforward_layernorm.weight"))
        if c.qk_norm:
            q_norms.append(get_norm(p + "self_attn.q_norm.weight"))
            k_norms.append(get_norm(p + "self_attn.k_norm.weight"))

    if awq:
        if c.is_moe or c.sandwich_norm:
            raise NotImplementedError(
                "AWQ search currently covers dense pre-norm decoders")
        if calib_tokens is None:
            raise ValueError("awq=True needs calib_tokens [B, T] int32")
        _awq_transform(
            c, np.asarray(calib_tokens, np.int32),
            get("model.embed_tokens.weight"),
            wqkv_mats, wqkv_biases, wo_mats, wgu_mats, wdown_mats,
            in_norms, post_norms,
            q_norms if c.qk_norm else None,
            k_norms if c.qk_norm else None,
            bits=bits, block_size=block_size, sym=sym, clip=awq_clip,
        )

    bs_qkv = choose_block_size(c.hidden_size, block_size)
    bs_wo = choose_block_size(c.q_dim, block_size, tp_shards)
    bs_gu = choose_block_size(c.hidden_size, block_size)

    moe_fields = {}
    if c.is_moe:
        bs_edown = choose_block_size(c.moe_intermediate_size, block_size)
        stacked_gu = quantize_stacked(wgu_expert_mats, [None], bs_gu)
        stacked_down = quantize_stacked(wdown_expert_mats, [None], bs_edown)
        reshape_e = lambda q: jax.tree_util.tree_map(
            lambda a: a.reshape(c.num_layers, c.num_experts, *a.shape[1:]), q)
        moe_fields = dict(
            router=jnp.asarray(np.stack(routers), jnp.float32),
            wgu_e=reshape_e(stacked_gu),
            wdown_e=reshape_e(stacked_down),
        )
        if c.shared_expert_intermediate_size:
            bs_sdown = choose_block_size(
                c.shared_expert_intermediate_size, block_size)
            moe_fields.update(
                wgu_shared=quantize_stacked(wgu_shared_mats, [None], bs_gu),
                wdown_shared=quantize_stacked(
                    wdown_shared_mats, [None], bs_sdown),
                shared_gate=jnp.asarray(np.stack(shared_gates), jnp.float32),
            )
        wgu_q = wdown_q = None
    else:
        bs_down = choose_block_size(c.intermediate_size, block_size, tp_shards)
        wgu_q = quantize_stacked(wgu_mats, [None], bs_gu)
        wdown_q = quantize_stacked(wdown_mats, [None], bs_down)

    layers = LayerParams(
        wqkv=quantize_stacked(wqkv_mats, wqkv_biases, bs_qkv),
        wo=quantize_stacked(wo_mats, [None], bs_wo),
        wgu=wgu_q,
        wdown=wdown_q,
        input_norm=jnp.asarray(np.stack(in_norms), jnp.float32),
        post_norm=jnp.asarray(np.stack(post_norms), jnp.float32),
        q_norm=jnp.asarray(np.stack(q_norms), jnp.float32) if c.qk_norm else None,
        k_norm=jnp.asarray(np.stack(k_norms), jnp.float32) if c.qk_norm else None,
        pre_ffn_norm=jnp.asarray(np.stack(pre_ffn_norms), jnp.float32)
        if c.sandwich_norm else None,
        post_ffn_norm=jnp.asarray(np.stack(post_ffn_norms), jnp.float32)
        if c.sandwich_norm else None,
        **moe_fields,
    )

    emb = jnp.asarray(get("model.embed_tokens.weight"), jnp.bfloat16)
    if c.tie_word_embeddings:
        head_w = get("model.embed_tokens.weight").T  # [hidden, vocab]
    else:
        head_w = get("lm_head.weight").T
    if lm_head_bits in (4, 8):
        # quantized output projection (decode reads it once per token)
        bs_head = choose_block_size(c.hidden_size, block_size)
        lm_head = quantize(head_w, bits=lm_head_bits, block_size=bs_head,
                           sym=sym)
    elif c.tie_word_embeddings:
        lm_head = None
    else:
        lm_head = jnp.asarray(head_w, jnp.bfloat16)
    params = Params(
        embedding=emb,
        final_norm=jnp.asarray(get_norm("model.norm.weight"), jnp.float32),
        lm_head=lm_head,
        layers=layers,
    )

    rt = (rt or RuntimeConfig()).merge(
        quant_bits=bits, quant_block=block_size, quant_sym=sym,
        act_bits=act_bits,
    )
    from mnn_tpu.convert.checkpoint import save_checkpoint

    save_checkpoint(out_dir, config, params, rt, tokenizer_src=model_dir)
