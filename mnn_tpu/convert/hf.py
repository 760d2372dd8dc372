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
) -> None:
    """Convert + quantize an HF decoder checkpoint (qwen2/qwen3/llama/
    mistral/phi3/gemma2 ...). `hf_config`/`tensors` override the on-disk
    files — used by the GGUF importer to feed decoded tensors in memory."""
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
