"""LoRA adapters for the quantized decoder.

≈ the reference's LoRA finetune (transformers/llm/finetune/) rebuilt the
jax way: the base model stays frozen in packed int4/int8; adapters are the
only trainable pytree; `merge_lora` folds trained adapters back into the
quantized weights (dequantize + add + requantize — the analog of the
reference's extract-for-infer step, tools/train/source/exec/extractForInfer.cpp).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import LoraParams, Params
from mnn_tpu.quant.quantize import QuantizedLinear, dequantize, quantize


def init_lora(
    config: ModelConfig,
    rng: jax.Array,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Sequence[str] = ("qkv", "o", "gu", "down"),
) -> LoraParams:
    c = config
    qkv_n = (c.num_heads + 2 * c.num_kv_heads) * c.head_dim
    dims = {
        "qkv": (c.hidden_size, qkv_n),
        "o": (c.q_dim, c.hidden_size),
        "gu": (c.hidden_size, 2 * c.intermediate_size),
        "down": (c.intermediate_size, c.hidden_size),
    }
    keys = jax.random.split(rng, len(dims))
    fields = {}
    for key, (name, (k_dim, n_dim)) in zip(keys, dims.items()):
        if name in targets:
            # A ~ N(0, 1/r), B = 0 (standard LoRA init: delta starts at 0)
            fields["a_" + name] = jax.random.normal(
                key, (c.num_layers, k_dim, rank), jnp.float32
            ) / (rank ** 0.5)
            fields["b_" + name] = jnp.zeros(
                (c.num_layers, rank, n_dim), jnp.float32
            )
        else:
            fields["a_" + name] = None
            fields["b_" + name] = None
    return LoraParams(scaling=alpha / rank, **fields)


def _merge_one(ql: QuantizedLinear, a, b, scaling) -> QuantizedLinear:
    if a is None:
        return ql

    def merge_layer(ql_l, a_l, b_l):
        w = dequantize(ql_l, dtype=jnp.float32)
        w = w + (a_l @ b_l) * scaling
        out = quantize(w, bits=ql.bits, block_size=ql.block_size)
        return dataclasses.replace(out, out_bias=ql_l.out_bias)

    return jax.vmap(merge_layer)(ql, a, b)


def merge_lora(params: Params, lora: LoraParams) -> Params:
    """Fold adapters into the packed weights (requantized)."""
    lp = params.layers
    new_layers = dataclasses.replace(
        lp,
        wqkv=_merge_one(lp.wqkv, lora.a_qkv, lora.b_qkv, lora.scaling),
        wo=_merge_one(lp.wo, lora.a_o, lora.b_o, lora.scaling),
        wgu=_merge_one(lp.wgu, lora.a_gu, lora.b_gu, lora.scaling),
        wdown=_merge_one(lp.wdown, lora.a_down, lora.b_down, lora.scaling),
    )
    return dataclasses.replace(params, layers=new_layers)
