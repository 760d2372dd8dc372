"""CLIP text encoder (Stable Diffusion's conditioning model), native JAX.

Equivalent of the reference's diffusion text-encoder Module + CLIP tokenizer
(/root/reference/transformers/diffusion/engine/src/diffusion.cpp text_encoder
stage, /root/reference/transformers/diffusion/engine/src/tokenizer.cpp).
Weights map 1:1 from a HF ``CLIPTextModel`` state dict (openai/clip-vit-*
and the SD `text_encoder/` subfolder share this layout).

Params are a flat dict keyed by the HF state-dict names (minus the
``text_model.`` prefix), with linear weights pre-transposed to [in, out]
— so the checkpoint loader is a pure layout transform, like the rest of
the framework's converters.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.diffusion.nn import attention, layer_norm, linear, t_lin, t_vec


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    act: str = "quick_gelu"
    eos_token_id: int = 49407


def _act(x, kind):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=(kind == "gelu_new"))


def clip_text_forward(params: Dict[str, jax.Array], cfg: ClipTextConfig,
                      input_ids: jax.Array):
    """input_ids [B, T] -> (last_hidden_state [B,T,D], pooled [B,D]).

    Pooled output = final-LN hidden at the first EOS token (HF semantics,
    used by SD for the classifier-free-guidance micro-conditioning in SDXL;
    SD1.5 consumes last_hidden_state).
    """
    b, t = input_ids.shape
    x = params["embeddings.token_embedding.weight"][input_ids]
    x = x + params["embeddings.position_embedding.weight"][None, :t]

    causal = jnp.tril(jnp.ones((t, t), bool))
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}."
        h = layer_norm(x, params[p + "layer_norm1.weight"],
                       params[p + "layer_norm1.bias"])
        q = linear(h, params[p + "self_attn.q_proj.weight"],
                   params[p + "self_attn.q_proj.bias"])
        k = linear(h, params[p + "self_attn.k_proj.weight"],
                   params[p + "self_attn.k_proj.bias"])
        v = linear(h, params[p + "self_attn.v_proj.weight"],
                   params[p + "self_attn.v_proj.bias"])
        o = attention(q, k, v, cfg.num_heads, mask=causal)
        x = x + linear(o, params[p + "self_attn.out_proj.weight"],
                       params[p + "self_attn.out_proj.bias"])
        h = layer_norm(x, params[p + "layer_norm2.weight"],
                       params[p + "layer_norm2.bias"])
        h = _act(linear(h, params[p + "mlp.fc1.weight"],
                        params[p + "mlp.fc1.bias"]), cfg.act)
        x = x + linear(h, params[p + "mlp.fc2.weight"],
                       params[p + "mlp.fc2.bias"])

    x = layer_norm(x, params["final_layer_norm.weight"],
                   params["final_layer_norm.bias"])
    if cfg.eos_token_id == 2:
        # HF legacy pooling for eos_token_id==2 checkpoints (SD1.x text
        # encoders): position of the LARGEST token id, which equals the eos
        # position in the real CLIP vocab where eos is the max id
        eos_pos = jnp.argmax(input_ids, axis=1)
    else:
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                             axis=1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


def from_hf_clip_text(state_dict) -> Dict[str, jax.Array]:
    """Map a HF CLIPTextModel state dict (torch tensors or numpy)."""
    out = {}
    for key, val in state_dict.items():
        arr = np.asarray(val.detach() if hasattr(val, "detach") else val,
                         np.float32)
        key = key.removeprefix("text_model.")
        if key.endswith(".weight") and arr.ndim == 2 and "embedding" not in key:
            out[key] = t_lin(arr)
        else:
            out[key] = t_vec(arr)
    return out


def init_clip_text_params(cfg: ClipTextConfig, key: jax.Array):
    """Random params with the exact key layout of from_hf_clip_text."""
    ks = iter(jax.random.split(key, 16 * cfg.num_layers + 8))

    def rnd(*shape, scale=0.02):
        return (jax.random.normal(next(ks), shape) * scale).astype(jnp.float32)

    d, f = cfg.hidden_size, cfg.intermediate_size
    p = {
        "embeddings.token_embedding.weight": rnd(cfg.vocab_size, d),
        "embeddings.position_embedding.weight": rnd(
            cfg.max_position_embeddings, d),
        "final_layer_norm.weight": jnp.ones((d,)),
        "final_layer_norm.bias": jnp.zeros((d,)),
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}."
        for name in ("layer_norm1", "layer_norm2"):
            p[pre + name + ".weight"] = jnp.ones((d,))
            p[pre + name + ".bias"] = jnp.zeros((d,))
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            p[pre + f"self_attn.{name}.weight"] = rnd(d, d)
            p[pre + f"self_attn.{name}.bias"] = jnp.zeros((d,))
        p[pre + "mlp.fc1.weight"] = rnd(d, f)
        p[pre + "mlp.fc1.bias"] = jnp.zeros((f,))
        p[pre + "mlp.fc2.weight"] = rnd(f, d)
        p[pre + "mlp.fc2.bias"] = jnp.zeros((d,))
    return p
