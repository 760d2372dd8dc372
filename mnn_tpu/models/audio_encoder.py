"""Whisper-style audio encoder + multimodal audio splice, native JAX.

Equivalent of the reference's Omni audio path
(/root/reference/transformers/llm/engine/src/omni.cpp — whisper-fbank
features into an audio encoder Module whose embeddings are spliced into
the LLM token stream; feature extraction lives in tools/audio, mirrored
by mnn_tpu.audio.whisper_fbank). The encoder is the standard Whisper
encoder: 2 strided convs over the mel spectrogram, fixed sinusoidal
positions, pre-LN transformer stack. Weights map 1:1 from a HF
``WhisperModel.encoder`` state dict (Qwen2-Audio towers share the layout).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.diffusion.nn import attention, layer_norm, linear, t_lin, t_vec


@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig:
    n_mels: int = 80
    hidden_size: int = 384       # whisper-tiny; base=512, small=768, ...
    num_layers: int = 4
    num_heads: int = 6
    ffn_size: int = 1536
    max_positions: int = 1500    # 30 s at 50 feature/s


def _conv1d(x, w, b, stride=1):
    """x [B, T, Cin], w [k, Cin, Cout] -> [B, T', Cout] (pad 1)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    return (out + b).astype(x.dtype)


def audio_encoder_forward(p: Dict[str, jax.Array], cfg: AudioEncoderConfig,
                          mel: jax.Array) -> jax.Array:
    """mel [B, n_mels, T] (whisper_fbank layout) -> features [B, T//2, D].

    Inputs longer than the positional table (30 s for whisper configs) are
    truncated to max_positions, matching Whisper's 30-second chunking
    contract rather than crashing on the position add.
    """
    if mel.shape[2] > 2 * cfg.max_positions:
        mel = mel[:, :, : 2 * cfg.max_positions]
    x = mel.transpose(0, 2, 1)  # [B, T, n_mels]
    x = jax.nn.gelu(_conv1d(x, p["conv1.weight"], p["conv1.bias"]),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, p["conv2.weight"], p["conv2.bias"], stride=2),
                    approximate=False)
    x = x + p["embed_positions.weight"][None, : x.shape[1]].astype(x.dtype)

    for i in range(cfg.num_layers):
        pre = f"layers.{i}."
        h = layer_norm(x, p[pre + "self_attn_layer_norm.weight"],
                       p[pre + "self_attn_layer_norm.bias"])
        q = linear(h, p[pre + "self_attn.q_proj.weight"],
                   p[pre + "self_attn.q_proj.bias"])
        k = linear(h, p[pre + "self_attn.k_proj.weight"])  # whisper: no k bias
        v = linear(h, p[pre + "self_attn.v_proj.weight"],
                   p[pre + "self_attn.v_proj.bias"])
        o = attention(q, k, v, cfg.num_heads)
        x = x + linear(o, p[pre + "self_attn.out_proj.weight"],
                       p[pre + "self_attn.out_proj.bias"])
        h = layer_norm(x, p[pre + "final_layer_norm.weight"],
                       p[pre + "final_layer_norm.bias"])
        h = jax.nn.gelu(linear(h, p[pre + "fc1.weight"], p[pre + "fc1.bias"]),
                        approximate=False)
        x = x + linear(h, p[pre + "fc2.weight"], p[pre + "fc2.bias"])

    return layer_norm(x, p["layer_norm.weight"], p["layer_norm.bias"])


def from_hf_whisper_encoder(state_dict) -> Dict[str, jax.Array]:
    """Map a HF WhisperModel (or WhisperForConditionalGeneration) encoder."""
    out = {}
    for key, val in state_dict.items():
        if "decoder." in key or key == "proj_out.weight":
            continue
        arr = np.asarray(val.detach() if hasattr(val, "detach") else val,
                         np.float32)
        key = key.removeprefix("model.").removeprefix("encoder.")
        if key.startswith("conv") and arr.ndim == 3:
            # torch Conv1d [out, in, k] -> [k, in, out]
            out[key] = jnp.asarray(np.transpose(arr, (2, 1, 0)), jnp.float32)
        elif key.endswith(".weight") and arr.ndim == 2 and "embed" not in key:
            out[key] = t_lin(arr)
        else:
            out[key] = t_vec(arr)
    return out


def sinusoidal_positions(n_pos: int, dim: int) -> jnp.ndarray:
    """Whisper's fixed sinusoid table (matches HF init for tests)."""
    log_timescale = np.log(10000.0) / (dim // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(dim // 2))
    scaled = np.arange(n_pos)[:, None] * inv[None]
    return jnp.asarray(np.concatenate([np.sin(scaled), np.cos(scaled)], 1),
                       jnp.float32)


def init_audio_encoder_params(cfg: AudioEncoderConfig, key: jax.Array):
    ks = iter(jax.random.split(key, 20 * cfg.num_layers + 8))

    def rnd(*shape, scale=0.02):
        return (jax.random.normal(next(ks), shape) * scale).astype(jnp.float32)

    d, f = cfg.hidden_size, cfg.ffn_size
    p = {
        "conv1.weight": rnd(3, cfg.n_mels, d),
        "conv1.bias": jnp.zeros((d,)),
        "conv2.weight": rnd(3, d, d),
        "conv2.bias": jnp.zeros((d,)),
        "embed_positions.weight": sinusoidal_positions(cfg.max_positions, d),
        "layer_norm.weight": jnp.ones((d,)),
        "layer_norm.bias": jnp.zeros((d,)),
    }
    for i in range(cfg.num_layers):
        pre = f"layers.{i}."
        for name in ("self_attn_layer_norm", "final_layer_norm"):
            p[pre + name + ".weight"] = jnp.ones((d,))
            p[pre + name + ".bias"] = jnp.zeros((d,))
        for name in ("q_proj", "v_proj", "out_proj"):
            p[pre + f"self_attn.{name}.weight"] = rnd(d, d)
            p[pre + f"self_attn.{name}.bias"] = jnp.zeros((d,))
        p[pre + "self_attn.k_proj.weight"] = rnd(d, d)
        p[pre + "fc1.weight"] = rnd(d, f)
        p[pre + "fc1.bias"] = jnp.zeros((f,))
        p[pre + "fc2.weight"] = rnd(f, d)
        p[pre + "fc2.bias"] = jnp.zeros((d,))
    return p
