"""BigVGAN-style neural vocoder (mel -> waveform), native JAX.

Equivalent of the reference's token2wav vocoder stage
(/root/reference/transformers/llm/export/utils/token2wav.py — the BigVGAN
generator the Talker's DiT mel output is rendered with;
/root/reference/transformers/llm/engine/src/omni.cpp `Talker::token2wav`).

Architecture (BigVGAN / HiFi-GAN generator family): conv_pre → per-stage
[transposed-conv upsample → multi-receptive-field AMP blocks with snake
activations, averaged] → snake → conv_post → tanh. Params are a flat dict
keyed by the public BigVGAN state-dict names; weight-normalized
checkpoints (weight_g/weight_v) are fused at load. The anti-aliased
up/down FIR pair around each activation is optional (`use_aa_filters`) —
the filters are fixed kaiser-sinc kernels computed here, not weights.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    n_mels: int = 80
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    snake_logscale: bool = True
    use_aa_filters: bool = False

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsample_rates))

    @staticmethod
    def tiny():
        return VocoderConfig(n_mels=8, upsample_rates=(4, 2),
                             upsample_kernel_sizes=(8, 4),
                             upsample_initial_channel=16,
                             resblock_kernel_sizes=(3,),
                             resblock_dilations=((1, 3),))


def _conv1d(x, w, b=None, stride=1, pad=0, dilation=1, groups=1):
    """x [B, C, T] (torch layout), w [k, I, O]."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=("NCW", "WIO", "NCW"),
        feature_group_count=groups, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b[None, :, None]
    return out.astype(x.dtype)


def _conv_transpose1d(x, w, b, stride, pad):
    """torch ConvTranspose1d semantics, expressed exactly as a forward
    conv over the stride-dilated input with a flipped kernel (out length
    (t-1)*stride - 2*pad + k). w [k, O, I] (mapped from torch [I, O, k])."""
    k = w.shape[0]
    w_fwd = jnp.flip(w, 0).transpose(0, 2, 1)  # -> [k, I, O]
    out = jax.lax.conv_general_dilated(
        x, w_fwd, window_strides=(1,),
        padding=((k - 1 - pad, k - 1 - pad),), lhs_dilation=(stride,),
        dimension_numbers=("NCW", "WIO", "NCW"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b[None, :, None]
    return out.astype(x.dtype)


def _snake(x, alpha, logscale):
    """Snake activation: x + sin^2(a·x)/a (per channel)."""
    a = jnp.exp(alpha) if logscale else alpha
    a = a[None, :, None]
    xf = x.astype(jnp.float32)
    return (xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)).astype(x.dtype)


def _kaiser_sinc_filter(cutoff: float, half_width: float, taps: int):
    """Fixed low-pass FIR (matches BigVGAN's alias-free activation pair)."""
    even = taps % 2 == 0
    delta_f = 4 * half_width
    att = 2.285 * (taps // 2) * math.pi * delta_f + 7.95
    if att > 50.0:
        beta = 0.1102 * (att - 8.7)
    elif att >= 21.0:
        beta = 0.5842 * (att - 21) ** 0.4 + 0.07886 * (att - 21.0)
    else:
        beta = 0.0
    win = np.kaiser(taps, beta)
    if even:
        t = np.arange(-taps // 2, taps // 2) + 0.5
    else:
        t = np.arange(taps) - (taps - 1) // 2
    f = 2 * cutoff * win * np.sinc(2 * cutoff * t)
    f = f / f.sum()
    return f.astype(np.float32)


def _aa_activation(x, alpha, logscale):
    """Anti-aliased snake: 2x FIR upsample -> snake -> FIR downsample."""
    c = x.shape[1]
    up = _kaiser_sinc_filter(0.5 / 2, 0.6 / 2, 12)
    k = jnp.asarray(np.tile(up[:, None, None], (1, 1, 1)))
    # zero-stuff 2x then filter (per channel)
    b, _, t = x.shape
    xz = jnp.zeros((b, c, t * 2), x.dtype).at[:, :, ::2].set(x)
    kc = jnp.broadcast_to(k, (12, 1, c))
    h = _conv1d(xz, kc * 2.0, pad=6, groups=c)[..., :t * 2]
    h = _snake(h, alpha, logscale)
    h = _conv1d(h, kc, pad=6, groups=c)[..., : t * 2]
    return h[:, :, ::2]


def _act(x, alpha, cfg: VocoderConfig):
    if cfg.use_aa_filters:
        return _aa_activation(x, alpha, cfg.snake_logscale)
    return _snake(x, alpha, cfg.snake_logscale)


def vocoder_forward(p: Dict[str, jax.Array], cfg: VocoderConfig,
                    mel: jax.Array) -> jax.Array:
    """mel [B, n_mels, T] -> waveform [B, T * hop_length] in [-1, 1]."""
    x = _conv1d(mel, p["conv_pre.weight"], p["conv_pre.bias"], pad=3)
    n_res = len(cfg.resblock_kernel_sizes)
    for i, (rate, ksz) in enumerate(zip(cfg.upsample_rates,
                                        cfg.upsample_kernel_sizes)):
        x = _conv_transpose1d(x, p[f"ups.{i}.0.weight"], p[f"ups.{i}.0.bias"],
                              stride=rate, pad=(ksz - rate) // 2)
        acc = None
        for j, (rk, dils) in enumerate(zip(cfg.resblock_kernel_sizes,
                                           cfg.resblock_dilations)):
            pre = f"resblocks.{i * n_res + j}."
            h = x
            for d_i, dil in enumerate(dils):
                a1 = p[pre + f"activations.{2 * d_i}.act.alpha"]
                a2 = p[pre + f"activations.{2 * d_i + 1}.act.alpha"]
                t = _act(h, a1, cfg)
                t = _conv1d(t, p[pre + f"convs1.{d_i}.weight"],
                            p[pre + f"convs1.{d_i}.bias"],
                            pad=(rk - 1) * dil // 2, dilation=dil)
                t = _act(t, a2, cfg)
                t = _conv1d(t, p[pre + f"convs2.{d_i}.weight"],
                            p[pre + f"convs2.{d_i}.bias"], pad=(rk - 1) // 2)
                h = h + t
            acc = h if acc is None else acc + h
        x = acc / n_res
    x = _act(x, p["activation_post.act.alpha"], cfg)
    x = _conv1d(x, p["conv_post.weight"], p["conv_post.bias"], pad=3)
    return jnp.tanh(x[:, 0])


# ---------------------------------------------------------------------------

def from_bigvgan(state_dict) -> Dict[str, jax.Array]:
    """Map a BigVGAN generator state dict. Fuses weight_norm
    (weight_g * weight_v / ||weight_v||) when present; accepts both
    `activations.N.act.alpha` and `activations.N.alpha` naming."""
    raw = {k: np.asarray(v.detach() if hasattr(v, "detach") else v,
                         np.float32) for k, v in state_dict.items()}
    fused: Dict[str, np.ndarray] = {}
    for k, v in raw.items():
        if k.endswith("weight_v"):
            g = raw[k[:-1] + "g"]
            norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
            fused[k[:-9] + ".weight"] = g * v / np.maximum(norm, 1e-12)
        elif k.endswith("weight_g"):
            continue
        else:
            fused[k] = v
    out = {}
    for k, v in fused.items():
        if ".act." not in k and k.endswith(".alpha"):
            k = k[:-6] + ".act.alpha"
        if v.ndim == 3:  # torch conv [O, I, k] / convT [I, O, k] -> [k, I, O]
            out[k] = jnp.asarray(np.transpose(v, (2, 1, 0)))
        else:
            out[k] = jnp.asarray(v)
    return out


def init_vocoder_params(cfg: VocoderConfig, key) -> Dict[str, jax.Array]:
    idx = [0]

    def rnd(*shape, scale=0.05):
        idx[0] += 1
        return (jax.random.normal(jax.random.fold_in(key, idx[0]), shape)
                * scale).astype(jnp.float32)

    ch = cfg.upsample_initial_channel
    p = {"conv_pre.weight": rnd(7, cfg.n_mels, ch),
         "conv_pre.bias": jnp.zeros(ch)}
    n_res = len(cfg.resblock_kernel_sizes)
    for i, (rate, ksz) in enumerate(zip(cfg.upsample_rates,
                                        cfg.upsample_kernel_sizes)):
        cin, cout = ch // (2 ** i), ch // (2 ** (i + 1))
        # mapped torch convT [I, O, k] -> [k, O, I]? stored as [k, O, I]
        p[f"ups.{i}.0.weight"] = rnd(ksz, cout, cin)
        p[f"ups.{i}.0.bias"] = jnp.zeros(cout)
        for j, (rk, dils) in enumerate(zip(cfg.resblock_kernel_sizes,
                                           cfg.resblock_dilations)):
            pre = f"resblocks.{i * n_res + j}."
            for d_i, dil in enumerate(dils):
                p[pre + f"convs1.{d_i}.weight"] = rnd(rk, cout, cout)
                p[pre + f"convs1.{d_i}.bias"] = jnp.zeros(cout)
                p[pre + f"convs2.{d_i}.weight"] = rnd(rk, cout, cout)
                p[pre + f"convs2.{d_i}.bias"] = jnp.zeros(cout)
                p[pre + f"activations.{2 * d_i}.act.alpha"] = jnp.zeros(cout)
                p[pre + f"activations.{2 * d_i + 1}.act.alpha"] = \
                    jnp.zeros(cout)
    last = ch // (2 ** len(cfg.upsample_rates))
    p["activation_post.act.alpha"] = jnp.zeros(last)
    p["conv_post.weight"] = rnd(7, last, 1)
    p["conv_post.bias"] = jnp.zeros(1)
    return p
