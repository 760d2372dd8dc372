"""AutoencoderKL VAE (encoder + decoder), native JAX (NHWC).

Equivalent of the reference's VAE Modules in the MNN diffusion engine
(/root/reference/transformers/diffusion/engine/src/diffusion.cpp —
`vae_decoder` stage; `vae_encoder` for img2img). Params are a flat dict
keyed by diffusers AutoencoderKL state-dict names (layout-transformed),
so `vae/diffusion_pytorch_model.safetensors` loads directly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.diffusion.nn import (conv2d, group_norm, linear, silu, t_conv,
                                  t_lin, t_vec, upsample_nearest_2x)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    groups: int = 32
    scaling_factor: float = 0.18215

    @staticmethod
    def tiny():
        return VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                         groups=4)


def _resnet(p: Dict, pre: str, x, groups):
    h = silu(group_norm(x, p[pre + "norm1.weight"], p[pre + "norm1.bias"],
                        groups=groups, eps=1e-6))
    h = conv2d(h, p[pre + "conv1.weight"], p[pre + "conv1.bias"])
    h = silu(group_norm(h, p[pre + "norm2.weight"], p[pre + "norm2.bias"],
                        groups=groups, eps=1e-6))
    h = conv2d(h, p[pre + "conv2.weight"], p[pre + "conv2.bias"])
    if pre + "conv_shortcut.weight" in p:
        x = conv2d(x, p[pre + "conv_shortcut.weight"],
                   p[pre + "conv_shortcut.bias"], padding=0)
    return x + h


def _mid_attention(p: Dict, pre: str, x, groups):
    """Single-head self-attention over spatial positions (VAE mid block)."""
    b, hh, ww, c = x.shape
    h = group_norm(x, p[pre + "group_norm.weight"], p[pre + "group_norm.bias"],
                   groups=groups, eps=1e-6)
    h = h.reshape(b, hh * ww, c)
    q = linear(h, p[pre + "to_q.weight"], p[pre + "to_q.bias"])
    k = linear(h, p[pre + "to_k.weight"], p[pre + "to_k.bias"])
    v = linear(h, p[pre + "to_v.weight"], p[pre + "to_v.bias"])
    s = jnp.einsum("btd,bsd->bts", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(c)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bts,bsd->btd", a, v, preferred_element_type=jnp.float32
                   ).astype(v.dtype)
    o = linear(o, p[pre + "to_out.0.weight"], p[pre + "to_out.0.bias"])
    return x + o.reshape(b, hh, ww, c)


def _mid_block(p: Dict, pre: str, x, groups):
    x = _resnet(p, pre + "resnets.0.", x, groups)
    x = _mid_attention(p, pre + "attentions.0.", x, groups)
    return _resnet(p, pre + "resnets.1.", x, groups)


def vae_decode(p: Dict, cfg: VAEConfig, latent: jax.Array) -> jax.Array:
    """latent [B,C,H,W] (scaled, as produced by the sampler) -> image
    [B,3,8H,8W] in [-1, 1]."""
    x = (latent / cfg.scaling_factor).transpose(0, 2, 3, 1)
    x = conv2d(x, p["post_quant_conv.weight"], p["post_quant_conv.bias"],
               padding=0)
    x = conv2d(x, p["decoder.conv_in.weight"], p["decoder.conv_in.bias"])
    g = cfg.groups
    x = _mid_block(p, "decoder.mid_block.", x, g)
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            x = _resnet(p, f"decoder.up_blocks.{i}.resnets.{j}.", x, g)
        if i < n - 1:
            x = upsample_nearest_2x(x)
            x = conv2d(x, p[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"],
                       p[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"])
    x = silu(group_norm(x, p["decoder.conv_norm_out.weight"],
                        p["decoder.conv_norm_out.bias"], groups=g, eps=1e-6))
    x = conv2d(x, p["decoder.conv_out.weight"], p["decoder.conv_out.bias"])
    return x.transpose(0, 3, 1, 2)


def vae_encode(p: Dict, cfg: VAEConfig, image: jax.Array,
               key=None) -> jax.Array:
    """image [B,3,H,W] in [-1,1] -> latent [B,C,H/8,W/8] (scaled).

    Deterministic (posterior mean) unless a PRNG key is given.
    """
    x = image.transpose(0, 2, 3, 1)
    x = conv2d(x, p["encoder.conv_in.weight"], p["encoder.conv_in.bias"])
    g = cfg.groups
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            x = _resnet(p, f"encoder.down_blocks.{i}.resnets.{j}.", x, g)
        if i < n - 1:
            # diffusers VAE downsample: asymmetric (0,1) pad + stride-2 conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(
                x, p[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"],
                p[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"],
                stride=2, padding=0)
    x = _mid_block(p, "encoder.mid_block.", x, g)
    x = silu(group_norm(x, p["encoder.conv_norm_out.weight"],
                        p["encoder.conv_norm_out.bias"], groups=g, eps=1e-6))
    x = conv2d(x, p["encoder.conv_out.weight"], p["encoder.conv_out.bias"])
    x = conv2d(x, p["quant_conv.weight"], p["quant_conv.bias"], padding=0)
    mean, logvar = jnp.split(x, 2, axis=-1)
    if key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(key, mean.shape)
    return (mean * cfg.scaling_factor).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# parameter plumbing

_OLD_ATTN = {"query": "to_q", "key": "to_k", "value": "to_v",
             "proj_attn": "to_out.0"}


def from_diffusers(state_dict) -> Dict[str, jax.Array]:
    """Map a diffusers AutoencoderKL state dict (torch or numpy).

    Accepts both the new attention naming (to_q/to_k/to_v/to_out.0) and the
    legacy one (query/key/value/proj_attn); legacy attention projections are
    stored as 1x1 convs and squeezed to linears.
    """
    out = {}
    for key, val in state_dict.items():
        arr = np.asarray(val.detach() if hasattr(val, "detach") else val,
                         np.float32)
        for old, new in _OLD_ATTN.items():
            if f".{old}." in key:
                key = key.replace(f".{old}.", f".{new}.")
                if arr.ndim == 4:  # legacy 1x1 conv attention proj
                    arr = arr[:, :, 0, 0]
                break
        if arr.ndim == 4:
            out[key] = t_conv(arr)
        elif arr.ndim == 2:
            out[key] = t_lin(arr)
        else:
            out[key] = t_vec(arr)
    return out


def param_shapes(cfg: VAEConfig) -> Dict[str, tuple]:
    s: Dict[str, tuple] = {}
    boc = cfg.block_out_channels
    lat = cfg.latent_channels

    def conv(name, cin, cout, k=3):
        s[name + ".weight"] = (k, k, cin, cout)
        s[name + ".bias"] = (cout,)

    def lin(name, din, dout):
        s[name + ".weight"] = (din, dout)
        s[name + ".bias"] = (dout,)

    def norm(name, c):
        s[name + ".weight"] = (c,)
        s[name + ".bias"] = (c,)

    def resnet(pre, cin, cout):
        norm(pre + "norm1", cin)
        conv(pre + "conv1", cin, cout)
        norm(pre + "norm2", cout)
        conv(pre + "conv2", cout, cout)
        if cin != cout:
            conv(pre + "conv_shortcut", cin, cout, k=1)

    def mid(pre, c):
        resnet(pre + "resnets.0.", c, c)
        norm(pre + "attentions.0.group_norm", c)
        for nm in ("to_q", "to_k", "to_v", "to_out.0"):
            lin(pre + f"attentions.0.{nm}", c, c)
        resnet(pre + "resnets.1.", c, c)

    # encoder
    conv("encoder.conv_in", 3, boc[0])
    ch = boc[0]
    for i, cout in enumerate(boc):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}.", ch, cout)
            ch = cout
        if i < len(boc) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    mid("encoder.mid_block.", ch)
    norm("encoder.conv_norm_out", ch)
    conv("encoder.conv_out", ch, 2 * lat)
    conv("quant_conv", 2 * lat, 2 * lat, k=1)

    # decoder
    conv("post_quant_conv", lat, lat, k=1)
    conv("decoder.conv_in", lat, boc[-1])
    ch = boc[-1]
    mid("decoder.mid_block.", ch)
    rev = list(reversed(boc))
    for i, cout in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}.", ch, cout)
            ch = cout
        if i < len(rev) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    norm("decoder.conv_norm_out", ch)
    conv("decoder.conv_out", ch, 3)
    return s


def init_vae_params(cfg: VAEConfig, key: jax.Array) -> Dict[str, jax.Array]:
    shapes = param_shapes(cfg)
    params = {}
    for i, (name, shape) in enumerate(sorted(shapes.items())):
        if name.endswith("bias") or len(shape) == 1:
            params[name] = (jnp.ones(shape) if name.endswith("weight")
                            else jnp.zeros(shape))
        else:
            fan_in = int(np.prod(shape[:-1])) or 1
            params[name] = (jax.random.normal(jax.random.fold_in(key, i),
                                              shape) / np.sqrt(fan_in)
                            ).astype(jnp.float32)
    return params


def validate_params(cfg: VAEConfig, params: Dict[str, jax.Array]):
    want = param_shapes(cfg)
    missing = sorted(set(want) - set(params))
    if missing:
        raise ValueError(f"vae checkpoint missing {len(missing)} params, "
                         f"first: {missing[:5]}")
    for k, shp in want.items():
        got = tuple(params[k].shape)
        if got != tuple(shp):
            raise ValueError(f"vae param {k}: shape {got} != expected {shp}")
