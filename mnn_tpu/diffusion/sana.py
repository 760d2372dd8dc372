"""Sana: linear-attention DiT + DC-AE decoder + flow-matching pipeline.

Capability parity with the reference's Sana runtime
(/root/reference/transformers/diffusion/engine/src/sana_diffusion.cpp:
text-embeds -> guided flow-matching loop over the Sana transformer ->
deep-compression VAE decode; the network itself arrives via export there,
so this file also supplies the TPU-native architecture). Faithful to the
published Sana design (Xie et al., 2024 / diffusers SanaTransformer2DModel):

  * ReLU LINEAR attention for image self-attention: O(N) in sequence
    length — softmax(QKᵀ)V is replaced by φ(Q)(φ(K)ᵀV) / φ(Q)(φ(K)ᵀ1)
    with φ = ReLU. The TPU-native win: the (d x d) key-value outer
    product keeps every matmul MXU-shaped at any resolution;
  * vanilla cross-attention to the (Gemma) text embeddings;
  * Mix-FFN: pointwise expand -> 3x3 depthwise conv over the 2-D token
    grid -> GLU gate -> pointwise project (convolution replaces
    positional encodings entirely — Sana is pos-embed-free);
  * adaLN-single conditioning: ONE shared 6-way modulation from the
    timestep embedding plus per-block learned offsets (scale_shift_table),
    instead of per-block adaLN MLPs;
  * DC-AE decoder: deep-compression autoencoder (32x spatial) built from
    GLU-gated conv ResBlocks + pixel-shuffle upsampling.

Flow matching: x_{t-dt} = x_t + (t_prev - t) * v_theta(x_t) on the
rectified-flow sigma schedule (shared with MMDiT/SD3's sampler).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.diffusion.nn import layer_norm, linear, silu, timestep_embedding


@dataclasses.dataclass(frozen=True)
class SanaConfig:
    in_channels: int = 32          # DC-AE latent channels
    dim: int = 1152
    num_heads: int = 16            # linear-attention heads
    cross_heads: int = 16
    depth: int = 12
    ffn_expand: float = 2.5
    text_dim: int = 2304           # Gemma-2 hidden
    patch: int = 1                 # Sana patchifies 1x1 (32x AE does the work)

    @staticmethod
    def tiny():
        return SanaConfig(in_channels=4, dim=64, num_heads=4, cross_heads=4,
                          depth=2, ffn_expand=2.0, text_dim=32)


def _heads(a, h):
    b, n, d = a.shape
    return a.reshape(b, n, h, d // h).transpose(0, 2, 1, 3)  # [B,H,N,hd]


def linear_attention(q, k, v, num_heads: int, eps: float = 1e-6):
    """ReLU linear attention: φ(Q) (φ(K)ᵀ V) / (φ(Q) φ(K)ᵀ1).  [B,N,D] x3.

    Exactly equivalent to the quadratic form
    (ReLU(Q)ReLU(K)ᵀ / rownorm) V — asserted by the unit test — but
    computed right-associated: the [hd, hd] KᵀV outer product makes the
    cost O(N d²) instead of O(N² d)."""
    qh = jax.nn.relu(_heads(q, num_heads)).astype(jnp.float32)
    kh = jax.nn.relu(_heads(k, num_heads)).astype(jnp.float32)
    vh = _heads(v, num_heads).astype(jnp.float32)
    kv = jnp.einsum("bhnk,bhnv->bhkv", kh, vh)          # [B,H,hd,hd]
    z = jnp.einsum("bhnk,bhk->bhn", qh, kh.sum(axis=2))  # normalizer
    out = jnp.einsum("bhnk,bhkv->bhnv", qh, kv) / (z[..., None] + eps)
    b, h, n, hd = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


def cross_attention(x, ctx, p, pre, num_heads):
    from mnn_tpu.diffusion.nn import attention

    q = linear(x, p[f"{pre}.q.w"], p[f"{pre}.q.b"])
    k = linear(ctx, p[f"{pre}.k.w"], p[f"{pre}.k.b"])
    v = linear(ctx, p[f"{pre}.v.w"], p[f"{pre}.v.b"])
    o = attention(q, k, v, num_heads)
    return linear(o, p[f"{pre}.o.w"], p[f"{pre}.o.b"])


def mix_ffn(x, p, pre, hw):
    """Pointwise expand -> 3x3 depthwise over the token grid -> GLU ->
    pointwise project (Sana's conv-GLU FFN; gives spatial locality in
    place of positional embeddings)."""
    b, n, d = x.shape
    h, w = hw
    y = linear(x, p[f"{pre}.in.w"], p[f"{pre}.in.b"])     # [B, N, 2E]
    e2 = y.shape[-1]
    img = y.reshape(b, h, w, e2)
    dw = p[f"{pre}.dw.w"]                                  # [3, 3, 2E]
    img = jax.lax.conv_general_dilated(
        img, dw[:, :, None, :], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=e2,
    ) + p[f"{pre}.dw.b"]
    gate, val = jnp.split(img.reshape(b, n, e2), 2, axis=-1)
    y = silu(gate) * val
    return linear(y, p[f"{pre}.out.w"], p[f"{pre}.out.b"])


def sana_forward(p: Dict, cfg: SanaConfig, latent, timestep, text_embeds):
    """latent [B, H, W, C_in] NHWC, timestep [B], text [B, T, text_dim]
    -> velocity [B, H, W, C_in]."""
    b, h, w, _ = latent.shape
    x = linear(latent.reshape(b, h * w, cfg.in_channels),
               p["patch.w"], p["patch.b"])                # [B, N, D]
    ctx = linear(text_embeds, p["text.w"], p["text.b"])

    temb = timestep_embedding(timestep, 256)
    temb = silu(linear(temb, p["t1.w"], p["t1.b"]))
    temb = linear(temb, p["t2.w"], p["t2.b"])             # [B, D]
    # adaLN-single: one shared 6-chunk modulation for every block
    mod6 = linear(silu(temb), p["adaln.w"], p["adaln.b"])  # [B, 6D]

    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        m = mod6[:, None] + p[f"{pre}.sst"][None]          # [B, 1, 6D]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(m, 6, axis=-1)

        hN = layer_norm(x, None, None) * (1 + sc1) + sh1
        q = linear(hN, p[f"{pre}.attn.q.w"], p[f"{pre}.attn.q.b"])
        k = linear(hN, p[f"{pre}.attn.k.w"], p[f"{pre}.attn.k.b"])
        v = linear(hN, p[f"{pre}.attn.v.w"], p[f"{pre}.attn.v.b"])
        att = linear_attention(q, k, v, cfg.num_heads).astype(x.dtype)
        x = x + g1 * linear(att, p[f"{pre}.attn.o.w"], p[f"{pre}.attn.o.b"])

        x = x + cross_attention(x, ctx, p, f"{pre}.xattn", cfg.cross_heads)

        hN = layer_norm(x, None, None) * (1 + sc2) + sh2
        x = x + g2 * mix_ffn(hN, p, f"{pre}.ffn", (h, w))

    shift, scale = jnp.split(
        linear(silu(temb), p["out_mod.w"], p["out_mod.b"])[:, None], 2, -1)
    x = layer_norm(x, None, None) * (1 + scale) + shift
    x = linear(x, p["out.w"], p["out.b"])
    return x.reshape(b, h, w, cfg.in_channels)


# -- DC-AE decoder ------------------------------------------------------------


def _glumb_conv(x, p, pre):
    """GLU mobile-bottleneck conv block (DC-AE's ResBlock): pointwise
    expand -> depthwise 3x3 -> GLU -> pointwise project, residual."""
    b, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x, p[f"{pre}.in.w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p[f"{pre}.in.b"]
    e2 = y.shape[-1]
    y = jax.lax.conv_general_dilated(
        y, p[f"{pre}.dw.w"][:, :, None, :], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=e2) + p[f"{pre}.dw.b"]
    gate, val = jnp.split(y, 2, axis=-1)
    y = silu(gate) * val
    y = jax.lax.conv_general_dilated(
        y, p[f"{pre}.out.w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p[f"{pre}.out.b"]
    return x + y


def _pixel_shuffle_up(x, p, pre):
    """Conv to 4x channels then depth-to-space 2x (DC-AE upsampling)."""
    b, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x, p[f"{pre}.w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p[f"{pre}.b"]
    cout = y.shape[-1] // 4
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h * 2, w * 2, cout)


def dcae_decode(p: Dict, latent, *, stages: int = 3, blocks: int = 1):
    """DC-AE decoder: latent [B, h, w, C] -> image [B, h*2^stages, ..., 3]."""
    x = jax.lax.conv_general_dilated(
        latent, p["in.w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["in.b"]
    for s in range(stages):
        for bidx in range(blocks):
            x = _glumb_conv(x, p, f"dec.{s}.res.{bidx}")
        x = _pixel_shuffle_up(x, p, f"dec.{s}.up")
    x = silu(x)
    x = jax.lax.conv_general_dilated(
        x, p["out.w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["out.b"]
    return jnp.tanh(x)


# -- init + pipeline ----------------------------------------------------------


def init_sana_params(cfg: SanaConfig, key) -> Dict[str, jnp.ndarray]:
    ks = iter(jax.random.split(key, 64 + 32 * cfg.depth))

    def lin(din, dout, scale=0.02):
        return (jax.random.normal(next(ks), (din, dout)) * scale,
                jnp.zeros((dout,)))

    p = {}
    p["patch.w"], p["patch.b"] = lin(cfg.in_channels, cfg.dim)
    p["text.w"], p["text.b"] = lin(cfg.text_dim, cfg.dim)
    p["t1.w"], p["t1.b"] = lin(256, cfg.dim)
    p["t2.w"], p["t2.b"] = lin(cfg.dim, cfg.dim)
    p["adaln.w"], p["adaln.b"] = lin(cfg.dim, 6 * cfg.dim)
    e = int(cfg.dim * cfg.ffn_expand)
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        p[f"{pre}.sst"] = jax.random.normal(next(ks), (6 * cfg.dim,)) * 0.02
        for a in ("attn", "xattn"):
            src = cfg.dim if a == "attn" else cfg.dim
            p[f"{pre}.{a}.q.w"], p[f"{pre}.{a}.q.b"] = lin(cfg.dim, cfg.dim)
            kin = cfg.dim
            p[f"{pre}.{a}.k.w"], p[f"{pre}.{a}.k.b"] = lin(kin, cfg.dim)
            p[f"{pre}.{a}.v.w"], p[f"{pre}.{a}.v.b"] = lin(kin, cfg.dim)
            p[f"{pre}.{a}.o.w"], p[f"{pre}.{a}.o.b"] = lin(cfg.dim, cfg.dim)
        p[f"{pre}.ffn.in.w"], p[f"{pre}.ffn.in.b"] = lin(cfg.dim, 2 * e)
        p[f"{pre}.ffn.dw.w"] = jax.random.normal(next(ks), (3, 3, 2 * e)) * 0.02
        p[f"{pre}.ffn.dw.b"] = jnp.zeros((2 * e,))
        p[f"{pre}.ffn.out.w"], p[f"{pre}.ffn.out.b"] = lin(e, cfg.dim)
    p["out_mod.w"], p["out_mod.b"] = lin(cfg.dim, 2 * cfg.dim)
    p["out.w"], p["out.b"] = lin(cfg.dim, cfg.in_channels)
    return p


def init_dcae_decoder(key, latent_ch: int = 4, width: int = 32,
                      stages: int = 3, blocks: int = 1) -> Dict:
    ks = iter(jax.random.split(key, 8 + 8 * stages * blocks))

    def conv(cin, cout, k=3):
        return (jax.random.normal(next(ks), (k, k, cin, cout)) * 0.02,
                jnp.zeros((cout,)))

    p = {}
    c = width
    p["in.w"], p["in.b"] = conv(latent_ch, c)
    for s in range(stages):
        for bidx in range(blocks):
            pre = f"dec.{s}.res.{bidx}"
            p[f"{pre}.in.w"], p[f"{pre}.in.b"] = conv(c, 2 * c, k=1)
            p[f"{pre}.dw.w"] = jax.random.normal(next(ks), (3, 3, 2 * c)) * 0.02
            p[f"{pre}.dw.b"] = jnp.zeros((2 * c,))
            p[f"{pre}.out.w"], p[f"{pre}.out.b"] = conv(c, c, k=1)
        nxt = max(c // 2, 8)
        p[f"dec.{s}.up.w"], p[f"dec.{s}.up.b"] = conv(c, 4 * nxt)
        c = nxt
    p["out.w"], p["out.b"] = conv(c, 3)
    return p


class SanaPipeline:
    """prompt embeds -> CFG flow-matching loop -> DC-AE decode.

    Mirrors SanaDiffusion::run (sana_diffusion.cpp:293-634): guided
    velocity prediction with cond/uncond batched in ONE transformer call
    per step, rectified-flow sigma schedule, final VAE decode."""

    def __init__(self, cfg: SanaConfig, params: Dict, dcae_params: Dict,
                 *, dcae_stages: int = 3, dcae_blocks: int = 1):
        self.cfg = cfg
        self.params = params
        self.dcae = dcae_params
        self.dcae_stages = dcae_stages
        self.dcae_blocks = dcae_blocks

    def __call__(self, text_embeds, uncond_embeds, *, latent_hw=(8, 8),
                 steps: int = 4, guidance: float = 4.5, seed: int = 0):
        cfg = self.cfg
        h, w = latent_hw
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, (1, h, w, cfg.in_channels))
        sigmas = jnp.linspace(1.0, 0.0, steps + 1)
        ctx = jnp.concatenate([text_embeds, uncond_embeds], axis=0)

        @jax.jit
        def step(x, t, t_prev):
            xb = jnp.concatenate([x, x], axis=0)
            tb = jnp.full((2,), t * 1000.0)
            v = sana_forward(self.params, cfg, xb, tb, ctx)
            v_c, v_u = v[:1], v[1:]
            v_g = v_u + guidance * (v_c - v_u)
            return x + (t_prev - t) * v_g

        for i in range(steps):
            x = step(x, sigmas[i], sigmas[i + 1])
        img = dcae_decode(self.dcae, x, stages=self.dcae_stages,
                          blocks=self.dcae_blocks)
        return img
