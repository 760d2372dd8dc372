"""Wan: video DiT + causal 3-D VAE decoder + flow-matching pipeline.

Capability parity with the reference's Wan runtime
(/root/reference/transformers/diffusion/engine/src/wan_diffusion.cpp:
text embeds + attention mask -> guided flow-matching loop over the Wan
transformer -> 3-D VAE decode to frames; the networks arrive via export
there, so this file also supplies the TPU-native architecture). Faithful
to the published Wan 2.1 design (diffusers WanTransformer3DModel):

  * 3-D patchify over (frames, height, width) -> one token sequence;
  * self-attention with 3-D ROPE (frequency bands split across the
    t/h/w axes, each rotated by its own coordinate — video's analog of
    mrope; text-free axes reduce to 1-D rope exactly);
  * cross-attention to the (UMT5) text embeddings with key padding mask;
  * adaLN modulation (6-way) from the timestep embedding with per-block
    learned tables, GELU FFN;
  * causal 3-D VAE decoder: conv3d ResBlocks, temporal upsampling only
    across already-decoded frames (causal padding), pixel-shuffle
    spatial upsampling.

Flow matching: same rectified-flow stepping as Sana/SD3.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.diffusion.nn import attention, layer_norm, linear, silu, \
    timestep_embedding


@dataclasses.dataclass(frozen=True)
class WanConfig:
    in_channels: int = 16          # VAE latent channels
    dim: int = 1536
    num_heads: int = 12
    depth: int = 30
    ffn_expand: float = 4.0
    text_dim: int = 4096           # UMT5-xxl hidden
    patch: Tuple[int, int, int] = (1, 2, 2)   # (t, h, w) patch

    @staticmethod
    def tiny():
        return WanConfig(in_channels=4, dim=64, num_heads=4, depth=2,
                         ffn_expand=2.0, text_dim=32, patch=(1, 2, 2))


def rope_3d(thw: Tuple[int, int, int], head_dim: int, theta: float = 10000.0):
    """cos/sin [N, head_dim//2] with bands split across (t, h, w).

    Band allocation follows the mrope/Wan convention: the head_dim//2
    frequency bands are partitioned into three contiguous sections, each
    rotated by the token's coordinate along its axis. A single-frame,
    single-row grid reduces to plain 1-D rope on the w section.
    """
    t, h, w = thw
    half = head_dim // 2
    s_t = half // 3
    s_h = (half - s_t) // 2
    s_w = half - s_t - s_h
    freqs = 1.0 / (theta ** (np.arange(half, dtype=np.float64) / half))
    tt, hh, ww = np.meshgrid(np.arange(t), np.arange(h), np.arange(w),
                             indexing="ij")
    pos = np.zeros((t * h * w, half))
    flat = [tt.reshape(-1), hh.reshape(-1), ww.reshape(-1)]
    sections = [s_t, s_h, s_w]
    off = 0
    for sec, coord in zip(sections, flat):
        pos[:, off:off + sec] = coord[:, None]
        off += sec
    ang = pos * freqs[None, :]
    return jnp.asarray(np.cos(ang), jnp.float32), \
        jnp.asarray(np.sin(ang), jnp.float32)


def _apply_rope_nd(x, cos, sin):
    """x [B, H, N, D]; cos/sin [N, D//2] (half-rotation convention)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[None, None]
    s = sin[None, None]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _self_attention_3d(x, p, pre, num_heads, cos, sin):
    b, n, d = x.shape
    hd = d // num_heads

    def heads(a):
        return a.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)

    q = heads(linear(x, p[f"{pre}.q.w"], p[f"{pre}.q.b"]))
    k = heads(linear(x, p[f"{pre}.k.w"], p[f"{pre}.k.b"]))
    v = heads(linear(x, p[f"{pre}.v.w"], p[f"{pre}.v.b"]))
    q = _apply_rope_nd(q, cos, sin)
    k = _apply_rope_nd(k, cos, sin)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(hd)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    return linear(o, p[f"{pre}.o.w"], p[f"{pre}.o.b"])


def _cross_attention_masked(x, ctx, mask, p, pre, num_heads):
    """Cross attention with a per-batch key padding mask [B, Tk]."""
    b, n, d = x.shape
    tk = ctx.shape[1]
    hd = d // num_heads

    def heads(a, t):
        return a.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    q = heads(linear(x, p[f"{pre}.q.w"], p[f"{pre}.q.b"]), n)
    k = heads(linear(ctx, p[f"{pre}.k.w"], p[f"{pre}.k.b"]), tk)
    v = heads(linear(ctx, p[f"{pre}.v.w"], p[f"{pre}.v.b"]), tk)
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(hd)
    if mask is not None:
        s = jnp.where((mask > 0)[:, None, None, :], s, -jnp.inf)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhts,bhsd->bhtd", a, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    return linear(o, p[f"{pre}.o.w"], p[f"{pre}.o.b"])


def wan_forward(p: Dict, cfg: WanConfig, latent, timestep, text_embeds,
                text_mask=None):
    """latent [B, T, H, W, C] -> velocity [B, T, H, W, C]."""
    b, t, h, w, cin = latent.shape
    pt, ph, pw = cfg.patch
    gt, gh, gw = t // pt, h // ph, w // pw
    x = latent.reshape(b, gt, pt, gh, ph, gw, pw, cin)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, gt * gh * gw, pt * ph * pw * cin)
    x = linear(x, p["patch.w"], p["patch.b"])
    ctx = linear(text_embeds, p["text.w"], p["text.b"])

    temb = timestep_embedding(timestep, 256)
    temb = silu(linear(temb, p["t1.w"], p["t1.b"]))
    temb = linear(temb, p["t2.w"], p["t2.b"])
    mod6 = linear(silu(temb), p["adaln.w"], p["adaln.b"])

    cos, sin = rope_3d((gt, gh, gw), cfg.dim // cfg.num_heads)

    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        m = mod6[:, None] + p[f"{pre}.sst"][None]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(m, 6, axis=-1)
        hN = layer_norm(x, None, None) * (1 + sc1) + sh1
        x = x + g1 * _self_attention_3d(hN, p, f"{pre}.attn", cfg.num_heads,
                                        cos, sin)
        x = x + _cross_attention_masked(
            layer_norm(x, None, None), ctx, text_mask, p, f"{pre}.xattn",
            cfg.num_heads)
        hN = layer_norm(x, None, None) * (1 + sc2) + sh2
        y = linear(hN, p[f"{pre}.ffn.in.w"], p[f"{pre}.ffn.in.b"])
        y = jax.nn.gelu(y, approximate=True)
        x = x + g2 * linear(y, p[f"{pre}.ffn.out.w"], p[f"{pre}.ffn.out.b"])

    shift, scale = jnp.split(
        linear(silu(temb), p["out_mod.w"], p["out_mod.b"])[:, None], 2, -1)
    x = layer_norm(x, None, None) * (1 + scale) + shift
    x = linear(x, p["out.w"], p["out.b"])       # [B, N, pt*ph*pw*C]
    x = x.reshape(b, gt, gh, gw, pt, ph, pw, cin)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t, h, w, cin)


# -- causal 3-D VAE decoder ---------------------------------------------------


def _conv3d_causal(x, w, b):
    """x [B, T, H, W, C]; w [kt, kh, kw, cin, cout]; temporal padding is
    CAUSAL (front-only) so frame t never reads frames > t."""
    kt, kh, kw = w.shape[:3]
    x = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                    (kw // 2, kw // 2), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC")) + b


def _res3d(x, p, pre):
    y = silu(_conv3d_causal(x, p[f"{pre}.c1.w"], p[f"{pre}.c1.b"]))
    y = _conv3d_causal(y, p[f"{pre}.c2.w"], p[f"{pre}.c2.b"])
    return x + y


def wan_vae_decode(p: Dict, latent, *, spatial_stages: int = 2,
                   temporal_up: bool = True):
    """latent [B, T, h, w, C] -> frames [B, T(*2 if temporal_up),
    h*2^stages, w*2^stages, 3]."""
    x = _conv3d_causal(latent, p["in.w"], p["in.b"])
    if temporal_up:
        # causal temporal upsample: each latent frame expands to 2 frames
        b, t, h, w, c = x.shape
        y = _conv3d_causal(x, p["tup.w"], p["tup.b"])   # -> 2C
        x = y.reshape(b, t, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
        x = x.reshape(b, t * 2, h, w, c)
    for s in range(spatial_stages):
        x = _res3d(x, p, f"dec.{s}.res")
        b, t, h, w, c = x.shape
        y = _conv3d_causal(x, p[f"dec.{s}.up.w"], p[f"dec.{s}.up.b"])  # 4*c2
        c2 = y.shape[-1] // 4
        y = y.reshape(b, t, h, w, 2, 2, c2).transpose(0, 1, 2, 4, 3, 5, 6)
        x = y.reshape(b, t, h * 2, w * 2, c2)
    x = silu(x)
    x = _conv3d_causal(x, p["out.w"], p["out.b"])
    return jnp.tanh(x)


# -- init + pipeline ----------------------------------------------------------


def init_wan_params(cfg: WanConfig, key) -> Dict[str, jnp.ndarray]:
    ks = iter(jax.random.split(key, 64 + 24 * cfg.depth))

    def lin(din, dout, scale=0.02):
        return (jax.random.normal(next(ks), (din, dout)) * scale,
                jnp.zeros((dout,)))

    pt, ph, pw = cfg.patch
    pdim = pt * ph * pw * cfg.in_channels
    p = {}
    p["patch.w"], p["patch.b"] = lin(pdim, cfg.dim)
    p["text.w"], p["text.b"] = lin(cfg.text_dim, cfg.dim)
    p["t1.w"], p["t1.b"] = lin(256, cfg.dim)
    p["t2.w"], p["t2.b"] = lin(cfg.dim, cfg.dim)
    p["adaln.w"], p["adaln.b"] = lin(cfg.dim, 6 * cfg.dim)
    e = int(cfg.dim * cfg.ffn_expand)
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        p[f"{pre}.sst"] = jax.random.normal(next(ks), (6 * cfg.dim,)) * 0.02
        for a in ("attn", "xattn"):
            p[f"{pre}.{a}.q.w"], p[f"{pre}.{a}.q.b"] = lin(cfg.dim, cfg.dim)
            p[f"{pre}.{a}.k.w"], p[f"{pre}.{a}.k.b"] = lin(cfg.dim, cfg.dim)
            p[f"{pre}.{a}.v.w"], p[f"{pre}.{a}.v.b"] = lin(cfg.dim, cfg.dim)
            p[f"{pre}.{a}.o.w"], p[f"{pre}.{a}.o.b"] = lin(cfg.dim, cfg.dim)
        p[f"{pre}.ffn.in.w"], p[f"{pre}.ffn.in.b"] = lin(cfg.dim, e)
        p[f"{pre}.ffn.out.w"], p[f"{pre}.ffn.out.b"] = lin(e, cfg.dim)
    p["out_mod.w"], p["out_mod.b"] = lin(cfg.dim, 2 * cfg.dim)
    p["out.w"], p["out.b"] = lin(cfg.dim, pdim)
    return p


def init_wan_vae(key, latent_ch: int = 4, width: int = 16,
                 spatial_stages: int = 2) -> Dict:
    ks = iter(jax.random.split(key, 16 + 8 * spatial_stages))

    def c3(cin, cout, kt=3, k=3):
        return (jax.random.normal(next(ks), (kt, k, k, cin, cout)) * 0.02,
                jnp.zeros((cout,)))

    p = {}
    c = width
    p["in.w"], p["in.b"] = c3(latent_ch, c)
    p["tup.w"], p["tup.b"] = c3(c, 2 * c)
    for s in range(spatial_stages):
        pre = f"dec.{s}"
        p[f"{pre}.res.c1.w"], p[f"{pre}.res.c1.b"] = c3(c, c)
        p[f"{pre}.res.c2.w"], p[f"{pre}.res.c2.b"] = c3(c, c)
        nxt = max(c // 2, 8)
        p[f"{pre}.up.w"], p[f"{pre}.up.b"] = c3(c, 4 * nxt)
        c = nxt
    p["out.w"], p["out.b"] = c3(c, 3)
    return p


class WanPipeline:
    """text embeds (+mask) -> guided flow matching -> 3-D VAE decode.

    Mirrors WanDiffusion::run (wan_diffusion.cpp:285-368): cond/uncond
    batched into one transformer call per step, rectified-flow schedule,
    causal video decode."""

    def __init__(self, cfg: WanConfig, params: Dict, vae_params: Dict,
                 *, vae_stages: int = 2):
        self.cfg = cfg
        self.params = params
        self.vae = vae_params
        self.vae_stages = vae_stages

    def __call__(self, text_embeds, uncond_embeds, *, latent_thw=(2, 4, 4),
                 steps: int = 4, guidance: float = 5.0, seed: int = 0,
                 text_mask=None):
        cfg = self.cfg
        t, h, w = latent_thw
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, (1, t, h, w, cfg.in_channels))
        sigmas = jnp.linspace(1.0, 0.0, steps + 1)
        ctx = jnp.concatenate([text_embeds, uncond_embeds], axis=0)
        mask = None if text_mask is None else jnp.concatenate(
            [text_mask, jnp.ones_like(text_mask)], axis=0)

        @jax.jit
        def step(x, tcur, tprev):
            xb = jnp.concatenate([x, x], axis=0)
            tb = jnp.full((2,), tcur * 1000.0)
            v = wan_forward(self.params, cfg, xb, tb, ctx, mask)
            v_c, v_u = v[:1], v[1:]
            return x + (tprev - tcur) * (v_u + guidance * (v_c - v_u))

        for i in range(steps):
            x = step(x, sigmas[i], sigmas[i + 1])
        return wan_vae_decode(self.vae, x, spatial_stages=self.vae_stages)
