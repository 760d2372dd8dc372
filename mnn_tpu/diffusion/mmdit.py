"""MMDiT denoiser (SD3/SD3.5-class joint-attention diffusion transformer).

Equivalent of the reference's SD3.5 pipeline denoiser
(/root/reference/transformers/diffusion/engine/src/diffusion_sd35.cpp and
the DiT blocks its export wraps, transformers/llm/export/utils/
token2wav.py DiTBlock shows the same adaLN machinery): two token streams
— image patches and text context — each modulated by adaLN-zero from
(timestep ⊕ pooled text), attending JOINTLY, with per-stream MLPs, a
final adaLN + linear head, and unpatchify. Pairs with the
FlowMatchEulerScheduler (SD3's rectified-flow objective).

Params are a flat dict keyed by diffusers SD3Transformer2DModel state
dict names (linears pre-transposed to [in, out]); `from_diffusers_sd3`
performs the layout transform and `param_shapes`/`validate_params` check
checkpoint structure. The last block is context_pre_only (text stream
not updated), matching SD3.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.diffusion.nn import layer_norm, linear, t_lin, t_vec, \
    timestep_embedding, silu


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    in_channels: int = 16           # SD3 latent channels
    patch_size: int = 2
    hidden_size: int = 1536         # SD3-medium: 24 * 64
    depth: int = 24
    num_heads: int = 24
    context_dim: int = 4096         # T5/CLIP-joint text width
    pooled_dim: int = 2048
    pos_embed_max: int = 96         # max patches per side in pos table
    qk_norm: bool = True            # SD3.5

    @staticmethod
    def tiny():
        return MMDiTConfig(in_channels=4, patch_size=2, hidden_size=32,
                           depth=2, num_heads=2, context_dim=16,
                           pooled_dim=24, pos_embed_max=8)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


def _joint_attention(q, k, v, num_heads, qk_norm, nq_img, p, pre):
    """q/k/v [B, T, D] over the concatenated (image ‖ text) stream."""
    b, t, d = q.shape
    hd = d // num_heads

    def heads(a):
        return a.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if qk_norm:
        def rms(a, w):
            af = a.astype(jnp.float32)
            n = af * jax.lax.rsqrt((af * af).mean(-1, keepdims=True) + 1e-6)
            return (n * w).astype(a.dtype)
        # separate norms for the image rows and the text rows (diffusers
        # norm_q/norm_k vs norm_added_q/norm_added_k)
        q = jnp.concatenate([
            rms(q[:, :, :nq_img], p[pre + "attn.norm_q.weight"]),
            rms(q[:, :, nq_img:], p[pre + "attn.norm_added_q.weight"])], 2)
        k = jnp.concatenate([
            rms(k[:, :, :nq_img], p[pre + "attn.norm_k.weight"]),
            rms(k[:, :, nq_img:], p[pre + "attn.norm_added_k.weight"])], 2)
    s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(hd)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(v.dtype)
    o = jnp.einsum("bhts,bhsd->bhtd", a, v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    return o.transpose(0, 2, 1, 3).reshape(b, t, d)


def _block(p: Dict, pre: str, x, ctx, c_vec, cfg: MMDiTConfig,
           last: bool):
    b, nx, d = x.shape
    mod_x = linear(silu(c_vec), p[pre + "norm1.linear.weight"],
                   p[pre + "norm1.linear.bias"])
    sx = jnp.split(mod_x, 6, -1)  # AdaLNZero order: shift/scale/gate x2
    n_ctx_mod = 2 if last else 6
    mod_c = linear(silu(c_vec), p[pre + "norm1_context.linear.weight"],
                   p[pre + "norm1_context.linear.bias"])
    sc = jnp.split(mod_c, n_ctx_mod, -1)

    hx = _modulate(layer_norm(x, None, None), sx[0], sx[1])
    if last:
        # context_pre_only uses AdaLayerNormContinuous: (scale, shift)
        hc = _modulate(layer_norm(ctx, None, None), sc[1], sc[0])
    else:
        hc = _modulate(layer_norm(ctx, None, None), sc[0], sc[1])

    q = jnp.concatenate(
        [linear(hx, p[pre + "attn.to_q.weight"], p[pre + "attn.to_q.bias"]),
         linear(hc, p[pre + "attn.add_q_proj.weight"],
                p[pre + "attn.add_q_proj.bias"])], 1)
    k = jnp.concatenate(
        [linear(hx, p[pre + "attn.to_k.weight"], p[pre + "attn.to_k.bias"]),
         linear(hc, p[pre + "attn.add_k_proj.weight"],
                p[pre + "attn.add_k_proj.bias"])], 1)
    v = jnp.concatenate(
        [linear(hx, p[pre + "attn.to_v.weight"], p[pre + "attn.to_v.bias"]),
         linear(hc, p[pre + "attn.add_v_proj.weight"],
                p[pre + "attn.add_v_proj.bias"])], 1)
    o = _joint_attention(q, k, v, cfg.num_heads, cfg.qk_norm, nx, p, pre)
    o_img, o_ctx = o[:, :nx], o[:, nx:]

    x = x + sx[2][:, None] * linear(o_img, p[pre + "attn.to_out.0.weight"],
                                    p[pre + "attn.to_out.0.bias"])
    h = _modulate(layer_norm(x, None, None), sx[3], sx[4])
    h = jax.nn.gelu(linear(h, p[pre + "ff.net.0.proj.weight"],
                           p[pre + "ff.net.0.proj.bias"]).astype(jnp.float32),
                    approximate=True).astype(x.dtype)
    x = x + sx[5][:, None] * linear(h, p[pre + "ff.net.2.weight"],
                                    p[pre + "ff.net.2.bias"])

    if last:  # context_pre_only: text stream ends here
        return x, ctx
    ctx = ctx + sc[2][:, None] * linear(
        o_ctx, p[pre + "attn.to_add_out.weight"],
        p[pre + "attn.to_add_out.bias"])
    hc2 = _modulate(layer_norm(ctx, None, None), sc[3], sc[4])
    hc2 = jax.nn.gelu(
        linear(hc2, p[pre + "ff_context.net.0.proj.weight"],
               p[pre + "ff_context.net.0.proj.bias"]).astype(jnp.float32),
        approximate=True).astype(ctx.dtype)
    ctx = ctx + sc[5][:, None] * linear(
        hc2, p[pre + "ff_context.net.2.weight"],
        p[pre + "ff_context.net.2.bias"])
    return x, ctx


def mmdit_forward(p: Dict, cfg: MMDiTConfig, latent: jax.Array,
                  timestep, context: jax.Array,
                  pooled: jax.Array) -> jax.Array:
    """latent [B,C,H,W], timestep scalar/[B], context [B,Tc,context_dim],
    pooled [B,pooled_dim] -> velocity prediction [B,C,H,W]."""
    b, c, hh, ww = latent.shape
    ps = cfg.patch_size
    nh, nw = hh // ps, ww // ps
    d = cfg.hidden_size

    # patchify via the conv kernel flattened to a linear ([C*ps*ps, D])
    x = latent.reshape(b, c, nh, ps, nw, ps).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, nh * nw, c * ps * ps)
    x = linear(x, p["pos_embed.proj.weight"], p["pos_embed.proj.bias"])
    # cropped 2D position table (diffusers stores [1, max*max, D])
    pos = p["pos_embed.pos_embed"][0].reshape(
        cfg.pos_embed_max, cfg.pos_embed_max, d)
    top = (cfg.pos_embed_max - nh) // 2
    left = (cfg.pos_embed_max - nw) // 2
    x = x + pos[top: top + nh, left: left + nw].reshape(1, nh * nw, d)

    t_emb = timestep_embedding(
        jnp.broadcast_to(jnp.asarray(timestep), (b,)), 256).astype(x.dtype)
    t_emb = linear(t_emb, p["time_text_embed.timestep_embedder.linear_1.weight"],
                   p["time_text_embed.timestep_embedder.linear_1.bias"])
    t_emb = linear(silu(t_emb),
                   p["time_text_embed.timestep_embedder.linear_2.weight"],
                   p["time_text_embed.timestep_embedder.linear_2.bias"])
    pl = linear(pooled, p["time_text_embed.text_embedder.linear_1.weight"],
                p["time_text_embed.text_embedder.linear_1.bias"])
    pl = linear(silu(pl), p["time_text_embed.text_embedder.linear_2.weight"],
                p["time_text_embed.text_embedder.linear_2.bias"])
    c_vec = t_emb + pl

    ctx = linear(context, p["context_embedder.weight"],
                 p["context_embedder.bias"])

    for i in range(cfg.depth):
        x, ctx = _block(p, f"transformer_blocks.{i}.", x, ctx, c_vec, cfg,
                        last=(i == cfg.depth - 1))

    mod = linear(silu(c_vec), p["norm_out.linear.weight"],
                 p["norm_out.linear.bias"])
    # AdaLayerNormContinuous chunks as (scale, shift) — diffusers order
    scale, shift = jnp.split(mod, 2, -1)
    x = _modulate(layer_norm(x, None, None), shift, scale)
    x = linear(x, p["proj_out.weight"], p["proj_out.bias"])
    # unpatchify
    x = x.reshape(b, nh, nw, c, ps, ps).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, hh, ww)


# ---------------------------------------------------------------------------

def from_diffusers_sd3(state_dict) -> Dict[str, jax.Array]:
    """Map a diffusers SD3Transformer2DModel state dict (layout only)."""
    out = {}
    for key, val in state_dict.items():
        arr = np.asarray(val.detach() if hasattr(val, "detach") else val,
                         np.float32)
        if key == "pos_embed.proj.weight":     # conv [D, C, p, p]
            out[key] = jnp.asarray(arr.reshape(arr.shape[0], -1).T)
        elif key.endswith(".weight") and arr.ndim == 2:
            out[key] = t_lin(arr)
        else:
            out[key] = t_vec(arr)
    return out


def param_shapes(cfg: MMDiTConfig) -> Dict[str, tuple]:
    d = cfg.hidden_size
    s: Dict[str, tuple] = {}

    def lin(name, din, dout):
        s[name + ".weight"] = (din, dout)
        s[name + ".bias"] = (dout,)

    s["pos_embed.proj.weight"] = (cfg.in_channels * cfg.patch_size ** 2, d)
    s["pos_embed.proj.bias"] = (d,)
    s["pos_embed.pos_embed"] = (1, cfg.pos_embed_max ** 2, d)
    lin("time_text_embed.timestep_embedder.linear_1", 256, d)
    lin("time_text_embed.timestep_embedder.linear_2", d, d)
    lin("time_text_embed.text_embedder.linear_1", cfg.pooled_dim, d)
    lin("time_text_embed.text_embedder.linear_2", d, d)
    lin("context_embedder", cfg.context_dim, d)
    for i in range(cfg.depth):
        pre = f"transformer_blocks.{i}."
        last = i == cfg.depth - 1
        lin(pre + "norm1.linear", d, 6 * d)
        lin(pre + "norm1_context.linear", d, (2 if last else 6) * d)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj"):
            lin(pre + f"attn.{nm}", d, d)
        if cfg.qk_norm:
            hd = d // cfg.num_heads
            for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
                s[pre + f"attn.{nm}.weight"] = (hd,)
        lin(pre + "attn.to_out.0", d, d)
        lin(pre + "ff.net.0.proj", d, 4 * d)
        lin(pre + "ff.net.2", 4 * d, d)
        if not last:
            lin(pre + "attn.to_add_out", d, d)
            lin(pre + "ff_context.net.0.proj", d, 4 * d)
            lin(pre + "ff_context.net.2", 4 * d, d)
    lin("norm_out.linear", d, 2 * d)
    lin("proj_out", d, cfg.in_channels * cfg.patch_size ** 2)
    return s


def init_mmdit_params(cfg: MMDiTConfig, key) -> Dict[str, jax.Array]:
    shapes = param_shapes(cfg)
    out = {}
    for i, (name, shape) in enumerate(sorted(shapes.items())):
        if name.endswith("bias"):
            out[name] = jnp.zeros(shape)
        elif len(shape) == 1:
            out[name] = jnp.ones(shape)
        else:
            fan_in = int(np.prod(shape[:-1])) or 1
            out[name] = (jax.random.normal(jax.random.fold_in(key, i), shape)
                         / np.sqrt(fan_in)).astype(jnp.float32)
    return out


def validate_params(cfg: MMDiTConfig, params: Dict[str, jax.Array]):
    want = param_shapes(cfg)
    missing = sorted(set(want) - set(params))
    if missing:
        raise ValueError(f"mmdit checkpoint missing {len(missing)} params, "
                         f"first: {missing[:5]}")
    for k, shp in want.items():
        if tuple(params[k].shape) != tuple(shp):
            raise ValueError(
                f"mmdit param {k}: {tuple(params[k].shape)} != {shp}")
