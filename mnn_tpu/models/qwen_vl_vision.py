"""Qwen2.5-VL native vision tower (window attention, 2D rope, merger).

Equivalent of the reference's qwen2-vl vision path inside Omni
(/root/reference/transformers/llm/engine/src/omni.cpp qwen2 visual
preprocess + the exported vision Module): the Qwen2.5-VL ViT differs from
CLIP — 3D conv patch embed (temporal 2), RMSNorm, SwiGLU MLP with biases,
2D rotary positions over the patch grid, windowed attention with a few
full-attention layers, and a 2x2 spatial merger head.

TPU-first notes: the window/merge token reorderings depend only on
`grid_thw`, which is static per image size, so they fold to numpy
constants at trace time — the jitted graph is pure dense attention with
a precomputed block mask (no varlen/cu_seqlens machinery like the CUDA
flash path HF uses). Weights map 1:1 from the HF
Qwen2_5_VisionTransformerPretrainedModel state dict.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.models.layers import rms_norm


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    out_hidden_size: int = 3584
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    rms_eps: float = 1e-6

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny():
        return QwenVLVisionConfig(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            window_size=16, out_hidden_size=48, fullatt_block_indexes=(1,))


# ---------------------------------------------------------------------------
# static (numpy) position / window bookkeeping — grid_thw is static per
# image size, so all of this folds into constants at trace time

def _rot_pos_ids(cfg: QwenVLVisionConfig, grid_thw) -> np.ndarray:
    """(h, w) patch position per token, in HF's merge-group ordering."""
    m = cfg.spatial_merge_size
    out = []
    for t, h, w in grid_thw:
        hp = np.arange(h)[:, None].repeat(w, 1)
        wp = np.arange(w)[None, :].repeat(h, 0)
        # merge-group ordering: (h/m, m, w/m, m) -> (h/m, w/m, m, m)
        hp = hp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        wp = wp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hp, wp], -1)
        out.append(np.tile(pos, (t, 1)))
    return np.concatenate(out)


def _window_index(cfg: QwenVLVisionConfig, grid_thw):
    """HF get_window_index: permutation of merge-units into attention
    windows + per-token window id (for masking) + image id."""
    m = cfg.spatial_merge_size
    ws = cfg.window_size // m // cfg.patch_size  # merge-units per window edge
    index_all: List[np.ndarray] = []
    window_ids: List[np.ndarray] = []
    image_ids: List[np.ndarray] = []
    start = 0
    wid_base = 0
    for img_i, (t, h, w) in enumerate(grid_thw):
        lh, lw = h // m, w // m
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        ph = (-lh) % ws
        pw = (-lw) % ws
        idxp = np.pad(idx, ((0, 0), (0, ph), (0, pw)), constant_values=-100)
        nh, nw = (lh + ph) // ws, (lw + pw) // ws
        idxp = idxp.reshape(t, nh, ws, nw, ws).transpose(0, 1, 3, 2, 4)
        idxp = idxp.reshape(t * nh * nw, ws * ws)
        for wi, row in enumerate(idxp):
            valid = row[row != -100]
            if valid.size == 0:
                continue
            index_all.append(valid + start)
            window_ids.append(np.full(valid.size, wid_base + wi))
            image_ids.append(np.full(valid.size, img_i))
        start += t * lh * lw
        wid_base += idxp.shape[0]
    return (np.concatenate(index_all), np.concatenate(window_ids),
            np.concatenate(image_ids))


# ---------------------------------------------------------------------------

def _attention(x, qkv_w, qkv_b, proj_w, proj_b, cos, sin, mask, num_heads):
    s, d = x.shape
    hd = d // num_heads
    qkv = (jnp.dot(x, qkv_w, preferred_element_type=jnp.float32)
           + qkv_b).astype(x.dtype)
    q, k, v = (a.reshape(s, num_heads, hd) for a in jnp.split(qkv, 3, -1))

    def rot(a):
        af = a.astype(jnp.float32)
        half = jnp.concatenate([-af[..., hd // 2:], af[..., :hd // 2]], -1)
        return (af * cos[:, None] + half * sin[:, None]).astype(a.dtype)

    q, k = rot(q), rot(k)
    scores = jnp.einsum("shd,thd->hst", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    scores = jnp.where(mask[None], scores.astype(jnp.float32), -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("hst,thd->shd", attn, v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    o = o.reshape(s, d)
    return (jnp.dot(o, proj_w, preferred_element_type=jnp.float32)
            + proj_b).astype(x.dtype)


def qwen_vl_vision_forward(p: Dict[str, jax.Array], cfg: QwenVLVisionConfig,
                           patches: jax.Array,
                           grid_thw: Sequence[Tuple[int, int, int]]):
    """patches [S, C*tp*p*p] (HF processor layout), grid_thw static list of
    (t, h, w) in patch units -> features [S / merge^2, out_hidden_size]."""
    grid_thw = [tuple(int(v) for v in g) for g in grid_thw]
    mm = cfg.spatial_merge_size ** 2
    s = patches.shape[0]

    x = jnp.dot(patches, p["patch_embed.proj.weight"],
                preferred_element_type=jnp.float32).astype(patches.dtype)

    # static bookkeeping
    pos = _rot_pos_ids(cfg, grid_thw)                       # [S, 2]
    widx, window_id, image_id = _window_index(cfg, grid_thw)
    # expand merge-unit permutation to token granularity
    tok_perm = (widx[:, None] * mm + np.arange(mm)[None]).reshape(-1)
    # token-level window/image ids (after permutation)
    tok_window = np.repeat(window_id, mm)
    tok_image = np.repeat(image_id, mm)

    half = cfg.head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, half, 2) / half))
    angles = np.concatenate([pos[:, 0:1] * inv_freq[None],
                             pos[:, 1:2] * inv_freq[None]], -1)  # [S, hd/2]
    angles = angles[tok_perm]
    emb = np.concatenate([angles, angles], -1)
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)

    win_mask = jnp.asarray(tok_window[:, None] == tok_window[None, :])
    full_mask = jnp.asarray(tok_image[:, None] == tok_image[None, :])

    x = x[jnp.asarray(tok_perm)]
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        mask = full_mask if i in cfg.fullatt_block_indexes else win_mask
        h = rms_norm(x, p[pre + "norm1.weight"], cfg.rms_eps)
        x = x + _attention(h, p[pre + "attn.qkv.weight"],
                           p[pre + "attn.qkv.bias"],
                           p[pre + "attn.proj.weight"],
                           p[pre + "attn.proj.bias"], cos, sin, mask,
                           cfg.num_heads)
        h = rms_norm(x, p[pre + "norm2.weight"], cfg.rms_eps)
        gate = jnp.dot(h, p[pre + "mlp.gate_proj.weight"]) \
            + p[pre + "mlp.gate_proj.bias"]
        up = jnp.dot(h, p[pre + "mlp.up_proj.weight"]) \
            + p[pre + "mlp.up_proj.bias"]
        ff = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        x = x + (jnp.dot(ff, p[pre + "mlp.down_proj.weight"])
                 + p[pre + "mlp.down_proj.bias"]).astype(x.dtype)

    # merger: RMSNorm -> group 2x2 merge-units -> MLP
    x = rms_norm(x, p["merger.ln_q.weight"], cfg.rms_eps)
    x = x.reshape(s // mm, mm * cfg.hidden_size)
    x = jnp.dot(x, p["merger.mlp.0.weight"]) + p["merger.mlp.0.bias"]
    # HF merger uses nn.GELU() = exact erf, not the tanh approximation
    x = jax.nn.gelu(x.astype(jnp.float32),
                    approximate=False).astype(patches.dtype)
    x = jnp.dot(x, p["merger.mlp.2.weight"]) + p["merger.mlp.2.bias"]
    # undo the window permutation (at merge-unit granularity)
    return x[jnp.asarray(np.argsort(widx))]


def from_hf_qwen_vl_vision(state_dict) -> Dict[str, jax.Array]:
    """Map a HF Qwen2_5_VisionTransformerPretrainedModel state dict
    (also accepts full checkpoints with a `visual.` prefix)."""
    out = {}
    for key, val in state_dict.items():
        arr = np.asarray(val.detach().float() if hasattr(val, "detach")
                         else val, np.float32)
        key = key.removeprefix("visual.")
        if key == "patch_embed.proj.weight":
            # Conv3d [D, C, tp, p, p] -> [C*tp*p*p, D] (flattened linear)
            out[key] = jnp.asarray(arr.reshape(arr.shape[0], -1).T)
        elif key.endswith(".weight") and arr.ndim == 2:
            out[key] = jnp.asarray(np.ascontiguousarray(arr.T))
        else:
            out[key] = jnp.asarray(arr)
    return out
