"""Vision encoder + multimodal splice (LLaVA-style image tokens).

Equivalent of the reference's Omni vision path (SURVEY.md §2.8:
/root/reference/transformers/llm/engine/src/omni.cpp — per-family vision
preprocess + a vision transformer whose output embeddings are spliced into
the LLM token stream). Here:

* the ViT runs as a pure jax function converted from the HF torch vision
  tower through our own torch.fx frontend is NOT possible (CLIP uses
  sdpa attention inside), so the encoder is implemented natively in jax
  and the HF CLIP/SigLIP weights are mapped tensor-by-tensor;
* a linear/MLP projector maps vision features into the LLM embedding
  space; `embed_multimodal` splices image embeddings at an <image>
  placeholder, and the decoder's `inputs_embeds` path consumes them.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VitLayer:
    ln1_w: jax.Array
    ln1_b: jax.Array
    wq: jax.Array   # [L, D, D] (+bias)
    bq: jax.Array
    wk: jax.Array
    bk: jax.Array
    wv: jax.Array
    bv: jax.Array
    wo: jax.Array
    bo: jax.Array
    ln2_w: jax.Array
    ln2_b: jax.Array
    fc1_w: jax.Array  # [L, D, 4D]
    fc1_b: jax.Array
    fc2_w: jax.Array
    fc2_b: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VitParams:
    patch_embed: jax.Array     # [P*P*3, D] (flattened conv kernel)
    class_embed: Optional[jax.Array]  # [D] (CLIP has CLS token)
    pos_embed: jax.Array       # [n_pos, D]
    pre_ln_w: Optional[jax.Array]
    pre_ln_b: Optional[jax.Array]
    post_ln_w: jax.Array
    post_ln_b: jax.Array
    layers: VitLayer
    num_heads: int = dataclasses.field(metadata=dict(static=True), default=12)
    patch: int = dataclasses.field(metadata=dict(static=True), default=32)
    act: str = dataclasses.field(metadata=dict(static=True), default="quick_gelu")


def vit_forward(p: VitParams, pixels: jax.Array) -> jax.Array:
    """pixels [B, 3, H, W] -> features [B, tokens, D] (CLIP pre-pool)."""
    b, c, hh, ww = pixels.shape
    ph = p.patch
    d = p.patch_embed.shape[1]
    # conv patch embed == reshape to patches then matmul
    x = pixels.reshape(b, c, hh // ph, ph, ww // ph, ph)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, c * ph * ph)
    x = jnp.dot(x, p.patch_embed, preferred_element_type=jnp.float32)
    if p.class_embed is not None:
        cls = jnp.broadcast_to(p.class_embed[None, None], (b, 1, d))
        x = jnp.concatenate([cls, x.astype(cls.dtype)], axis=1)
    x = x + p.pos_embed[None, : x.shape[1]]
    if p.pre_ln_w is not None:
        x = _ln(x, p.pre_ln_w, p.pre_ln_b)

    nh = p.num_heads
    hd = d // nh

    def block(x, l):
        h = _ln(x, l.ln1_w, l.ln1_b)
        q = (jnp.dot(h, l.wq) + l.bq).reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        k = (jnp.dot(h, l.wk) + l.bk).reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        v = (jnp.dot(h, l.wv) + l.bv).reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhtd,bhsd->bhts", q, k) / (hd ** 0.5)
        a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhts,bhsd->bhtd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, d)
        x = x + (jnp.dot(o, l.wo) + l.bo)
        h2 = _ln(x, l.ln2_w, l.ln2_b)
        pre = jnp.dot(h2, l.fc1_w) + l.fc1_b
        if p.act == "quick_gelu":  # CLIP default
            ff = pre * jax.nn.sigmoid(1.702 * pre)
        else:
            ff = jax.nn.gelu(pre, approximate=(p.act == "gelu_new"))
        x = x + (jnp.dot(ff, l.fc2_w) + l.fc2_b)
        return x, None

    x, _ = jax.lax.scan(block, x.astype(jnp.float32), p.layers)
    # HF parity: last_hidden_state is the raw encoder output; post_layernorm
    # is only applied to the pooled CLS (see vit_pooled)
    return x


def vit_pooled(p: VitParams, features: jax.Array) -> jax.Array:
    """CLIP pooled output: post-LN CLS token. features [B, T, D] -> [B, D]."""
    return _ln(features[:, 0], p.post_ln_w, p.post_ln_b)


def from_hf_clip(model) -> VitParams:
    """Map a transformers CLIPVisionModel's weights."""
    sd = {k: np.asarray(v.detach()) for k, v in model.state_dict().items()}
    cfg = model.config
    pre = "vision_model."
    L = cfg.num_hidden_layers

    def stack(fmt, transpose=False):
        mats = [sd[pre + fmt.format(i)] for i in range(L)]
        out = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(out, jnp.float32)

    conv = sd[pre + "embeddings.patch_embedding.weight"]  # [D, 3, P, P]
    d = conv.shape[0]
    patch_embed = conv.reshape(d, -1).T  # [3*P*P, D]
    layers = VitLayer(
        ln1_w=stack("encoder.layers.{}.layer_norm1.weight"),
        ln1_b=stack("encoder.layers.{}.layer_norm1.bias"),
        wq=stack("encoder.layers.{}.self_attn.q_proj.weight", True),
        bq=stack("encoder.layers.{}.self_attn.q_proj.bias"),
        wk=stack("encoder.layers.{}.self_attn.k_proj.weight", True),
        bk=stack("encoder.layers.{}.self_attn.k_proj.bias"),
        wv=stack("encoder.layers.{}.self_attn.v_proj.weight", True),
        bv=stack("encoder.layers.{}.self_attn.v_proj.bias"),
        wo=stack("encoder.layers.{}.self_attn.out_proj.weight", True),
        bo=stack("encoder.layers.{}.self_attn.out_proj.bias"),
        ln2_w=stack("encoder.layers.{}.layer_norm2.weight"),
        ln2_b=stack("encoder.layers.{}.layer_norm2.bias"),
        fc1_w=stack("encoder.layers.{}.mlp.fc1.weight", True),
        fc1_b=stack("encoder.layers.{}.mlp.fc1.bias"),
        fc2_w=stack("encoder.layers.{}.mlp.fc2.weight", True),
        fc2_b=stack("encoder.layers.{}.mlp.fc2.bias"),
    )
    return VitParams(
        patch_embed=jnp.asarray(patch_embed, jnp.float32),
        class_embed=jnp.asarray(sd[pre + "embeddings.class_embedding"], jnp.float32),
        pos_embed=jnp.asarray(
            sd[pre + "embeddings.position_embedding.weight"], jnp.float32),
        pre_ln_w=jnp.asarray(sd[pre + "pre_layrnorm.weight"], jnp.float32),
        pre_ln_b=jnp.asarray(sd[pre + "pre_layrnorm.bias"], jnp.float32),
        post_ln_w=jnp.asarray(sd[pre + "post_layernorm.weight"], jnp.float32),
        post_ln_b=jnp.asarray(sd[pre + "post_layernorm.bias"], jnp.float32),
        layers=layers,
        num_heads=cfg.num_attention_heads,
        patch=cfg.patch_size,
        act=getattr(cfg, "hidden_act", "quick_gelu"),
    )


def build_mrope_positions(token_ids, image_token_id=None, grid_hw=None,
                          start: int = 0):
    """Qwen2-VL-style 3D (temporal, height, width) position ids.

    Text tokens advance all three components together (so mrope equals
    plain rope for them — see layers.rope_cos_sin_mrope). A run of image
    placeholder tokens (one per ViT patch, row-major over `grid_hw`)
    shares one temporal position while h/w walk the patch grid; positions
    resume after the image at start + max(grid). Mirrors the reference's
    mrope position-id construction for Omni models
    (/root/reference/transformers/llm/engine/src/omni.cpp).

    Returns [1, T, 3] int32.
    """
    ids = list(token_ids)
    pos = np.zeros((len(ids), 3), np.int32)
    cur = start
    i = 0
    while i < len(ids):
        if image_token_id is not None and ids[i] == image_token_id:
            gh, gw = grid_hw
            n = gh * gw
            run = ids[i:i + n]
            assert all(t == image_token_id for t in run) and len(run) == n, (
                "image token run shorter than grid")
            rows = np.repeat(np.arange(gh, dtype=np.int32), gw)
            cols = np.tile(np.arange(gw, dtype=np.int32), gh)
            pos[i:i + n, 0] = cur
            pos[i:i + n, 1] = cur + rows
            pos[i:i + n, 2] = cur + cols
            cur += int(max(gh, gw))
            i += n
        else:
            pos[i] = cur
            cur += 1
            i += 1
    return pos[None]


def embed_multimodal(
    embedding: jax.Array,           # LLM token embedding [V, H]
    token_ids: List[int],
    image_features: jax.Array,      # [n_img_tokens, H] (post-projector)
    image_token_id: int,
) -> jax.Array:
    """Replace the <image> placeholder with image embeddings -> [1, T, H]."""
    parts = []
    ids = list(token_ids)
    if image_token_id in ids:
        pos = ids.index(image_token_id)
        before = jnp.asarray(ids[:pos], jnp.int32)
        after = jnp.asarray(ids[pos + 1 :], jnp.int32)
        parts = [embedding[before], image_features.astype(embedding.dtype),
                 embedding[after]]
    else:
        parts = [embedding[jnp.asarray(ids, jnp.int32)]]
    return jnp.concatenate(parts, axis=0)[None]
