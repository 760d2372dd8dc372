"""ViT encoder vs HF CLIP torch oracle + multimodal splice."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mnn_tpu.models.vision_encoder import (  # noqa: E402
    embed_multimodal,
    from_hf_clip,
    vit_forward,
)


@pytest.fixture(scope="module")
def clip_pair():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
    )
    torch.manual_seed(0)
    model = CLIPVisionModel(cfg).eval()
    return model, from_hf_clip(model)


class TestVit:
    def test_matches_torch(self, clip_pair):
        model, params = clip_pair
        torch.manual_seed(1)
        x = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            want = model(x).last_hidden_state.numpy()
        got = np.asarray(vit_forward(params, jnp.asarray(x.numpy())))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 1e-3, rel

    def test_multimodal_splice_and_forward(self, clip_pair):
        from mnn_tpu.models.config import PRESETS
        from mnn_tpu.models.decoder import forward, init_random_params
        from mnn_tpu.runtime import kvcache

        model, vparams = clip_pair
        cfg = PRESETS["tiny"]
        params = init_random_params(cfg, jax.random.PRNGKey(0), scale=0.05)
        feats = vit_forward(
            vparams, jnp.zeros((1, 3, 32, 32), jnp.float32))[0]
        # project 64 -> hidden via a fixed random projector
        proj = jax.random.normal(jax.random.PRNGKey(1),
                                 (64, cfg.hidden_size)) * 0.05
        img_embeds = feats @ proj  # [tokens, hidden]

        ids = [1, 2, 250, 3, 4]  # 250 = <image> placeholder
        embeds = embed_multimodal(params.embedding, ids, img_embeds, 250)
        t = embeds.shape[1]
        assert t == len(ids) - 1 + img_embeds.shape[0]

        cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 64,
                               cfg.head_dim, quantized=False)
        dummy_tokens = jnp.zeros((1, t), jnp.int32)
        logits, cache2 = forward(params, cfg, dummy_tokens, cache,
                                 inputs_embeds=embeds)
        assert logits.shape == (1, cfg.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()
        assert int(cache2.length[0]) == t
