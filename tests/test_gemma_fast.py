"""Gemma-family fast decode path (unrolled per-layer kernels) vs the scan
reference.

Gemma configs historically ran decode on the layer-scan path (XLA
attention, ~3x decode HBM traffic from per-layer weight-slice copies).
The unrolled path now handles score softcap (in the fused decode-step
kernel), sandwich norms, gelu MLP, gemma2 alternating windows, and gemma3
N:1 windows + dual rope — with PYTHON-static per-layer parameters. These
tests pin the two paths to each other per step.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache

G2 = ModelConfig(
    name="tiny-gemma2", vocab_size=256, hidden_size=128,
    intermediate_size=256, num_layers=4, num_heads=4, num_kv_heads=2,
    head_dim=64, rope_theta=10000.0, tie_word_embeddings=True,
    attention_bias=False, sliding_window=8, mlp_act="gelu_tanh",
    embed_scale=True, sandwich_norm=True, attn_softcap=50.0,
    final_softcap=30.0, query_scale=64.0 ** -0.5, swa_every_other=True,
)
G3 = ModelConfig(
    name="tiny-gemma3", vocab_size=256, hidden_size=128,
    intermediate_size=256, num_layers=4, num_heads=4, num_kv_heads=2,
    head_dim=64, rope_theta=10000.0, tie_word_embeddings=True,
    attention_bias=False, sliding_window=8, mlp_act="gelu_tanh",
    embed_scale=True, sandwich_norm=True, qk_norm=True,
    swa_pattern=2, rope_local_theta=1000.0,
)


class TestGemmaFastPath:
    def _roundtrip(self, cfg, quantized=True):
        params = init_random_params(cfg, jax.random.PRNGKey(0), scale=0.05)
        cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 64,
                               cfg.head_dim, quantized=quantized)
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0,
                                  cfg.vocab_size, jnp.int32)
        _, cache = forward(params, cfg, toks, cache, interpret=False)
        tok = jnp.asarray([[3]], jnp.int32)
        for step in range(3):
            ref, _ = forward(params, cfg, tok, cache, interpret=True,
                             layer_scan=True)
            got, cache = forward(params, cfg, tok, cache, interpret=True)
            r = np.asarray(ref, np.float32)
            g = np.asarray(got, np.float32)
            assert np.isfinite(g).all()
            rel = np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-9)
            assert rel < 2e-2, (cfg.name, step, rel)
            tok = jnp.argmax(got, axis=-1).astype(jnp.int32)[:, None]

    def test_gemma2_decode_matches_scan(self):
        self._roundtrip(G2)

    def test_gemma2_bf16_kv(self):
        self._roundtrip(G2, quantized=False)

    def test_gemma3_decode_matches_scan(self):
        """Dual rope (local theta on sliding layers) + N:1 windows +
        qk-norm."""
        self._roundtrip(G3)

    def test_gemma3_megakernel_eligible_and_matches(self):
        """gemma3 now runs the whole-model megakernel (swa_p flag: per-layer
        window select + dual-rope phase select in-kernel); pin it against
        the per-layer fused path, which is itself scan-pinned above."""
        from mnn_tpu.kernels import decode_model

        params = init_random_params(G3, jax.random.PRNGKey(0), scale=0.05)
        cache = kvcache.create(G3.num_layers, 1, G3.num_kv_heads, 64,
                               G3.head_dim, quantized=True)
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0,
                                  G3.vocab_size, jnp.int32)
        _, cache = forward(params, G3, toks, cache, interpret=False)
        assert decode_model.supports(G3, params, cache, 1), \
            "gemma3 must be megakernel-eligible"
        tok = jnp.asarray([[3]], jnp.int32)
        for step in range(3):
            ref, cache_pl = forward(params, G3, tok, cache, interpret=True,
                                    megakernel=False)
            got, cache = forward(params, G3, tok, cache, interpret=True,
                                 megakernel=True)
            r = np.asarray(ref, np.float32)
            g = np.asarray(got, np.float32)
            assert np.isfinite(g).all()
            rel = np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-9)
            assert rel < 2e-2, (step, rel)
            for name in ("k", "v"):
                a = np.asarray(getattr(cache, name), np.float32)
                b_ = np.asarray(getattr(cache_pl, name), np.float32)
                assert np.abs(a - b_).max() <= 1.0, name
            tok = jnp.argmax(got, axis=-1).astype(jnp.int32)[:, None]

    def test_window_actually_differs_across_layers(self):
        """Sanity: gemma2 decode with a long history must differ from a
        no-window variant (the alternating window is really applied)."""
        cfg = G2
        params = init_random_params(cfg, jax.random.PRNGKey(0), scale=0.05)
        cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 64,
                               cfg.head_dim, quantized=False)
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 20), 0,
                                  cfg.vocab_size, jnp.int32)
        _, cache = forward(params, cfg, toks, cache, interpret=False)
        tok = jnp.asarray([[3]], jnp.int32)
        win, _ = forward(params, cfg, tok, cache, interpret=True)
        nowin_cfg = dataclasses.replace(cfg, sliding_window=0,
                                        swa_every_other=False,
                                        name="tiny-gemma2-nowin")
        nowin, _ = forward(params, nowin_cfg, tok, cache, interpret=True)
        d = np.abs(np.asarray(win) - np.asarray(nowin)).max()
        assert d > 1e-4, d
