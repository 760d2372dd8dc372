"""Whole-model decode megakernel vs the XLA reference forward.

The megakernel (kernels/decode_model.py) must reproduce the reference
decode path (interpret=False -> pure-XLA kernels) within quantization-noise
tolerance: same logits and the same quantized KV rows written to the cache.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnn_tpu.kernels import decode_model
from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache

BASE = ModelConfig(
    name="mk-test", vocab_size=512, hidden_size=256, intermediate_size=512,
    num_layers=3, num_heads=4, num_kv_heads=2, head_dim=64,
    rope_theta=10000.0, attention_bias=True, tie_word_embeddings=True,
)


def _setup(cfg, batch=1, cap=128, quantized=True, bits=4, prefill_len=9):
    params = init_random_params(
        cfg, jax.random.PRNGKey(0), quant_bits=bits, scale=0.05
    )
    cache = kvcache.create(
        cfg.num_layers, batch, cfg.num_kv_heads, cap, cfg.head_dim,
        quantized=quantized,
    )
    toks = jax.random.randint(
        jax.random.PRNGKey(1), (batch, prefill_len), 0, cfg.vocab_size,
        jnp.int32,
    )
    _, cache = forward(params, cfg, toks, cache, interpret=False)
    return params, cache


def _perlayer_forward(params, cfg, tok, cache):
    """Trusted per-layer Pallas path (megakernel dispatch disabled)."""
    orig = decode_model.supports
    decode_model.supports = lambda *a, **k: False
    try:
        return forward(params, cfg, tok, cache, interpret=True)
    finally:
        decode_model.supports = orig


def _compare(cfg, params, cache, steps=3, batch=1):
    tok = jax.random.randint(
        jax.random.PRNGKey(2), (batch, 1), 0, cfg.vocab_size, jnp.int32
    )
    cache_ref = cache
    cache_pl = cache
    cache_mk = cache
    for _ in range(steps):
        ref, cache_ref = forward(params, cfg, tok, cache_ref, interpret=False)
        pl_, cache_pl = _perlayer_forward(params, cfg, tok, cache_pl)
        mk, cache_mk = forward(params, cfg, tok, cache_mk, interpret=True)
        r = np.asarray(ref, np.float32)
        p = np.asarray(pl_, np.float32)
        m = np.asarray(mk, np.float32)
        assert np.all(np.isfinite(m))
        # vs the per-layer Pallas path: same math, near-exact
        rel_pl = np.linalg.norm(m - p) / max(np.linalg.norm(p), 1e-9)
        assert rel_pl < 1e-4, f"megakernel vs per-layer rel err {rel_pl}"
        # vs the XLA reference: within quantization-algebra noise
        rel = np.linalg.norm(m - r) / max(np.linalg.norm(r), 1e-9)
        assert rel < 5e-2, f"logits rel err {rel}"
        tok = jnp.argmax(mk, axis=-1).astype(jnp.int32)[:, None]
    # cache contents written by the kernel must match the per-layer writes
    assert int(cache_mk.length[0]) == int(cache_pl.length[0])
    n = int(cache_pl.length[0])
    for name in ("k", "v"):
        a = np.asarray(getattr(cache_mk, name), np.float32)[:, :, :, :n]
        b = np.asarray(getattr(cache_pl, name), np.float32)[:, :, :, :n]
        assert np.abs(a - b).max() < 1e-5, name


class TestMegakernel:
    def test_supports(self):
        params, cache = _setup(BASE)
        assert decode_model.supports(BASE, params, cache, 1)

    def test_int4_quantized_kv(self):
        params, cache = _setup(BASE, quantized=True, bits=4)
        _compare(BASE, params, cache)

    def test_int8_weights(self):
        params, cache = _setup(BASE, quantized=True, bits=8)
        _compare(BASE, params, cache)

    def test_bf16_kv(self):
        params, cache = _setup(BASE, quantized=False)
        _compare(BASE, params, cache)

    def test_qk_norm_no_bias(self):
        cfg = dataclasses.replace(BASE, qk_norm=True, attention_bias=False)
        params, cache = _setup(cfg)
        _compare(cfg, params, cache)

    def test_sliding_window_sink(self):
        cfg = dataclasses.replace(BASE, sliding_window=6, attention_sink=2)
        params, cache = _setup(cfg, prefill_len=20, cap=128)
        _compare(cfg, params, cache)

    def test_batch2(self):
        params, cache = _setup(BASE, batch=2)
        _compare(BASE, params, cache, batch=2)

    def test_multi_kv_tiles(self):
        # capacity 1024 -> 2 KV tiles of 512
        params, cache = _setup(BASE, cap=1024, prefill_len=30)
        _compare(BASE, params, cache)

    def test_decode_matches_prefill(self):
        # end-to-end: N megakernel decode steps == one fresh prefill
        cfg = BASE
        params, cache = _setup(cfg, quantized=False, prefill_len=6)
        toks = jax.random.randint(
            jax.random.PRNGKey(3), (1, 3), 0, cfg.vocab_size, jnp.int32
        )
        c2 = cache
        logits = None
        for i in range(3):
            logits, c2 = forward(
                params, cfg, toks[:, i:i + 1], c2, interpret=True
            )
        prefix = jax.random.randint(
            jax.random.PRNGKey(1), (1, 6), 0, cfg.vocab_size, jnp.int32
        )
        full = jnp.concatenate([prefix, toks], axis=1)
        fresh = kvcache.create(
            cfg.num_layers, 1, cfg.num_kv_heads, 128, cfg.head_dim,
            quantized=False,
        )
        want, _ = forward(params, cfg, full, fresh, interpret=False)
        r = np.asarray(want, np.float32)
        m = np.asarray(logits, np.float32)
        rel = np.linalg.norm(m - r) / max(np.linalg.norm(r), 1e-9)
        assert rel < 2e-2, rel
