"""TQ4 4-bit codebook KV (runtime/kvcache.py kv_bits=4 + kv_codebook):
exact pack/unpack round-trip, Lloyd-Max beats uniform int4 on Gaussian
data, end-to-end decode quality (reference TurboQuant's 4-bit codebook
mode, compute/TurboQuant.hpp:5-24)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache
from mnn_tpu.runtime.kvcache import (TQ4_LEVELS, dequant_kv, quantize_kv4,
                                     quantize_kv4cb, unpack_kv4cb)

CFG = ModelConfig(
    name="tq4-test", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    tie_word_embeddings=True,
)


class TestTq4Codebook:
    def test_pack_unpack_exact(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5, 32))
        packed, scale = quantize_kv4cb(x)
        assert packed.shape == (2, 3, 5, 16)      # same layout as int4
        assert packed.dtype == jnp.int8
        vals = np.asarray(unpack_kv4cb(packed)).reshape(-1)
        lv = np.round(np.asarray(TQ4_LEVELS), 4)
        assert np.isin(np.round(vals, 4), lv).all()
        # fixpoint: re-quantizing the dequantized values keeps the codes
        deq = dequant_kv(packed, scale, 4, dtype=jnp.float32, codebook=True)
        p2, _ = quantize_kv4cb(deq)
        np.testing.assert_allclose(
            np.asarray(unpack_kv4cb(p2)), np.asarray(unpack_kv4cb(packed)),
            atol=1e-6)

    def test_beats_uniform_int4_on_gaussian(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 128))
        pu, su = quantize_kv4(x)
        du = np.asarray(dequant_kv(pu, su, 4, dtype=jnp.float32))
        pc, sc = quantize_kv4cb(x)
        dc = np.asarray(dequant_kv(pc, sc, 4, dtype=jnp.float32,
                                   codebook=True))
        xn = np.asarray(x)
        err_u = np.mean((du - xn) ** 2)
        err_c = np.mean((dc - xn) ** 2)
        # Lloyd-Max 16-level MSE for N(0,1) ≈ 0.0095 vs uniform-absmax
        # int4's ≈ 0.02+: the codebook must win clearly
        assert err_c < err_u * 0.8, (err_c, err_u)

    @pytest.mark.parametrize("rotate", [False, True])
    def test_tq4_decode_close_to_fp(self, rotate):
        import dataclasses

        cfg = dataclasses.replace(CFG, kv_rotate=rotate)
        params = init_random_params(cfg, jax.random.PRNGKey(0), scale=0.05)
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0,
                                  cfg.vocab_size, jnp.int32)
        ref_cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 32,
                                   cfg.head_dim, quantized=False)
        want, ref_cache = forward(params, cfg, toks, ref_cache)
        cb_cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 32,
                                  cfg.head_dim, quantized=True, kv_bits=4,
                                  kv_codebook=True)
        assert cb_cache.codebook and cb_cache.bits == 4
        got, cb_cache = forward(params, cfg, toks, cb_cache)
        rel = np.linalg.norm(np.asarray(got - want, np.float32)) / \
            np.linalg.norm(np.asarray(want, np.float32))
        assert rel < 0.15, rel
        # decode step on the codebook cache stays finite + close
        tok = jnp.argmax(got, axis=-1).astype(jnp.int32)[:, None]
        g2, _ = forward(params, cfg, tok, cb_cache)
        w2, _ = forward(params, cfg, tok, ref_cache)
        assert np.isfinite(np.asarray(g2)).all()
        rel2 = np.linalg.norm(np.asarray(g2 - w2, np.float32)) / \
            np.linalg.norm(np.asarray(w2, np.float32))
        assert rel2 < 0.18, rel2

    def test_tq4_beats_uniform_int4_end_to_end(self):
        """Aggregate logit error of TQ4 vs uniform int4 KV over a prompt."""
        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
        toks = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0,
                                  CFG.vocab_size, jnp.int32)
        ref_cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 32,
                                   CFG.head_dim, quantized=False)
        want, _ = forward(params, CFG, toks, ref_cache, all_logits=True)
        errs = {}
        for name, cb in (("uniform", False), ("tq4", True)):
            cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 32,
                                   CFG.head_dim, quantized=True, kv_bits=4,
                                   kv_codebook=cb)
            got, _ = forward(params, CFG, toks, cache, all_logits=True)
            errs[name] = float(np.linalg.norm(
                np.asarray(got - want, np.float32)))
        assert errs["tq4"] < errs["uniform"] * 1.05, errs
