"""TQ3-class 3-bit codebook KV (runtime/kvcache.py kv_bits=3): exact
pack/unpack round-trip, Lloyd-Max beats uniform 3-bit on Gaussian data,
rotation+codebook end-to-end decode quality (reference TurboQuant TQ3,
compute/TurboQuant.hpp:5-24)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache
from mnn_tpu.runtime.kvcache import (TQ3_LEVELS, dequant_kv, quantize_kv3,
                                     unpack_kv3)

CFG = ModelConfig(
    name="kv3-test", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    tie_word_embeddings=True,
)


class TestCodebook:
    def test_pack_unpack_exact(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5, 32))
        packed, scale = quantize_kv3(x)
        assert packed.shape == (2, 3, 5, 12)      # 32 * 3/8 bytes
        assert packed.dtype == jnp.int8
        vals = unpack_kv3(packed)
        # every unpacked value is exactly a codebook level
        lv = np.asarray(TQ3_LEVELS)
        v = np.asarray(vals).reshape(-1)
        assert np.isin(np.round(v, 4), np.round(lv, 4)).all()
        # round-trip: re-quantizing the dequantized values is a fixpoint
        deq = dequant_kv(packed, scale, 3, dtype=jnp.float32)
        p2, s2 = quantize_kv3(deq)
        # scales differ (rms of quantized vals) but CODES must map back
        np.testing.assert_allclose(
            np.asarray(unpack_kv3(p2) * s2[..., None]),
            np.asarray(deq), rtol=0.2, atol=0.2)

    def test_beats_uniform_3bit_on_gaussian(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 2, 64, 32)).astype(np.float32))
        packed, scale = quantize_kv3(x)
        deq = np.asarray(dequant_kv(packed, scale, 3, dtype=jnp.float32))
        err_cb = np.mean((deq - np.asarray(x)) ** 2)
        # uniform 8-level absmax quantizer on the same rows
        xf = np.asarray(x)
        amax = np.abs(xf).max(-1, keepdims=True)
        su = amax / 3.5
        q = np.clip(np.round(xf / su), -4, 3)
        err_u = np.mean((q * su - xf) ** 2)
        assert err_cb < err_u, (err_cb, err_u)

    def test_snr_reasonable(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 128, 64))
        packed, scale = quantize_kv3(x)
        deq = np.asarray(dequant_kv(packed, scale, 3, dtype=jnp.float32))
        rel = np.linalg.norm(deq - np.asarray(x)) / np.linalg.norm(x)
        assert rel < 0.25, rel        # ~3.4-bit Lloyd-Max SNR on N(0,1)


class TestEndToEnd:
    @pytest.mark.parametrize("rotate", [False, True])
    def test_kv3_decode_close_to_fp(self, rotate):
        """Sanity bound only: random-weight tiny models amplify 3-bit noise
        far beyond trained checkpoints (the codebook-optimality tests above
        carry the accuracy claim; the reference pairs TQ3 with trained
        near-Gaussian KV)."""
        import dataclasses

        cfg = dataclasses.replace(CFG, kv_rotate=rotate)
        params = init_random_params(cfg, jax.random.PRNGKey(0), scale=0.05)
        toks = jnp.asarray([[5, 9, 2, 7, 11, 3]], jnp.int32)

        ref_cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 16,
                                   cfg.head_dim, quantized=False)
        want, rc = forward(params, cfg, toks, ref_cache)

        c3 = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 16,
                            cfg.head_dim, quantized=True, kv_bits=3)
        got, c3 = forward(params, cfg, toks, c3)
        rel = np.linalg.norm(np.asarray(got - want, np.float32)) / \
            np.linalg.norm(np.asarray(want, np.float32))
        assert rel < 0.25, (rotate, rel)
        # decode continuation stays sane
        g2, _ = forward(params, cfg, jnp.asarray([[4]], jnp.int32), c3)
        w2, _ = forward(params, cfg, jnp.asarray([[4]], jnp.int32), rc)
        rel2 = np.linalg.norm(np.asarray(g2 - w2, np.float32)) / \
            np.linalg.norm(np.asarray(w2, np.float32))
        assert rel2 < 0.3, (rotate, rel2)

    def test_capacity_bytes_smaller_than_int4(self):
        c3 = kvcache.create(2, 1, 2, 64, 64, quantized=True, kv_bits=3)
        c4 = kvcache.create(2, 1, 2, 64, 64, quantized=True, kv_bits=4)
        assert c3.k.nbytes < c4.k.nbytes
        assert c3.k.shape[-1] == 24 and c4.k.shape[-1] == 32
