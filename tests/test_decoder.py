"""Decoder forward: shapes, cache consistency (prefill vs decode parity).

Mirrors the reference's model tests (/root/reference/test/model/TransformerTest.cpp):
the key property checked is that incremental decode against the KV cache
produces the same logits as a fresh full-context prefill.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.models.config import PRESETS
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache

CFG = PRESETS["tiny"]


def _params(bits=4):
    return init_random_params(CFG, jax.random.PRNGKey(0), quant_bits=bits, scale=0.05)


def _cache(batch=1, cap=64, quantized=False):
    return kvcache.create(
        CFG.num_layers, batch, CFG.num_kv_heads, cap, CFG.head_dim,
        quantized=quantized,
    )


class TestForward:
    def test_prefill_shapes(self):
        params = _params()
        cache = _cache()
        tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
        logits, cache2 = forward(params, CFG, tokens, cache)
        assert logits.shape == (1, CFG.vocab_size)
        assert int(cache2.length[0]) == 8
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_all_logits(self):
        params = _params()
        logits, _ = forward(
            params, CFG, jnp.asarray([[1, 2, 3, 4]], jnp.int32), _cache(),
            all_logits=True,
        )
        assert logits.shape == (1, 4, CFG.vocab_size)

    def test_decode_matches_prefill(self):
        # logits(context + next) via incremental decode == via full prefill
        params = _params()
        toks = np.array([[5, 9, 2, 7, 3, 1, 8, 4]], np.int32)
        full, _ = forward(
            params, CFG, jnp.asarray(toks), _cache(), all_logits=True
        )
        cache = _cache()
        _, cache = forward(params, CFG, jnp.asarray(toks[:, :7]), cache)
        inc, cache = forward(params, CFG, jnp.asarray(toks[:, 7:8]), cache)
        got = np.asarray(inc[0], np.float32)
        want = np.asarray(full[0, -1], np.float32)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 2e-2, rel
        assert int(cache.length[0]) == 8

    def test_decode_matches_prefill_int8_kv(self):
        params = _params()
        toks = np.array([[5, 9, 2, 7, 3, 1, 8, 4]], np.int32)
        full, _ = forward(
            params, CFG, jnp.asarray(toks), _cache(quantized=True),
            all_logits=True,
        )
        cache = _cache(quantized=True)
        _, cache = forward(params, CFG, jnp.asarray(toks[:, :7]), cache)
        inc, _ = forward(params, CFG, jnp.asarray(toks[:, 7:8]), cache)
        got = np.asarray(inc[0], np.float32)
        want = np.asarray(full[0, -1], np.float32)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-2, rel

    def test_chunked_prefill_matches(self):
        # two prefill chunks == one prefill (reference chunk_limits semantics)
        params = _params()
        toks = np.array([[5, 9, 2, 7, 3, 1, 8, 4]], np.int32)
        one, _ = forward(params, CFG, jnp.asarray(toks), _cache())
        cache = _cache()
        _, cache = forward(params, CFG, jnp.asarray(toks[:, :4]), cache)
        two, _ = forward(params, CFG, jnp.asarray(toks[:, 4:]), cache)
        rel = np.linalg.norm(np.asarray(one - two)) / np.linalg.norm(np.asarray(one))
        assert rel < 2e-2, rel

    def test_rollback(self):
        params = _params()
        toks = np.array([[5, 9, 2, 7, 3, 1, 8, 4]], np.int32)
        cache = _cache()
        _, cache = forward(params, CFG, jnp.asarray(toks), cache)
        cache = kvcache.rollback(cache, 4)
        assert int(cache.length[0]) == 4
        # re-decoding token 4 after rollback == original logits at that point
        redo, _ = forward(params, CFG, jnp.asarray(toks[:, 4:5]), cache)
        cache2 = _cache()
        _, cache2 = forward(params, CFG, jnp.asarray(toks[:, :4]), cache2)
        orig, _ = forward(params, CFG, jnp.asarray(toks[:, 4:5]), cache2)
        rel = np.linalg.norm(np.asarray(redo - orig)) / np.linalg.norm(np.asarray(orig))
        assert rel < 1e-2, rel
