"""KV host offload (runtime/kv_offload.py): shelve/restore round-trips
exactly, generation continues identically after a restore, LRU budget
spills to disk and reloads (reference KVCacheManager.hpp:35-56 size-limited
spill equivalent)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig, RuntimeConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache
from mnn_tpu.runtime.kv_offload import KVOffloadPool
from mnn_tpu.runtime.llm import Llm

CFG = ModelConfig(
    name="kvoff-test", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    tie_word_embeddings=True,
)


def _prefilled(quantized, seed=1, n=6):
    params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
    cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 32,
                           CFG.head_dim, quantized=quantized)
    toks = jax.random.randint(jax.random.PRNGKey(seed), (1, n), 0, 100,
                              jnp.int32)
    logits, cache = forward(params, CFG, toks, cache)
    return params, cache, toks, logits


class TestShelveRestore:
    @pytest.mark.parametrize("quantized", [False, True])
    def test_roundtrip_exact(self, quantized):
        params, cache, toks, _ = _prefilled(quantized)
        pool = KVOffloadPool()
        n = pool.shelve("s1", cache, toks[0].tolist())
        assert n == 6
        fresh = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 32,
                               CFG.head_dim, quantized=quantized)
        restored, tokens = pool.restore("s1", fresh)
        assert tokens == toks[0].tolist()
        assert int(restored.length[0]) == 6
        np.testing.assert_array_equal(
            np.asarray(restored.k[:, 0, :, :6], np.float32),
            np.asarray(cache.k[:, 0, :, :6], np.float32))
        np.testing.assert_array_equal(
            np.asarray(restored.v[:, 0, :, :6], np.float32),
            np.asarray(cache.v[:, 0, :, :6], np.float32))
        if quantized:
            np.testing.assert_array_equal(
                np.asarray(restored.k_scale[:, 0, :, :6]),
                np.asarray(cache.k_scale[:, 0, :, :6]))

    def test_generation_continues_identically(self):
        params, cache, toks, logits = _prefilled(False)
        nxt = jnp.asarray([[7]], jnp.int32)
        want, _ = forward(params, CFG, nxt, cache)

        pool = KVOffloadPool()
        pool.shelve("ctx", cache, toks[0].tolist())
        fresh = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 32,
                               CFG.head_dim, quantized=False)
        restored, _ = pool.restore("ctx", fresh)
        got, _ = forward(params, CFG, nxt, restored)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-5, atol=1e-5)

    def test_unknown_key(self):
        pool = KVOffloadPool()
        fresh = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 32,
                               CFG.head_dim, quantized=False)
        assert pool.restore("nope", fresh) is None
        assert "nope" not in pool


class TestBudgetAndSpill:
    def test_lru_spills_to_disk_and_reloads(self, tmp_path):
        params, cache, toks, _ = _prefilled(False)
        one = KVOffloadPool().shelve("probe", cache, toks[0].tolist())
        nbytes = KVOffloadPool()
        nbytes.shelve("probe", cache, toks[0].tolist())
        per = nbytes.bytes
        pool = KVOffloadPool(max_bytes=2 * per + per // 2,
                             spill_dir=str(tmp_path))
        for i in range(4):
            _, c_i, t_i, _ = _prefilled(False, seed=10 + i)
            pool.shelve(f"s{i}", c_i, t_i[0].tolist())
        st = pool.stats()
        assert st["entries"] <= 3 and st["spilled"] >= 1
        # a spilled entry restores transparently
        _, c0, t0, _ = _prefilled(False, seed=10)
        fresh = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 32,
                               CFG.head_dim, quantized=False)
        restored, tokens = pool.restore("s0", fresh)
        assert tokens == t0[0].tolist()
        np.testing.assert_array_equal(
            np.asarray(restored.k[:, 0, :, :6], np.float32),
            np.asarray(c0.k[:, 0, :, :6], np.float32))

    def test_drop(self):
        params, cache, toks, _ = _prefilled(False)
        pool = KVOffloadPool()
        pool.shelve("x", cache, toks[0].tolist())
        assert pool.drop("x")
        assert "x" not in pool and pool.bytes == 0


class TestLlmIntegration:
    def test_session_switch(self):
        rt = RuntimeConfig(max_seq_len=32, max_batch=1, prefill_chunk=8,
                           decode_block=2, sampler="greedy", kv_quant=False,
                           max_new_tokens=4)
        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
        llm = Llm(CFG, params, rt=rt)
        pool = KVOffloadPool()

        a = list(llm.stream(token_ids=[1, 2, 3], max_new_tokens=3))
        ctx_a = llm.context_len
        llm.shelve_context("A", pool)
        assert llm.context_len == 0

        list(llm.stream(token_ids=[9, 8], max_new_tokens=2))
        llm.shelve_context("B", pool)

        assert llm.restore_context("A", pool)
        assert llm.context_len == ctx_a
        # continuing session A reproduces the tokens a fresh non-shelved
        # run would produce
        llm2 = Llm(CFG, params, rt=rt)
        list(llm2.stream(token_ids=[1, 2, 3], max_new_tokens=3))
        cont = list(llm.stream(token_ids=[5], max_new_tokens=3))
        cont2 = list(llm2.stream(token_ids=[5], max_new_tokens=3))
        assert cont == cont2
