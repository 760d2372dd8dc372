"""End-to-end runtime: Llm.synthetic -> stream/generate; samplers; KV control."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnn_tpu.models.config import RuntimeConfig
from mnn_tpu.runtime import sampler
from mnn_tpu.runtime.generate import prefill_buckets
from mnn_tpu.runtime.llm import Llm


def _tiny_llm(**kw):
    rt = RuntimeConfig(
        max_seq_len=128, prefill_chunk=32, decode_block=4, sampler="greedy",
        kv_quant=kw.pop("kv_quant", False), **kw
    )
    return Llm.synthetic("tiny", rt=rt)


class TestLlm:
    def test_generate_deterministic(self):
        llm = _tiny_llm()
        out1 = list(llm.stream("hello world", max_new_tokens=8))
        llm.reset()
        out2 = list(llm.stream("hello world", max_new_tokens=8))
        assert len(out1) == 8 or out1[-1] in llm.tokenizer.eos_ids
        assert out1 == out2

    def test_perf_counters(self):
        llm = _tiny_llm()
        _ = list(llm.stream("abcdef", max_new_tokens=4))
        assert llm.perf.prompt_len == 6
        assert llm.perf.gen_len >= 1
        assert llm.perf.prefill_s > 0 and llm.perf.decode_s > 0

    def test_rollback_and_continue(self):
        llm = _tiny_llm()
        _ = list(llm.stream("hello", max_new_tokens=4))
        n = llm.context_len
        llm.rollback(4)
        assert llm.context_len == n - 4

    def test_int8_kv_runtime(self):
        llm = _tiny_llm(kv_quant=True)
        out = list(llm.stream("hi", max_new_tokens=4))
        assert len(out) >= 1

    def test_prompt_continuation_context(self):
        # multi-turn: second call continues from cached context
        llm = _tiny_llm()
        _ = list(llm.stream("first", max_new_tokens=2))
        ctx = llm.context_len
        _ = list(llm.stream("second", max_new_tokens=2))
        assert llm.context_len > ctx


class TestPrefillBuckets:
    def test_buckets(self):
        assert prefill_buckets(100, 512) == [128]
        assert prefill_buckets(600, 512) == [512, 128]
        assert prefill_buckets(512, 512) == [512]
        assert prefill_buckets(5, 512, min_bucket=32) == [32]

    def test_bucket_count_logarithmic(self):
        shapes = set()
        for n in range(1, 2000):
            shapes.update(prefill_buckets(n, 512))
        assert len(shapes) <= 6  # bounded compiled-shape count


class TestSamplers:
    def _logits(self):
        rng = np.random.default_rng(0)
        return jnp.asarray(rng.standard_normal((2, 64)) * 3, jnp.float32)

    def test_greedy(self):
        lg = self._logits()
        tok, _ = sampler.sample(lg, jax.random.PRNGKey(0), sampler="greedy")
        np.testing.assert_array_equal(np.asarray(tok), np.argmax(np.asarray(lg), -1))

    def test_top_k_restricts(self):
        lg = self._logits()
        filtered = sampler.apply_top_k(lg, 5)
        assert (np.asarray(filtered) > -1e29).sum(axis=-1).max() == 5

    def test_top_p_keeps_head(self):
        lg = self._logits()
        filtered = sampler.apply_top_p(lg, 0.5)
        kept = np.asarray(filtered) > -1e29
        assert kept.sum() >= 2  # at least one per row
        # argmax always kept
        am = np.argmax(np.asarray(lg), -1)
        assert all(kept[i, am[i]] for i in range(2))

    def test_min_p(self):
        lg = self._logits()
        filtered = sampler.apply_min_p(lg, 0.5)
        kept = np.asarray(filtered) > -1e29
        am = np.argmax(np.asarray(lg), -1)
        assert all(kept[i, am[i]] for i in range(2))

    def test_penalty_downweights(self):
        lg = jnp.ones((1, 16), jnp.float32)
        st = sampler.make_state(1, window=8)
        st = sampler.record_token(st, jnp.asarray([3], jnp.int32))
        out = sampler.apply_penalty(lg, st, penalty=2.0)
        out = np.asarray(out)
        assert out[0, 3] == 0.5 and out[0, 4] == 1.0

    def test_tfs_typical_run(self):
        lg = self._logits()
        for fn, arg in ((sampler.apply_tfs, 0.9), (sampler.apply_typical, 0.9)):
            filtered = fn(lg, arg)
            kept = np.asarray(filtered) > -1e29
            assert kept.sum(axis=-1).min() >= 1

    def test_mixed_chain_samples(self):
        lg = self._logits()
        st = sampler.make_state(2)
        tok, st2 = sampler.sample(
            lg, jax.random.PRNGKey(1), st, sampler="mixed",
            temperature=0.8, top_k=10, top_p=0.9, min_p=0.05, penalty=1.1,
        )
        assert tok.shape == (2,)
        assert int(st2.pos) == 1
