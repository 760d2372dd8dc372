"""Generation timeout + logit_bias (reference llm.hpp:95-103 TIMEOUT,
generate.cpp:52-56 decode-loop deadline; llmconfig.hpp:517-520
logit_bias)."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig, RuntimeConfig
from mnn_tpu.runtime import sampler
from mnn_tpu.runtime.batch_engine import BatchEngine, Status
from mnn_tpu.runtime.llm import Llm

CFG = ModelConfig(
    name="tb-test", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    tie_word_embeddings=True,
)


def _llm(**rt_kw):
    from mnn_tpu.models.decoder import init_random_params

    rt = RuntimeConfig(max_seq_len=64, max_batch=1, prefill_chunk=16,
                       decode_block=4, sampler="greedy", kv_quant=False,
                       max_new_tokens=16, **rt_kw)
    params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
    return Llm(CFG, params, rt=rt)


class TestLogitBias:
    def test_sampler_bias_forces_token(self):
        logits = jnp.zeros((2, 16))
        bias = jnp.zeros((16,)).at[7].set(100.0)
        tok, _ = sampler.sample(logits, jax.random.PRNGKey(0),
                                sampler="greedy", logit_bias=bias)
        assert tok.tolist() == [7, 7]

    def test_sampler_bias_bans_token(self):
        logits = jnp.zeros((1, 16)).at[0, 3].set(10.0)
        bias = jnp.zeros((16,)).at[3].set(-1e9)
        tok, _ = sampler.sample(logits, jax.random.PRNGKey(0),
                                sampler="greedy", logit_bias=bias)
        assert tok[0] != 3

    def test_per_row_bias(self):
        logits = jnp.zeros((2, 16))
        bias = jnp.zeros((2, 16)).at[0, 5].set(50.0).at[1, 9].set(50.0)
        tok, _ = sampler.sample(logits, jax.random.PRNGKey(0),
                                sampler="greedy", logit_bias=bias)
        assert tok.tolist() == [5, 9]

    def test_llm_stream_respects_bias(self):
        llm = _llm(logit_bias=((11, 1000.0),))
        toks = list(llm.stream(token_ids=[1, 2, 3], max_new_tokens=5))
        assert toks == [11] * 5

    def test_engine_per_request_bias(self):
        rt = RuntimeConfig(max_seq_len=64, max_batch=2, prefill_chunk=16,
                           decode_block=2, sampler="greedy", kv_quant=False,
                           max_new_tokens=4)
        from mnn_tpu.models.decoder import init_random_params

        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
        eng = BatchEngine(CFG, params, rt)
        r_biased = eng.submit([1, 2], max_new_tokens=3,
                              logit_bias=((42, 1000.0),))
        r_plain = eng.submit([1, 2], max_new_tokens=3)
        eng.run_until_idle()
        assert r_biased.generated == [42, 42, 42]
        assert r_plain.generated != [42, 42, 42]


class TestTimeout:
    def test_llm_stream_timeout_stops_early(self):
        llm = _llm()
        t0 = time.perf_counter()
        toks = list(llm.stream(token_ids=[1, 2, 3], max_new_tokens=10_000,
                               timeout_s=1e-9))
        assert llm.perf.status == "timeout"
        # stopped after at most one decode block + its double-buffered peer
        assert len(toks) <= 2 * llm.rt.decode_block
        assert time.perf_counter() - t0 < 60

    def test_llm_stream_no_timeout_by_default(self):
        llm = _llm()
        toks = list(llm.stream(token_ids=[1, 2, 3], max_new_tokens=6))
        assert llm.perf.status == "ok"
        assert len(toks) == 6

    def test_engine_timeout_status(self):
        rt = RuntimeConfig(max_seq_len=64, max_batch=1, prefill_chunk=16,
                           decode_block=2, sampler="greedy", kv_quant=False,
                           max_new_tokens=10_000)
        from mnn_tpu.models.decoder import init_random_params

        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
        eng = BatchEngine(CFG, params, rt)
        req = eng.submit([1, 2, 3], max_new_tokens=10_000, timeout_s=1e-9)
        for _ in range(50):
            eng.step()
            if req.status == Status.TIMEOUT:
                break
        assert req.status == Status.TIMEOUT
        assert req.finished_at is not None
        # slot was reclaimed
        assert all(r is not req for r in eng.slots)
