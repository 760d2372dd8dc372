"""Embedding + reranker APIs (reference embedding_demo / reranker_demo)."""

import numpy as np
import pytest
import jax

from mnn_tpu.models.config import PRESETS, RuntimeConfig
from mnn_tpu.models.decoder import init_random_params
from mnn_tpu.runtime.llm import Llm

CFG = PRESETS["tiny"]


@pytest.fixture(scope="module")
def llm():
    params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
    return Llm(CFG, params, RuntimeConfig(max_batch=1, max_seq_len=64,
                                          prefill_chunk=16, decode_block=2,
                                          sampler="greedy", kv_quant=False))


class TestEmbed:
    def test_normalized_and_deterministic(self, llm):
        a = llm.embed(token_ids=[3, 1, 4, 1, 5])
        b = llm.embed(token_ids=[3, 1, 4, 1, 5])
        assert a.shape == (CFG.hidden_size,)
        np.testing.assert_allclose(np.linalg.norm(a), 1.0, atol=1e-5)
        np.testing.assert_array_equal(a, b)

    def test_distinguishes_inputs(self, llm):
        a = llm.embed(token_ids=[3, 1, 4])
        b = llm.embed(token_ids=[9, 9, 9])
        assert float(np.dot(a, b)) < 0.999

    def test_mean_pooling_differs_from_last(self, llm):
        a = llm.embed(token_ids=[3, 1, 4, 1, 5], pooling="last")
        b = llm.embed(token_ids=[3, 1, 4, 1, 5], pooling="mean")
        assert not np.allclose(a, b)

    def test_does_not_touch_chat_cache(self, llm):
        before = llm.context_len
        llm.embed(token_ids=[1, 2, 3])
        assert llm.context_len == before


class TestRerank:
    def test_cosine_self_ranks_first(self, llm):
        # identical doc should score highest under cosine reranking
        q = [5, 6, 7]
        docs_ids = [[5, 6, 7], [30, 31, 32], [9, 8]]
        qv = llm.embed(token_ids=q)
        scores = [float(np.dot(qv, llm.embed(token_ids=d)))
                  for d in docs_ids]
        assert np.argmax(scores) == 0
        np.testing.assert_allclose(scores[0], 1.0, atol=1e-5)

    def test_token_logit_mode(self, llm):
        scores = llm.rerank("q", ["aa", "bb"], yes_token_id=7)
        assert len(scores) == 2
        assert all(s <= 0.0 for s in scores)  # log-probs
        assert np.isfinite(scores).all()
