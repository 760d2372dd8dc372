"""Continuous batching engine: equivalence with single-stream generation,
interleaved admission, cancellation, capacity limits."""

import numpy as np
import pytest

import jax

from mnn_tpu.models.config import PRESETS, RuntimeConfig
from mnn_tpu.models.decoder import init_random_params
from mnn_tpu.runtime.batch_engine import BatchEngine, Status
from mnn_tpu.runtime.llm import Llm

CFG = PRESETS["tiny"]


@pytest.fixture(scope="module")
def params():
    return init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)


def _engine(params, batch=3, **kw):
    rt = RuntimeConfig(
        max_batch=batch, max_seq_len=64, prefill_chunk=16, decode_block=4,
        sampler="greedy", kv_quant=False, max_new_tokens=8, **kw
    )
    return BatchEngine(CFG, params, rt)


def _single_reference(params, prompt, n):
    rt = RuntimeConfig(max_batch=1, max_seq_len=64, prefill_chunk=16,
                       decode_block=4, sampler="greedy", kv_quant=False)
    llm = Llm(CFG, params, rt)
    return list(llm.stream(token_ids=prompt, max_new_tokens=n))


class TestBatchEngine:
    def test_single_request_matches_llm(self, params):
        prompt = [3, 7, 11, 2]
        want = _single_reference(params, prompt, 8)
        eng = _engine(params, batch=2)
        got = eng.generate(prompt, 8)
        assert got == want, (got, want)

    def test_concurrent_requests_match_sequential(self, params):
        prompts = [[3, 7, 11, 2], [9, 1, 4], [5, 5, 5, 5, 5]]
        wants = [_single_reference(params, p, 8) for p in prompts]
        eng = _engine(params, batch=3)
        reqs = [eng.submit(p, 8) for p in prompts]
        eng.run_until_idle()
        for req, want in zip(reqs, wants):
            assert req.status == Status.DONE
            got = [t for t in req.generated][: len(want)]
            assert got == want, (got, want)

    def test_more_requests_than_slots(self, params):
        prompts = [[i + 1, i + 2, i + 3] for i in range(5)]
        eng = _engine(params, batch=2)
        reqs = [eng.submit(p, 4) for p in prompts]
        eng.run_until_idle()
        assert all(r.status == Status.DONE for r in reqs)
        assert all(len(r.generated) >= 1 for r in reqs)

    def test_late_arrival_joins_batch(self, params):
        eng = _engine(params, batch=2)
        r1 = eng.submit([1, 2, 3], 12)
        eng.step()  # r1 admitted + decoding
        r2 = eng.submit([4, 5, 6], 4)
        eng.run_until_idle()
        assert r1.status == Status.DONE and r2.status == Status.DONE
        # r2's output must equal its solo generation despite joining late
        want = _single_reference(params, [4, 5, 6], 4)
        assert r2.generated[: len(want)] == want

    def test_cancellation(self, params):
        eng = _engine(params, batch=1)
        r1 = eng.submit([1, 2, 3], 8)
        eng.cancel(r1.rid)
        r2 = eng.submit([2, 3, 4], 4)
        eng.run_until_idle()
        assert r1.status == Status.CANCELLED
        assert r2.status == Status.DONE

    def test_eos_frees_slot(self, params):
        eng = _engine(params, batch=1)
        # every generated token is EOS -> finishes after the first token
        eng.eos_ids = set(range(CFG.vocab_size))
        r = eng.submit([1, 2, 3], 8)
        eng.run_until_idle()
        assert r.status == Status.DONE
        assert len(r.generated) == 1
        assert eng.slots[0] is None
