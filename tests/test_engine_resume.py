"""Serving checkpoint/resume: a killed engine restarts mid-decode and
continues every in-flight request exactly (SURVEY.md §5.3/§5.4 TPU
equivalents: restartable serving loop from KV checkpoints)."""

import numpy as np
import pytest

import jax

from mnn_tpu.models.config import PRESETS, RuntimeConfig
from mnn_tpu.models.decoder import init_random_params
from mnn_tpu.runtime.batch_engine import BatchEngine, Status

CFG = PRESETS["tiny"]


@pytest.fixture(scope="module")
def params():
    return init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)


def _rt(**kw):
    return RuntimeConfig(max_batch=3, max_seq_len=64, prefill_chunk=16,
                         decode_block=2, sampler="greedy", kv_quant=False,
                         max_new_tokens=12, **kw)


class TestEngineResume:
    def test_resume_matches_uninterrupted(self, params, tmp_path):
        prompts = [[3, 7, 11, 2], [9, 1, 4]]
        # uninterrupted run
        ref = BatchEngine(CFG, params, _rt())
        ref_reqs = [ref.submit(p, 12) for p in prompts]
        ref.run_until_idle()
        wants = [r.generated for r in ref_reqs]

        # interrupted run: a few steps, snapshot, "crash", resume
        eng = BatchEngine(CFG, params, _rt())
        reqs = [eng.submit(p, 12) for p in prompts]
        eng.step()  # admits + first decode block
        eng.step()
        snap = str(tmp_path / "engine.npz")
        eng.snapshot(snap)
        partial = [list(r.generated) for r in reqs]
        assert any(0 < len(p) < 12 for p in partial)
        del eng

        eng2 = BatchEngine.resume(snap, CFG, params, _rt())
        assert [r.rid for r in eng2.slots if r] == \
            [r.rid for r in reqs if r.slot >= 0]
        eng2.run_until_idle()
        for rid, want in zip([r.rid for r in reqs], wants):
            got = eng2.requests[rid].generated
            assert got == want, (got, want)
            assert eng2.requests[rid].status == Status.DONE

    def test_waiting_queue_survives(self, params, tmp_path):
        eng = BatchEngine(CFG, params, RuntimeConfig(
            max_batch=1, max_seq_len=64, prefill_chunk=16, decode_block=2,
            sampler="greedy", kv_quant=False, max_new_tokens=6))
        a = eng.submit([1, 2, 3], 6)
        b = eng.submit([4, 5, 6], 6)   # no free slot: stays waiting
        eng.step()
        snap = str(tmp_path / "engine.npz")
        eng.snapshot(snap)
        eng2 = BatchEngine.resume(snap, CFG, params, RuntimeConfig(
            max_batch=1, max_seq_len=64, prefill_chunk=16, decode_block=2,
            sampler="greedy", kv_quant=False, max_new_tokens=6))
        eng2.run_until_idle()
        assert eng2.requests[a.rid].status == Status.DONE
        assert eng2.requests[b.rid].status == Status.DONE
        assert len(eng2.requests[b.rid].generated) == 6

    def test_quantized_cache_roundtrip(self, params, tmp_path):
        rt = RuntimeConfig(max_batch=2, max_seq_len=64, prefill_chunk=16,
                           decode_block=2, sampler="greedy", kv_quant=True,
                           max_new_tokens=8)
        eng = BatchEngine(CFG, params, rt)
        r = eng.submit([2, 4, 6, 8], 8)
        eng.step()
        snap = str(tmp_path / "q.npz")
        eng.snapshot(snap)
        want_rest = None
        eng.run_until_idle()
        want = eng.requests[r.rid].generated

        eng2 = BatchEngine.resume(snap, CFG, params, rt)
        eng2.run_until_idle()
        assert eng2.requests[r.rid].generated == want

    def test_extensionless_path_roundtrips(self, params, tmp_path):
        """np.savez appends .npz to bare str paths; snapshot() must write
        EXACTLY the given path or serve()'s resume check misses it."""
        import os
        eng = BatchEngine(CFG, params, _rt())
        eng.submit([1, 2], 4)
        eng.step()
        snap = str(tmp_path / "state")   # no extension, like --snapshot state
        eng.snapshot(snap)
        assert os.path.exists(snap) and not os.path.exists(snap + ".npz")
        eng2 = BatchEngine.resume(snap, CFG, params, _rt())
        eng2.run_until_idle()

    def test_mode_mismatch_rejected(self, params, tmp_path):
        eng = BatchEngine(CFG, params, _rt())
        eng.submit([1, 2], 4)
        eng.step()
        snap = str(tmp_path / "m.npz")
        eng.snapshot(snap)
        qrt = RuntimeConfig(max_batch=3, max_seq_len=64, prefill_chunk=16,
                            decode_block=2, sampler="greedy", kv_quant=True,
                            max_new_tokens=12)
        with pytest.raises(ValueError):
            BatchEngine.resume(snap, CFG, params, qrt)
