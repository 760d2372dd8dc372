"""Cross-device continuous batching: the engine's batch dimension sharded
over a dp mesh axis must generate exactly what the unsharded engine does
(BASELINE config 5: continuous batching scheduled across hosts)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from mnn_tpu.models.config import PRESETS, RuntimeConfig
from mnn_tpu.models.decoder import init_random_params
from mnn_tpu.runtime.batch_engine import BatchEngine, Status

CFG = PRESETS["tiny"]


@pytest.fixture(scope="module")
def params():
    return init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)


def _rt():
    return RuntimeConfig(max_batch=4, max_seq_len=64, prefill_chunk=16,
                         decode_block=2, sampler="greedy", kv_quant=False,
                         max_new_tokens=8)


class TestDpEngine:
    def test_sharded_matches_unsharded(self, params):
        prompts = [[3, 7, 11, 2], [9, 1, 4], [5, 5, 5, 5], [8, 2]]
        ref = BatchEngine(CFG, params, _rt())
        ref_reqs = [ref.submit(p, 8) for p in prompts]
        ref.run_until_idle()
        wants = [r.generated for r in ref_reqs]

        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("dp",))
        eng = BatchEngine(CFG, params, _rt(), mesh=mesh)
        reqs = [eng.submit(p, 8) for p in prompts]
        eng.run_until_idle()
        for req, want in zip(reqs, wants):
            assert req.status == Status.DONE
            assert req.generated == want, (req.generated, want)

    def test_batch_not_divisible_rejected(self, params):
        mesh = Mesh(np.array(jax.devices()[:3]).reshape(3), ("dp",))
        with pytest.raises(ValueError):
            BatchEngine(CFG, params, _rt(), mesh=mesh)

    def test_admission_across_shards(self, params):
        """More requests than slots with the batch spread over devices."""
        mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("dp",))
        eng = BatchEngine(CFG, params, _rt(), mesh=mesh)
        reqs = [eng.submit([i + 1, i + 2], 4) for i in range(7)]
        eng.run_until_idle()
        for r in reqs:
            assert r.status == Status.DONE
            assert len(r.generated) == 4
