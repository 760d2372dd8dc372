"""Multi-host layer: two-level mesh topology, cross-host batch placement,
and a 2x4 "two hosts x four chips" simulation on the virtual CPU mesh
(SURVEY.md §5.8 — the distributed component the single-device reference
lacks; BASELINE.json targets >=80% scaling on a 2-host slice)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig, RuntimeConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.parallel import multihost, tp
from mnn_tpu.runtime import kvcache

CFG = ModelConfig(
    name="mh-test", vocab_size=256, hidden_size=128, intermediate_size=256,
    num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
    tie_word_embeddings=True, attention_bias=True,
)


class TestTwoLevelMesh:
    def test_axes_and_shape(self):
        mesh = multihost.two_level_mesh(dp=2, tp=4)
        assert mesh.axis_names == ("dp", "tp")
        assert mesh.shape["dp"] == 2 and mesh.shape["tp"] == 4
        # contiguous per-host groups: each dp row is 4 consecutive devices
        devs = jax.devices()
        for r in range(2):
            assert list(mesh.devices[r]) == devs[r * 4:(r + 1) * 4]

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            multihost.two_level_mesh(dp=4, tp=4)

    def test_initialize_noop_without_config(self, monkeypatch):
        for k in ("MNN_TPU_COORDINATOR", "MNN_TPU_NUM_PROCESSES",
                  "MNN_TPU_PROCESS_ID"):
            monkeypatch.delenv(k, raising=False)
        assert multihost.initialize() is False

    def test_local_rows_single_process(self):
        # single process owns every dp row -> every batch row
        mesh = multihost.two_level_mesh(dp=2, tp=4)
        assert list(multihost.local_dp_rows(mesh)) == [0, 1]
        np.testing.assert_array_equal(
            multihost.local_batch_rows(mesh, 8), np.arange(8))

    def test_local_batch_rows_split(self):
        mesh = multihost.two_level_mesh(dp=2, tp=4)
        owners = multihost.process_of_dp_row(mesh)
        assert owners.shape == (2,)
        with pytest.raises(ValueError):
            multihost.local_batch_rows(mesh, 7)  # not divisible by dp


class TestTwoHostSimulation:
    """dp=2 over the simulated DCN axis x tp=4 over the simulated ICI axis:
    the full sharded forward must match single-device on the 2x4 mesh."""

    def test_dp2_tp4_forward_matches(self):
        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05,
                                    tp_shards=4)
        toks = jnp.asarray(
            np.random.default_rng(1).integers(0, 200, (4, 8)), jnp.int32)
        cache = kvcache.create(CFG.num_layers, 4, CFG.num_kv_heads, 16,
                               CFG.head_dim, quantized=False)
        want, _ = forward(params, CFG, toks, cache)

        mesh = multihost.two_level_mesh(dp=2, tp=4)
        fwd = tp.make_sharded_forward(CFG, mesh, quantized_kv=False,
                                      params=params)
        got, new_cache = fwd(tp.shard_params(params, CFG, mesh), toks,
                             tp.shard_cache(cache, mesh))
        rel = np.linalg.norm(np.asarray(got - want, np.float32)) / \
            np.linalg.norm(np.asarray(want, np.float32))
        assert rel < 2e-2, rel
        # decode step on the evolved cache still matches
        want2, _ = forward(params, CFG, toks[:, :1], new_cache)
        got2, _ = fwd(tp.shard_params(params, CFG, mesh), toks[:, :1],
                      new_cache)
        rel2 = np.linalg.norm(np.asarray(got2 - want2, np.float32)) / \
            np.linalg.norm(np.asarray(want2, np.float32))
        assert rel2 < 2e-2, rel2

    def test_engine_on_two_level_mesh(self):
        """BatchEngine serving across the simulated 2-host mesh: all slots
        local in single-process mode, generation deterministic."""
        from mnn_tpu.runtime.batch_engine import BatchEngine

        rt = RuntimeConfig(max_seq_len=32, max_batch=4, max_new_tokens=4,
                           prefill_chunk=8, decode_block=2,
                           sampler="greedy", kv_quant=False)
        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05,
                                    tp_shards=1)
        mesh = multihost.two_level_mesh(dp=2, tp=1)
        eng = BatchEngine(CFG, params, rt, mesh=mesh)
        assert eng.local_rows == set(range(4))
        reqs = [eng.submit([1, 2, 3], max_new_tokens=3) for _ in range(2)]
        eng.run_until_idle()
        for r in reqs:
            assert len(r.generated) == 3
