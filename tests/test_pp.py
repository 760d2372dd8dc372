"""Pipeline parallelism vs single-device oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mnn_tpu.models.config import PRESETS
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.parallel import pp
from mnn_tpu.runtime import kvcache

CFG = PRESETS["tiny"]  # 2 layers


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), ("pp",))


class TestPipelineParallel:
    @pytest.mark.parametrize("stages", [2])
    def test_prefill_matches_single(self, stages):
        mesh = _mesh(stages)
        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
        toks = jnp.asarray(
            np.random.default_rng(1).integers(0, 200, (1, 8)), jnp.int32)
        cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 16,
                               CFG.head_dim, quantized=False)
        want, want_cache = forward(params, CFG, toks, cache)

        fwd = pp.make_pp_forward(CFG, mesh, quantized_kv=False, params=params)
        got, got_cache = fwd(pp.shard_params_pp(params, mesh), toks,
                             pp.shard_cache_pp(cache, mesh))
        rel = np.linalg.norm(np.asarray(got - want, np.float32)) / \
            np.linalg.norm(np.asarray(want, np.float32))
        assert rel < 2e-2, rel
        assert int(got_cache.length[0]) == 8

    def test_decode_after_prefill(self):
        mesh = _mesh(2)
        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
        toks = jnp.asarray([[3, 1, 4, 1, 5, 9]], jnp.int32)
        cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 16,
                               CFG.head_dim, quantized=False)
        fwd = pp.make_pp_forward(CFG, mesh, quantized_kv=False, params=params)
        sp = pp.shard_params_pp(params, mesh)
        sc = pp.shard_cache_pp(cache, mesh)
        _, sc = fwd(sp, toks, sc)
        got, _ = fwd(sp, toks[:, :1], sc)

        ref_cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 16,
                                   CFG.head_dim, quantized=False)
        _, ref_cache = forward(params, CFG, toks, ref_cache)
        want, _ = forward(params, CFG, toks[:, :1], ref_cache)
        rel = np.linalg.norm(np.asarray(got - want, np.float32)) / \
            np.linalg.norm(np.asarray(want, np.float32))
        assert rel < 2e-2, rel
