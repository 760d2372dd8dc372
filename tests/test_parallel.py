"""TP/DP sharded forward on the 8-device CPU mesh vs single-device oracle.

The TPU analog of the reference's backend-vs-CPU diff tests
(/root/reference/tools/cpp/backendTest.cpp): the sharded execution must
reproduce the unsharded logits.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnn_tpu.models.config import PRESETS
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.parallel import tp
from mnn_tpu.runtime import kvcache

# tiny-but-shardable config: 8 heads, 4 kv heads
CFG = dataclasses.replace(
    PRESETS["tiny"], name="tiny8", num_heads=8, num_kv_heads=4,
    intermediate_size=256, hidden_size=128, head_dim=32,
)


@pytest.fixture(scope="module")
def setup():
    params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05, tp_shards=8)
    toks = jnp.asarray(np.random.default_rng(1).integers(0, 200, (2, 8)), jnp.int32)
    return params, toks


@pytest.mark.parametrize("dp,tpn", [(1, 4), (2, 2), (2, 4), (1, 8)])
def test_sharded_matches_single(setup, dp, tpn):
    params, toks = setup
    if CFG.num_kv_heads % tpn:
        pytest.skip("tp does not divide kv heads")
    mesh = tp.make_mesh(dp=dp, tp=tpn)
    cache = kvcache.create(CFG.num_layers, 2, CFG.num_kv_heads, 32,
                           CFG.head_dim, quantized=False)

    want, _ = forward(params, CFG, toks, cache)

    fwd = tp.make_sharded_forward(CFG, mesh, quantized_kv=False, params=params)
    sp = tp.shard_params(params, CFG, mesh)
    sc = tp.shard_cache(cache, mesh)
    got, new_cache = fwd(sp, toks, sc)

    rel = np.linalg.norm(np.asarray(got - want, np.float32)) / np.linalg.norm(
        np.asarray(want, np.float32)
    )
    assert rel < 2e-2, rel
    assert int(new_cache.length[0]) == 8


def test_sharded_decode_after_prefill(setup):
    params, toks = setup
    mesh = tp.make_mesh(dp=1, tp=4)
    cache = kvcache.create(CFG.num_layers, 2, CFG.num_kv_heads, 32,
                           CFG.head_dim, quantized=False)
    fwd = tp.make_sharded_forward(CFG, mesh, quantized_kv=False, params=params)
    sp = tp.shard_params(params, CFG, mesh)
    sc = tp.shard_cache(cache, mesh)
    _, sc = fwd(sp, toks, sc)
    logits, sc = fwd(sp, toks[:, :1], sc)  # decode-ish step (T=1)

    want_cache = kvcache.create(CFG.num_layers, 2, CFG.num_kv_heads, 32,
                                CFG.head_dim, quantized=False)
    _, want_cache = forward(params, CFG, toks, want_cache)
    want, _ = forward(params, CFG, toks[:, :1], want_cache)
    rel = np.linalg.norm(np.asarray(logits - want, np.float32)) / np.linalg.norm(
        np.asarray(want, np.float32)
    )
    assert rel < 2e-2, rel
