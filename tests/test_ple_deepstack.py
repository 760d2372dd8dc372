"""PLE (gemma-3n per-layer embeddings) and deepstack (qwen3-VL multi-level
vision splicing) — the reference's Omni-side per-layer input mechanisms
(diskembedding.hpp:19 PLE; omni.hpp:150-183 / omni.cpp deepstack)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache

CFG = ModelConfig(
    name="ple-test", vocab_size=256, hidden_size=128, intermediate_size=256,
    num_layers=3, num_heads=4, num_kv_heads=2, head_dim=32,
    rope_theta=10000.0, attention_bias=False, tie_word_embeddings=True,
)


def _base():
    params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
    cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 64,
                           CFG.head_dim, quantized=False)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, 256,
                              jnp.int32)
    return params, cache, toks


def _with_ple(params, scale=0.05, zero=False):
    key = jax.random.PRNGKey(7)
    dim = 16
    table = jax.random.normal(
        key, (CFG.vocab_size, CFG.num_layers, dim), jnp.float32) * scale
    proj = jax.random.normal(
        jax.random.PRNGKey(8),
        (CFG.num_layers, dim, CFG.hidden_size), jnp.float32) * scale
    if zero:
        proj = jnp.zeros_like(proj)
    layers = dataclasses.replace(params.layers, ple_proj=proj)
    return dataclasses.replace(params, layers=layers, ple_table=table)


class TestPLE:
    def test_zero_proj_is_identity(self):
        params, cache, toks = _base()
        want, _ = forward(params, CFG, toks, cache)
        got, _ = forward(_with_ple(params, zero=True), CFG, toks, cache)
        assert np.allclose(np.asarray(want), np.asarray(got), atol=1e-5)

    def test_prefill_decode_consistent(self):
        """Prefill T then decode 1 must equal prefill T+1's last logits —
        the PLE addition has to be position-local and path-independent."""
        params, cache, toks = _base()
        p = _with_ple(params)
        full = jnp.concatenate(
            [toks, jnp.asarray([[42]], jnp.int32)], axis=1)
        want, _ = forward(p, CFG, full, cache)
        _, cache2 = forward(p, CFG, toks, cache)
        got, _ = forward(p, CFG, jnp.asarray([[42]], jnp.int32), cache2)
        rel = np.linalg.norm(np.asarray(got) - np.asarray(want)) / \
            np.linalg.norm(np.asarray(want))
        assert rel < 2e-2, rel

    def test_changes_output(self):
        params, cache, toks = _base()
        base, _ = forward(params, CFG, toks, cache)
        got, _ = forward(_with_ple(params), CFG, toks, cache)
        assert not np.allclose(np.asarray(base), np.asarray(got), atol=1e-3)


class TestDeepstack:
    def test_zero_features_identity_and_splice_changes(self):
        params, cache, toks = _base()
        want, _ = forward(params, CFG, toks, cache)
        ds0 = jnp.zeros((2, 1, 10, CFG.hidden_size), jnp.float32)
        got, _ = forward(params, CFG, toks, cache, deepstack=ds0)
        assert np.allclose(np.asarray(want), np.asarray(got), atol=1e-5)
        ds = jax.random.normal(jax.random.PRNGKey(3),
                               (2, 1, 10, CFG.hidden_size)) * 0.05
        # text positions zeroed, "image" positions 3..6 carry features —
        # the reference builds exactly this layout (omni.cpp deepstacksTxt)
        mask = jnp.zeros((1, 10, 1)).at[:, 3:7].set(1.0)
        changed, _ = forward(params, CFG, toks, cache, deepstack=ds * mask)
        assert not np.allclose(np.asarray(want), np.asarray(changed),
                               atol=1e-3)
