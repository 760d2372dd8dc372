"""Prefix cache save/load: continuation from restored KV equals recompute."""

import numpy as np

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import PRESETS
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache
from mnn_tpu.runtime.prefix_cache import load_prefix, save_prefix

CFG = PRESETS["tiny"]


def _setup(quantized=False):
    params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
    cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 32,
                           CFG.head_dim, quantized=quantized)
    return params, cache


class TestPrefixCache:
    def test_roundtrip_continuation(self, tmp_path):
        params, cache = _setup()
        prompt = [5, 9, 2, 7, 3, 1]
        _, cache = forward(params, CFG, jnp.asarray([prompt], jnp.int32), cache)
        p = str(tmp_path / "prefix.npz")
        n = save_prefix(p, cache, prompt)
        assert n == len(prompt)

        _, fresh = _setup()
        restored, toks = load_prefix(p, fresh)
        assert toks == prompt
        assert int(restored.length[0]) == len(prompt)

        want, _ = forward(params, CFG, jnp.asarray([[8]], jnp.int32), cache)
        got, _ = forward(params, CFG, jnp.asarray([[8]], jnp.int32), restored)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=1e-4, atol=1e-5,
        )

    def test_quantized_roundtrip(self, tmp_path):
        params, cache = _setup(quantized=True)
        prompt = [4, 4, 2, 9]
        _, cache = forward(params, CFG, jnp.asarray([prompt], jnp.int32), cache)
        p = str(tmp_path / "q.npz")
        save_prefix(p, cache, prompt)
        _, fresh = _setup(quantized=True)
        restored, _ = load_prefix(p, fresh)
        want, _ = forward(params, CFG, jnp.asarray([[1]], jnp.int32), cache)
        got, _ = forward(params, CFG, jnp.asarray([[1]], jnp.int32), restored)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=1e-4, atol=1e-5,
        )

    def test_mode_mismatch_rejected(self, tmp_path):
        import pytest

        params, cache = _setup(quantized=True)
        _, cache = forward(params, CFG, jnp.asarray([[1, 2]], jnp.int32), cache)
        p = str(tmp_path / "m.npz")
        save_prefix(p, cache, [1, 2])
        _, fresh = _setup(quantized=False)
        with pytest.raises(ValueError, match="quantization mode"):
            load_prefix(p, fresh)
