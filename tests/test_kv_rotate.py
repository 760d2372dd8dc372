"""Hadamard KV rotation (WHT half of the reference's TurboQuant TQ3/TQ4,
/root/reference/source/backend/cpu/compute/TurboQuant.hpp:5-24)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import RuntimeConfig
from mnn_tpu.models.layers import hadamard, rotate_heads
from mnn_tpu.runtime import generate as gen
from mnn_tpu.runtime import kvcache
from mnn_tpu.runtime.llm import Llm

PROMPT = [3, 1, 4, 1, 5, 9, 2, 6] * 4


def _prefill_logits(kv_quant, kv_bits=8, kv_rotate=False):
    rt = RuntimeConfig(
        max_seq_len=128, prefill_chunk=32, decode_block=4, sampler="greedy",
        kv_quant=kv_quant, kv_bits=kv_bits, kv_rotate=kv_rotate,
    )
    llm = Llm.synthetic("tiny", rt=rt)
    lg, _ = gen.run_prefill(
        llm.params, llm.config, llm.rt, jnp.asarray([PROMPT], jnp.int32),
        llm.cache,
    )
    return np.asarray(lg[0], np.float32)


class TestHadamard:
    def test_orthonormal(self):
        for d in (32, 64, 128):
            h = np.asarray(hadamard(d))
            np.testing.assert_allclose(h @ h.T, np.eye(d), atol=1e-5)

    def test_rotate_inverse(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64), jnp.float32)
        back = rotate_heads(rotate_heads(x), inverse=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)

    def test_requires_power_of_two(self):
        with pytest.raises(ValueError):
            hadamard(48)


class TestRotationInvariance:
    def test_bf16_cache_logits_unchanged(self):
        """With an unquantized cache, rotation must be a numerical no-op."""
        base = _prefill_logits(kv_quant=False)
        rot = _prefill_logits(kv_quant=False, kv_rotate=True)
        np.testing.assert_allclose(rot, base, atol=0.05, rtol=0.05)

    def test_decode_consistent(self):
        rt = lambda r: RuntimeConfig(
            max_seq_len=128, prefill_chunk=32, decode_block=4,
            sampler="greedy", kv_quant=False, kv_rotate=r,
        )
        a = list(Llm.synthetic("tiny", rt=rt(False)).stream(
            token_ids=PROMPT, max_new_tokens=12))
        b = list(Llm.synthetic("tiny", rt=rt(True)).stream(
            token_ids=PROMPT, max_new_tokens=12))
        assert len(b) == 12
        # bf16 rounding in the rotate matmuls can flip knife-edge argmaxes
        # with random weights; require agreement on most steps
        agree = sum(x == y for x, y in zip(a, b))
        assert agree >= 9, (a, b)


class TestOutlierFlattening:
    def test_int4_error_drops_on_outlier_channels(self):
        """Per-channel outliers (the real-model K pattern) dominate the
        per-token absmax; rotation spreads them across the head dim."""
        key = jax.random.PRNGKey(7)
        x = jax.random.normal(key, (1, 2, 64, 64), jnp.float32)
        x = x.at[..., 0].mul(20.0)  # one hot channel
        x = x.at[..., 17].mul(12.0)

        def err(y):
            q, s = kvcache.quantize_kv4(y)
            deq = kvcache.unpack_kv4(q) * s[..., None]
            return float(jnp.mean((deq - y) ** 2))

        e_plain = err(x)
        xr = rotate_heads(x)
        q, s = kvcache.quantize_kv4(xr)
        deq = rotate_heads(kvcache.unpack_kv4(q) * s[..., None], inverse=True)
        e_rot = float(jnp.mean((deq - x) ** 2))
        assert e_rot < e_plain * 0.5, (e_rot, e_plain)

    def test_e2e_int4_rotate_tracks_bf16(self):
        base = _prefill_logits(kv_quant=False)
        rot4 = _prefill_logits(kv_quant=True, kv_bits=4, kv_rotate=True)
        corr = np.corrcoef(rot4, base)[0, 1]
        assert corr > 0.9, corr
