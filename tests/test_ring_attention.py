"""Ring attention (sequence parallel) vs single-device oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mnn_tpu.kernels.flash_attention import attention_xla_ref
from mnn_tpu.parallel.ring_attention import make_ring_attention, shard_seq


def _mesh(n, axis="sp"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), (axis,))


def _qkv(b=1, h=4, hkv=2, t=32, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, t, d)), jnp.float32)
    return q, k, v


class TestRingAttention:
    @pytest.mark.parametrize("n", [2, 4, 8])
    def test_causal_matches_oracle(self, n):
        mesh = _mesh(n)
        q, k, v = _qkv()
        want = attention_xla_ref(q, k, v, causal=True, q_offset=0)
        ring = make_ring_attention(mesh)
        got = ring(shard_seq(q, mesh), shard_seq(k, mesh), shard_seq(v, mesh))
        rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
        assert rel < 1e-4, rel

    def test_non_causal(self):
        mesh = _mesh(4)
        q, k, v = _qkv(seed=3)
        want = attention_xla_ref(q, k, v, causal=False)
        ring = make_ring_attention(mesh, causal=False)
        got = ring(shard_seq(q, mesh), shard_seq(k, mesh), shard_seq(v, mesh))
        rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
        assert rel < 1e-4, rel

    def test_gqa_groups(self):
        mesh = _mesh(4)
        q, k, v = _qkv(h=8, hkv=2, seed=5)
        want = attention_xla_ref(q, k, v, causal=True, q_offset=0)
        ring = make_ring_attention(mesh)
        got = ring(shard_seq(q, mesh), shard_seq(k, mesh), shard_seq(v, mesh))
        rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
        assert rel < 1e-4, rel
