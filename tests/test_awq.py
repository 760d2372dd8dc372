"""AWQ/GPTQ ingestion: unpack exactness on synthesized packed tensors."""

import numpy as np

from mnn_tpu.convert.awq import (
    _AWQ_ORDER,
    dequantize_awq_layer,
    load_awq_weight,
    unpack_awq,
    unpack_gptq,
)


def _pack_awq_axis1(q):
    """Reference packing: nibble at shift 4*i holds element order[i]."""
    k, n = q.shape
    out = np.zeros((k, n // 8), np.uint32)
    for i in range(8):
        out |= (q[:, _AWQ_ORDER[i]::8].astype(np.uint32) & 0xF) << (4 * i)
    return out.view(np.int32)


def _pack_seq_axis0(q):
    k, n = q.shape
    out = np.zeros((k // 8, n), np.uint32)
    for i in range(8):
        out |= (q[i::8].astype(np.uint32) & 0xF) << (4 * i)
    return out.view(np.int32)


def _pack_seq_axis1(q):
    k, n = q.shape
    out = np.zeros((k, n // 8), np.uint32)
    for i in range(8):
        out |= (q[:, i::8].astype(np.uint32) & 0xF) << (4 * i)
    return out.view(np.int32)


class TestAwqUnpack:
    def test_awq_roundtrip(self):
        rng = np.random.default_rng(0)
        K, N, G = 64, 32, 16
        q = rng.integers(0, 16, (K, N)).astype(np.uint8)
        z = rng.integers(0, 16, (K // G, N)).astype(np.uint8)
        s = rng.uniform(0.01, 0.1, (K // G, N)).astype(np.float32)
        qw = _pack_awq_axis1(q)
        qz = _pack_awq_axis1(z)
        q2, s2, z2 = unpack_awq(qw, qz, s)
        np.testing.assert_array_equal(q2, q)
        np.testing.assert_array_equal(z2, z)
        w = dequantize_awq_layer(q2, s2, z2, G)
        want = (q.reshape(K // G, G, N).astype(np.float32)
                - z[:, None].astype(np.float32)) * s[:, None]
        np.testing.assert_allclose(w, want.reshape(K, N), rtol=1e-6)

    def test_gptq_roundtrip(self):
        rng = np.random.default_rng(1)
        K, N, G = 64, 32, 16
        q = rng.integers(0, 16, (K, N)).astype(np.uint8)
        z = rng.integers(0, 16, (K // G, N)).astype(np.uint8)
        s = rng.uniform(0.01, 0.1, (K // G, N)).astype(np.float32)
        q2, s2, z2 = unpack_gptq(_pack_seq_axis0(q), _pack_seq_axis1(z), s)
        np.testing.assert_array_equal(q2, q)
        np.testing.assert_array_equal(z2, z)

    def test_gptq_v1_zero_offset(self):
        """AutoGPTQ v1 checkpoints store zero-1 in qzeros: the loader must
        add the +1 back (gptq_v2=True skips it)."""
        rng = np.random.default_rng(3)
        K, N, G = 32, 32, 16
        q = rng.integers(0, 16, (K, N)).astype(np.uint8)
        true_z = rng.integers(1, 15, (K // G, N)).astype(np.uint8)
        s = rng.uniform(0.01, 0.1, (K // G, N)).astype(np.float32)
        tensors = {
            "layer.qweight": _pack_seq_axis0(q),
            "layer.qzeros": _pack_seq_axis1((true_z - 1).astype(np.uint8)),
            "layer.scales": s,
        }
        w, group = load_awq_weight(tensors, "layer")
        want = (q.reshape(K // G, G, N).astype(np.float32)
                - true_z[:, None].astype(np.float32)) * s[:, None]
        np.testing.assert_allclose(w, want.reshape(K, N), rtol=1e-6)
        # v2 stores true zeros directly
        tensors["layer.qzeros"] = _pack_seq_axis1(true_z)
        w2, _ = load_awq_weight(tensors, "layer", gptq_v2=True)
        np.testing.assert_allclose(w2, want.reshape(K, N), rtol=1e-6)

    def test_load_autodetect(self):
        rng = np.random.default_rng(2)
        K, N, G = 32, 64, 16
        q = rng.integers(0, 16, (K, N)).astype(np.uint8)
        z = rng.integers(0, 16, (K // G, N)).astype(np.uint8)
        s = rng.uniform(0.01, 0.1, (K // G, N)).astype(np.float32)
        tensors = {
            "layer.qweight": _pack_awq_axis1(q),
            "layer.qzeros": _pack_awq_axis1(z),
            "layer.scales": s,
        }
        w, group = load_awq_weight(tensors, "layer")
        assert group == G
        assert w.shape == (K, N)
        # grid reproduction through our quantizer (block = group, asym)
        import jax.numpy as jnp
        from mnn_tpu.quant.quantize import dequantize, quantize

        ql = quantize(w, bits=4, block_size=G, sym=False)
        back = np.asarray(dequantize(ql))
        step = np.repeat(np.asarray(ql.scale), G, axis=0)
        assert np.abs(back - w).max() <= step.max() * 0.51
