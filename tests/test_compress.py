"""QAT + pruning (mnncompress equivalent): STE gradients, grid parity with
the inference quantizer, pruning masks and schedules, end-to-end QAT
training improving the deployed-quantized loss."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mnn_tpu.quant.quantize import dequantize, quantize
from mnn_tpu.train.compress import (PruneSpec, apply_mask, fake_quant_weight,
                                    fake_quant_activation, gmp_sparsity,
                                    prune_mask, qat_linear, sparsity_of)


class TestFakeQuant:
    def test_matches_inference_grid(self):
        """QAT forward values == deploy-time dequantize(quantize(w))."""
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.3
        for sym in (False, True):
            fq = fake_quant_weight(w, bits=4, block_size=32, sym=sym)
            ql = quantize(np.asarray(w), bits=4, block_size=32, sym=sym)
            deq = dequantize(ql)
            np.testing.assert_allclose(np.asarray(fq), np.asarray(deq),
                                       atol=1e-5, rtol=1e-4)

    def test_ste_gradient_is_identity_through_round(self):
        from mnn_tpu.train.compress import _ste_round
        x = jax.random.normal(jax.random.PRNGKey(1), (32,))
        c = jax.random.normal(jax.random.PRNGKey(2), (32,))
        g = jax.grad(lambda x: jnp.sum(_ste_round(x) * c))(x)
        # straight-through: d round(x)/dx == 1 everywhere
        np.testing.assert_allclose(np.asarray(g), np.asarray(c), atol=1e-6)

    def test_fake_quant_gradient_usable(self):
        """End-to-end grad through fake_quant_weight is finite, nonzero,
        and descends the quantized loss."""
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16)) * 0.2
        target = jax.random.normal(jax.random.PRNGKey(3), (32, 16)) * 0.2

        def loss(w):
            return jnp.mean(
                (fake_quant_weight(w, bits=4, block_size=16) - target) ** 2)

        g = jax.grad(loss)(w)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.linalg.norm(g)) > 0
        before, after = loss(w), loss(w - 0.1 * g)
        assert float(after) < float(before)

    def test_activation_fake_quant_error_small(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 128))
        xq = fake_quant_activation(x, bits=8)
        rel = jnp.linalg.norm(x - xq) / jnp.linalg.norm(x)
        assert float(rel) < 0.01


class TestPrune:
    def test_unstructured_sparsity(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
        m = prune_mask(w, PruneSpec(sparsity=0.75))
        assert abs(sparsity_of(m) - 0.75) < 0.01
        # keeps the largest magnitudes
        kept = np.abs(np.asarray(w))[np.asarray(m) > 0]
        dropped = np.abs(np.asarray(w))[np.asarray(m) == 0]
        assert kept.min() >= dropped.max() - 1e-6

    def test_structured_channels(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
        m = prune_mask(w, PruneSpec(sparsity=0.5, structured=True))
        cols = np.asarray(m).mean(axis=0)
        assert set(np.unique(cols)) <= {0.0, 1.0}
        assert abs(1 - cols.mean() - 0.5) < 0.1

    def test_blocked_prune(self):
        w = jax.random.normal(jax.random.PRNGKey(2), (64, 8))
        m = np.asarray(prune_mask(w, PruneSpec(sparsity=0.5, block=4)))
        # mask constant within each K-block of 4
        mb = m.reshape(16, 4, 8)
        assert (mb == mb[:, :1]).all()

    def test_mask_gradient_blocks_pruned(self):
        w = jax.random.normal(jax.random.PRNGKey(3), (16, 16))
        mask = prune_mask(w, PruneSpec(sparsity=0.5))

        def loss(w):
            return jnp.sum(apply_mask(w, mask) ** 2)

        g = np.asarray(jax.grad(loss)(w))
        assert (g[np.asarray(mask) == 0] == 0).all()
        assert (g[np.asarray(mask) > 0] != 0).any()

    def test_gmp_schedule(self):
        assert gmp_sparsity(0, target=0.8, begin=10, end=100) == 0.0
        assert gmp_sparsity(100, target=0.8, begin=10, end=100) == 0.8
        mid = gmp_sparsity(55, target=0.8, begin=10, end=100)
        assert 0.0 < mid < 0.8
        # monotone
        vals = [gmp_sparsity(s, target=0.8, begin=10, end=100)
                for s in range(0, 120, 5)]
        assert all(b >= a for a, b in zip(vals, vals[1:]))


class TestQatTraining:
    def test_qat_closes_the_deployment_gap(self):
        """The point of QAT: the loss optimized during training IS the
        deployed (really-quantized) loss — zero train/deploy gap — while a
        float-trained model pays a quantization penalty at deployment."""
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (256, 32))
        w_true = jax.random.normal(k2, (32, 16)) * 0.5
        y = x @ w_true

        def deployed_loss(w):
            ql = quantize(np.asarray(w), bits=4, block_size=32)
            return float(jnp.mean((x @ dequantize(ql) - y) ** 2))

        def train(use_qat):
            w = jax.random.normal(k3, (32, 16)) * 0.1

            def loss(w):
                pred = (qat_linear(x, w, bits=4, block_size=32)
                        if use_qat else x @ w)
                return jnp.mean((pred - y) ** 2)

            g = jax.jit(jax.grad(loss))
            for _ in range(1500):
                w = w - 0.2 * g(w)
            return w, float(jax.jit(loss)(w))

        w_f, train_f = train(False)
        w_q, train_q = train(True)
        # float training converges but pays a deployment penalty
        gap_float = deployed_loss(w_f) - train_f
        assert gap_float > 1e-3, gap_float
        # QAT's training loss equals its deployed loss (same grid)
        gap_qat = abs(deployed_loss(w_q) - train_q)
        assert gap_qat < 1e-5, gap_qat
        # and QAT actually learned (far below init loss)
        assert train_q < 0.5
