"""Quantization tooling: HQQ, SmoothQuant, KL/EMA/ADMM calibration
(reference: tools/quantization calibration.cpp + quantizeWeight.cpp,
llmexport --hqq/--smooth)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.quant import calibrate, smooth
from mnn_tpu.quant.hqq import quantize_hqq
from mnn_tpu.quant.quantize import dequantize, matmul_dequant_ref, quantize


def _heavy_tailed(shape, seed=0, df=3.0):
    rng = np.random.RandomState(seed)
    return (rng.standard_t(df, size=shape) * 0.05).astype(np.float32)


class TestHqq:
    def test_beats_rtn_on_heavy_tails(self):
        w = _heavy_tailed((256, 64))
        rtn = quantize(w, bits=4, block_size=64)
        hqq = quantize_hqq(w, bits=4, block_size=64, iters=25)
        e_rtn = float(jnp.mean((dequantize(rtn) - w) ** 2))
        e_hqq = float(jnp.mean((dequantize(hqq) - w) ** 2))
        # HQQ optimizes an l_p objective; it must not be (meaningfully)
        # worse in MSE and typically wins on heavy tails
        assert e_hqq <= e_rtn * 1.02, (e_hqq, e_rtn)

    def test_grid_and_matmul(self):
        w = _heavy_tailed((128, 32), seed=1)
        ql = quantize_hqq(w, bits=4, block_size=64)
        x = jnp.asarray(np.random.RandomState(2).randn(4, 128), jnp.float32)
        got = matmul_dequant_ref(x.astype(jnp.bfloat16), ql)
        want = x @ dequantize(ql)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.15, rtol=0.1,
        )

    def test_int8_storage_convention(self):
        w = _heavy_tailed((128, 16), seed=3)
        ql = quantize_hqq(w, bits=8, block_size=64)
        err = float(jnp.abs(dequantize(ql) - w).max())
        # 8-bit reconstruction must be tight — catches storage mismatches
        assert err < float(ql.scale.max()) * 1.5, err


class TestSmoothQuant:
    def test_fold_is_exact_in_float(self):
        rng = np.random.RandomState(0)
        k, n, t = 64, 32, 8
        gamma = rng.rand(k).astype(np.float32) + 0.5
        w = rng.randn(k, n).astype(np.float32)
        x = rng.randn(t, k).astype(np.float32)
        act_max = np.abs(x).max(axis=0)

        new_gamma, new_w, s = smooth.fold_smoothing(gamma, {"w": w}, act_max)
        # rms_norm(x)*gamma @ w == rms_norm(x)*gamma' @ w' exactly
        def rms(x, g):
            return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6) * g

        base = rms(x, gamma) @ w
        folded = rms(x, new_gamma) @ new_w["w"]
        np.testing.assert_allclose(folded, base, rtol=1e-4, atol=1e-4)

    def test_reduces_w8a8_error_with_outlier_channels(self):
        rng = np.random.RandomState(1)
        k, n, t = 128, 64, 16
        w = rng.randn(k, n).astype(np.float32) * 0.05
        x = rng.randn(t, k).astype(np.float32)
        x[:, 7] *= 50.0   # outlier activation channels (the LLM pattern)
        x[:, 66] *= 30.0
        act_max = np.abs(x).max(axis=0)

        def w8a8_err(xs, ws):
            sx = np.abs(xs).max(axis=1, keepdims=True) / 127.0
            qx = np.clip(np.round(xs / sx), -127, 127)
            sw = np.abs(ws).max(axis=0, keepdims=True) / 127.0
            qw = np.clip(np.round(ws / sw), -127, 127)
            approx = (qx * sx) @ (qw * sw)
            return float(np.mean((approx - x @ w) ** 2))

        base = w8a8_err(x, w)
        s = smooth.smooth_scales(act_max, np.abs(w).max(axis=1))
        smoothed = w8a8_err(x / s[None, :], w * s[:, None])
        assert smoothed < base * 0.5, (smoothed, base)

    def test_collect_act_stats_torch(self):
        import torch.nn as tnn

        m = tnn.Sequential(tnn.Embedding(16, 8), tnn.Linear(8, 8))
        stats = smooth.collect_act_stats_torch(m, [[1, 2, 3]])
        assert "1" in stats and stats["1"].shape == (8,)


class TestCalibration:
    def test_kl_clips_rare_outliers(self):
        rng = np.random.RandomState(2)
        x = rng.randn(100_000).astype(np.float32)
        x[:20] *= 100.0  # 0.02% huge outliers
        obs = calibrate.HistogramObserver()
        obs.update(x)
        kl = obs.scale("kl")
        mx = obs.scale("max")
        assert kl < mx * 0.2, (kl, mx)
        # KL trades rare-outlier error for inlier resolution: on the inlier
        # mass (99.98% of values) its int8 MSE must beat the absmax scale
        inliers = x[20:]

        def err(s):
            q = np.clip(np.round(inliers / s), -127, 127)
            return float(np.mean((q * s - inliers) ** 2))

        assert err(kl) < err(mx) * 0.1, (err(kl), err(mx))

    def test_histogram_rebinning(self):
        obs = calibrate.HistogramObserver(bins=128)
        obs.update(np.ones(10) * 0.5)
        total_before = obs.hist.sum()
        obs.update(np.ones(10) * 2.0)  # forces range growth + rebin
        assert obs.absmax == 2.0
        assert obs.hist.sum() == total_before + 10

    def test_ema_observer(self):
        s = calibrate.ema_scale([np.ones(4) * v for v in (1.0, 1.0, 1.0)])
        assert abs(s - 1.0 / 127.0) < 1e-6

    def test_admm_beats_absmax_rtn(self):
        w = _heavy_tailed((256, 64), seed=4)
        rtn = quantize(w, bits=4, block_size=64, sym=True)
        admm = calibrate.admm_quantize_weight(w, bits=4, block_size=64)
        e_rtn = float(jnp.mean((dequantize(rtn) - w) ** 2))
        e_admm = float(jnp.mean((dequantize(admm) - w) ** 2))
        assert e_admm < e_rtn, (e_admm, e_rtn)

    def test_admm_matmul_grid(self):
        w = _heavy_tailed((128, 32), seed=5)
        ql = calibrate.admm_quantize_weight(w, bits=8, block_size=64)
        x = jnp.asarray(np.random.RandomState(6).randn(4, 128), jnp.float32)
        got = matmul_dequant_ref(x.astype(jnp.bfloat16), ql)
        want = x @ dequantize(ql)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.15, rtol=0.1,
        )
