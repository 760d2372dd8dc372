"""OmniQuant (quant/omni_quant.py): learned clipping + equivalent scaling
beat plain RTN reconstruction error; LET folds stay float-exact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.quant.omni_quant import omni_quantize
from mnn_tpu.quant.quantize import dequantize, quantize


def _case(seed=0, s=128, k=64, n=32, outliers=True):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(s, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.1
    if outliers:
        hot = rng.choice(k, size=4, replace=False)
        x[:, hot] *= 15.0               # activation outliers (LET target)
        wh = rng.choice(k * n, size=8, replace=False)
        w.reshape(-1)[wh] *= 10.0       # weight outliers (LWC target)
    return jnp.asarray(x), jnp.asarray(w)


def _recon_err(x, w, ql, s=None):
    wq = dequantize(ql, dtype=jnp.float32)
    xs = x if s is None else x / s
    return float(jnp.mean((xs @ wq - x @ w) ** 2))


class TestOmniQuant:
    def test_beats_rtn(self):
        x, w = _case()
        base = _recon_err(x, w, quantize(w, bits=4, block_size=32))
        ql, s = omni_quantize(x=x, w=w, bits=4, block_size=32, iters=150)
        learned = _recon_err(x, w, ql, s=s)
        assert learned < base * 0.8, (learned, base)

    def test_lwc_only_beats_rtn(self):
        x, w = _case(seed=1)
        base = _recon_err(x, w, quantize(w, bits=4, block_size=32))
        ql, s = omni_quantize(x=x, w=w, bits=4, block_size=32, let=False,
                              iters=150)
        assert np.allclose(np.asarray(s), 1.0)
        learned = _recon_err(x, w, ql)
        assert learned < base, (learned, base)

    def test_let_fold_exact_in_float(self):
        x, w = _case(seed=2)
        _, s = omni_quantize(x=x, w=w, bits=4, block_size=32, iters=50)
        y0 = np.asarray(x @ w)
        y1 = np.asarray((x / s) @ (w * s[:, None]))
        np.testing.assert_allclose(y1, y0, rtol=2e-4, atol=2e-4)

    def test_sym_mode(self):
        x, w = _case(seed=3)
        base = _recon_err(x, w, quantize(w, bits=4, block_size=32, sym=True))
        ql, s = omni_quantize(x=x, w=w, bits=4, block_size=32, sym=True,
                              iters=150)
        assert ql.bits == 4
        learned = _recon_err(x, w, ql, s=s)
        assert learned < base, (learned, base)

    def test_output_format_invariants(self):
        x, w = _case(seed=4)
        ql, _ = omni_quantize(x=x, w=w, bits=4, block_size=32, iters=20)
        assert ql.scale.dtype == jnp.bfloat16
        assert ql.bias.dtype == jnp.bfloat16
        assert ql.packed.dtype == jnp.int8
        assert ql.shape == (64, 32)
