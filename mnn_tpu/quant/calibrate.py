"""Offline PTQ calibration: KL / EMA activation-scale search + ADMM weights.

Equivalent of the reference's quantization toolchain
(/root/reference/tools/quantization/: calibration.cpp feature-map scale
search with KL / ADMM / EMA methods via TensorStatistic.cpp histograms,
quantizeWeight.cpp ADMM weight quantization, CLI quantized.out).

* `HistogramObserver` accumulates |x| histograms across calibration batches
  (TensorStatistic's 2048-bin design).
* `kl_scale` sweeps clip thresholds and keeps the one minimizing the KL
  divergence between the original and the int8-requantized distribution —
  the MNN/TensorRT threshold rule (calibration.cpp `computeScaleKL`).
* `ema_scale` is the simple moving-absmax observer (`computeScaleEMA`).
* `admm_quantize_weight` alternates closed-form scale / projection steps to
  minimize ||W - s*q||^2 per block (quantizeWeight.cpp ADMM mode); returns
  a standard QuantizedLinear so kernels are unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.quant.quantize import (
    QuantizedLinear,
    _check_args,
    choose_block_size,
    pack_int4,
)


class HistogramObserver:
    """Accumulates an |x| histogram over calibration batches."""

    def __init__(self, bins: int = 2048):
        self.bins = bins
        self.absmax = 0.0
        self.hist: Optional[np.ndarray] = None

    def update(self, x) -> None:
        ax = np.abs(np.asarray(x, np.float32)).reshape(-1)
        mx = float(ax.max()) if ax.size else 0.0
        if mx == 0.0:
            return
        if self.hist is None or mx > self.absmax:
            # rebin the existing histogram onto the wider range
            old_hist, old_max = self.hist, self.absmax
            self.absmax = max(mx, self.absmax)
            self.hist = np.zeros(self.bins, np.float64)
            if old_hist is not None:
                centers = (np.arange(self.bins) + 0.5) * old_max / self.bins
                idx = np.minimum(
                    (centers / self.absmax * self.bins).astype(int),
                    self.bins - 1)
                np.add.at(self.hist, idx, old_hist)
        h, _ = np.histogram(ax, bins=self.bins, range=(0.0, self.absmax))
        self.hist += h

    def scale(self, method: str = "kl", levels: int = 128) -> float:
        if self.hist is None:
            return 1.0
        if method == "max":
            return self.absmax / (levels - 1)
        return kl_scale(self.hist, self.absmax, levels)


def _kl_divergence(p: np.ndarray, q: np.ndarray) -> float:
    mask = p > 0
    qm = np.where(q > 0, q, 1e-12)
    return float(np.sum(p[mask] * np.log(p[mask] / qm[mask])))


def kl_scale(hist: np.ndarray, absmax: float, levels: int = 128) -> float:
    """MNN/TensorRT KL threshold sweep (calibration.cpp computeScaleKL).

    Returns the int8 scale (threshold / (levels-1)).
    """
    hist = np.asarray(hist, np.float64)
    bins = hist.size
    best_div, best_t = np.inf, bins
    for t in range(levels, bins + 1, max(1, bins // 256)):
        # reference distribution: clip everything past t into bin t-1
        p = hist[:t].copy()
        p[t - 1] += hist[t:].sum()
        if p.sum() == 0:
            continue
        p /= p.sum()
        # candidate: requantize the first t bins onto `levels` buckets
        chunk = t / levels
        q = np.zeros(t, np.float64)
        for i in range(levels):
            lo, hi = int(i * chunk), max(int((i + 1) * chunk), int(i * chunk) + 1)
            seg = hist[lo:hi]
            nz = (seg > 0).sum()
            if nz:
                q[lo:hi] = np.where(seg > 0, seg.sum() / nz, 0)
        if q.sum() == 0:
            continue
        q /= q.sum()
        d = _kl_divergence(p, q)
        if d < best_div:
            best_div, best_t = d, t
    threshold = (best_t + 0.5) * absmax / bins
    return threshold / (levels - 1)


class EmaObserver:
    """Exponential-moving-average absmax (calibration.cpp computeScaleEMA)."""

    def __init__(self, decay: float = 0.99):
        self.decay = decay
        self.val: Optional[float] = None

    def update(self, x) -> None:
        mx = float(np.abs(np.asarray(x)).max())
        self.val = mx if self.val is None else (
            self.decay * self.val + (1 - self.decay) * mx)

    def scale(self, levels: int = 128) -> float:
        return (self.val or 1.0) / (levels - 1)


def ema_scale(batches, decay: float = 0.99, levels: int = 128) -> float:
    obs = EmaObserver(decay)
    for b in batches:
        obs.update(b)
    return obs.scale(levels)


def admm_quantize_weight(
    w,
    bits: int = 4,
    block_size: int = 128,
    iters: int = 30,
    out_bias=None,
    act_bits: int = 16,
) -> QuantizedLinear:
    """Symmetric per-block ADMM weight quantization (quantizeWeight.cpp).

    Alternates q = clip(round(W/s)) and the least-squares scale
    s = <W, q> / <q, q> per (block, out-channel) — strictly reduces
    ||W - s q||^2 each step, beating absmax-derived scales.
    """
    w = jnp.asarray(w, jnp.float32)
    k, n = w.shape
    block_size = choose_block_size(k, block_size)
    _check_args(k, bits, block_size)
    center = 1 << (bits - 1)
    qlim = center - 1
    nb = k // block_size
    blocks = w.reshape(nb, block_size, n)

    scale = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1) / qlim, 1e-12)

    def body(i, scale):
        q = jnp.clip(jnp.round(blocks / scale[:, None, :]), -qlim, qlim)
        num = jnp.sum(blocks * q, axis=1)
        den = jnp.maximum(jnp.sum(q * q, axis=1), 1e-12)
        return jnp.where(den > 1e-9, num / den, scale)

    scale = jax.lax.fori_loop(0, iters, body, scale)
    # round the solved scale to the bf16 storage grid FIRST, then quantize
    # against the rounded value, so q is optimal for exactly the (scale,
    # bias) the kernels read back (checkpoint format: bf16 planes,
    # quant/quantize.py module docstring)
    scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
    q = jnp.clip(jnp.round(blocks / scale[:, None, :]), -qlim, qlim)
    qu = (q + center).astype(jnp.int32).reshape(k, n)  # unsigned storage
    bias = -float(center) * scale  # exact in bf16 (power-of-2 multiple)
    if bits == 4:
        packed = pack_int4(qu, block_size)
    else:
        packed = jax.lax.bitcast_convert_type(qu.astype(jnp.uint8), jnp.int8)
    ob = None if out_bias is None else jnp.asarray(out_bias, jnp.float32)
    return QuantizedLinear(
        packed=packed, scale=scale.astype(jnp.bfloat16),
        bias=bias.astype(jnp.bfloat16), out_bias=ob, bits=bits,
        block_size=block_size, act_bits=act_bits,
    )
