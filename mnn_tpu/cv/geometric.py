"""Geometric image transforms: resize, crop, flip, pad, warpAffine.

Equivalent of the reference's tools/cv imgproc/geometric + the affine
resampling core of ImageProcess (/root/reference/source/cv/Matrix_CV.cpp
affine matrices + CPUImageProcess bilinear samplers). warp_affine maps
output pixels through the INVERSE transform and bilinearly samples — same
convention as the reference/OpenCV (cv2.warpAffine with WARP_INVERSE_MAP
off means the matrix maps src->dst; we accept the src->dst matrix and
invert internally like OpenCV does).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _ensure_hwc(img):
    return img[..., None] if img.ndim == 2 else img


def resize(img, size: Tuple[int, int], method: str = "bilinear"):
    """size = (height, width). uint8 in -> uint8 out."""
    h, w = size
    x = _ensure_hwc(img)
    out = jax.image.resize(
        x.astype(jnp.float32), (h, w, x.shape[-1]),
        "nearest" if method == "nearest" else "linear",
    )
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    if img.ndim == 2:
        out = out[..., 0]
    return out


def crop(img, y: int, x: int, h: int, w: int):
    return img[y : y + h, x : x + w]


def center_crop(img, size: Tuple[int, int]):
    h, w = size
    H, W = img.shape[:2]
    y = max((H - h) // 2, 0)
    x = max((W - w) // 2, 0)
    return crop(img, y, x, h, w)


def flip(img, horizontal: bool = True):
    return img[:, ::-1] if horizontal else img[::-1]


def rotate90(img, k: int = 1):
    return jnp.rot90(img, k=k, axes=(0, 1))


def pad(img, top: int, bottom: int, left: int, right: int, value=0):
    widths = [(top, bottom), (left, right)] + [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, widths, constant_values=value)


def get_affine_transform(center, angle_deg: float, scale: float = 1.0,
                         translate=(0.0, 0.0)) -> np.ndarray:
    """2x3 rotation matrix (cv2.getRotationMatrix2D semantics)."""
    a = np.deg2rad(angle_deg)
    alpha, beta = scale * np.cos(a), scale * np.sin(a)
    cx, cy = center
    return np.array([
        [alpha, beta, (1 - alpha) * cx - beta * cy + translate[0]],
        [-beta, alpha, beta * cx + (1 - alpha) * cy + translate[1]],
    ], np.float32)


def _invert_affine(m: np.ndarray) -> np.ndarray:
    a = np.vstack([m, [0, 0, 1]]).astype(np.float64)
    return np.linalg.inv(a)[:2].astype(np.float32)


def warp_affine(img, matrix, out_size: Tuple[int, int],
                method: str = "bilinear", fill=0.0):
    """matrix: 2x3 src->dst affine; out_size = (height, width)."""
    oh, ow = out_size
    x = _ensure_hwc(img).astype(jnp.float32)
    h, w, c = x.shape
    inv = jnp.asarray(_invert_affine(np.asarray(matrix)))
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]

    if method == "nearest":
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix = jnp.clip(ix, 0, w - 1)
        iy = jnp.clip(iy, 0, h - 1)
        out = jnp.where(valid[..., None], x[iy, ix], fill)
    else:
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0

        def sample(yy, xx):
            valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
            xi = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
            return jnp.where(valid[..., None], x[yi, xi], fill)

        out = (
            sample(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
            + sample(y0, x0 + 1) * (fx * (1 - fy))[..., None]
            + sample(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
            + sample(y0 + 1, x0 + 1) * (fx * fy)[..., None]
        )

    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    if img.ndim == 2:
        out = out[..., 0]
    return out
