"""Color-space conversions (HWC uint8/float arrays).

Equivalent of the reference's format-convert blitters
(/root/reference/source/cv/ImageProcess.cpp + tools/cv imgproc/color):
RGB/BGR/RGBA/GRAY/YUV-NV12/NV21 conversions with the same BT.601 integer
coefficients the reference uses.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_bgr(img):
    return img[..., ::-1]


bgr_to_rgb = rgb_to_bgr


def rgb_to_gray(img):
    """BT.601: y = 0.299 R + 0.587 G + 0.114 B (reference uses 19595/38470/7471 >> 16)."""
    f = img.astype(jnp.float32)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    return y.astype(img.dtype) if img.dtype == jnp.uint8 else y


def gray_to_rgb(img):
    return jnp.stack([img, img, img], axis=-1)


def rgba_to_rgb(img):
    return img[..., :3]


def rgb_to_rgba(img, alpha=255):
    a = jnp.full(img.shape[:-1] + (1,), alpha, img.dtype)
    return jnp.concatenate([img, a], axis=-1)


def yuv_nv12_to_rgb(y, uv):
    """y [H, W], uv [H/2, W/2, 2] (U then V) -> RGB uint8 [H, W, 3]."""
    yf = y.astype(jnp.float32)
    u = uv[..., 0].astype(jnp.float32) - 128.0
    v = uv[..., 1].astype(jnp.float32) - 128.0
    u = jnp.repeat(jnp.repeat(u, 2, 0), 2, 1)[: yf.shape[0], : yf.shape[1]]
    v = jnp.repeat(jnp.repeat(v, 2, 0), 2, 1)[: yf.shape[0], : yf.shape[1]]
    r = yf + 1.402 * v
    g = yf - 0.344136 * u - 0.714136 * v
    b = yf + 1.772 * u
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def yuv_nv21_to_rgb(y, vu):
    return yuv_nv12_to_rgb(y, vu[..., ::-1])


CONVERSIONS = {
    ("rgb", "bgr"): rgb_to_bgr,
    ("bgr", "rgb"): bgr_to_rgb,
    ("rgb", "gray"): rgb_to_gray,
    ("bgr", "gray"): lambda x: rgb_to_gray(bgr_to_rgb(x)),
    ("gray", "rgb"): gray_to_rgb,
    ("rgba", "rgb"): rgba_to_rgb,
    ("rgb", "rgba"): rgb_to_rgba,
}


def cvt_color(img, src: str, dst: str):
    src, dst = src.lower(), dst.lower()
    if src == dst:
        return img
    fn = CONVERSIONS.get((src, dst))
    if fn is None:
        raise ValueError(f"unsupported conversion {src} -> {dst}")
    return fn(img)
