"""Image filtering: blur / separable & 2-D convolution / derivatives /
morphology / pyramids / bilateral.

Capability parity with the reference's imgproc filter family
(/root/reference/tools/cv/include/cv/imgproc/filter.hpp: blur, boxFilter,
GaussianBlur, getGaussianKernel, filter2D, sepFilter2D, Sobel, Scharr,
Laplacian, erode, dilate, getStructuringElement, pyrDown, pyrUp,
bilateralFilter, spatialGradient). TPU-native: every filter is an XLA
convolution / reduce-window over an [H, W, C] array, batched over channels
via feature groups — no per-pixel loops; borders use OpenCV's default
BORDER_REFLECT_101 (reflect without repeating the edge).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# getStructuringElement shapes (OpenCV/MNN enums)
MORPH_RECT, MORPH_CROSS, MORPH_ELLIPSE = 0, 1, 2


def _ensure_hwc(img):
    img = jnp.asarray(img)
    return img[..., None] if img.ndim == 2 else img, img.ndim == 2


def _pad_reflect101(x, ph, pw):
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((ph, ph), (pw, pw), (0, 0)), mode="reflect")


def filter2d(img, kernel, *, anchor: Optional[Tuple[int, int]] = None):
    """Correlate img [H,W(,C)] with kernel [kh, kw] (OpenCV filter2D
    semantics: correlation, not convolution)."""
    x, squeeze = _ensure_hwc(img)
    k = jnp.asarray(kernel, jnp.float32)
    kh, kw = k.shape
    ph, pw = kh // 2, kw // 2
    xp = _pad_reflect101(x.astype(jnp.float32), ph, pw)
    c = x.shape[-1]
    lhs = xp[None].transpose(0, 3, 1, 2)              # [1, C, H, W]
    rhs = jnp.broadcast_to(k[None, None], (c, 1, kh, kw))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        feature_group_count=c,
    )[0].transpose(1, 2, 0)
    out = out.astype(jnp.asarray(img).dtype) if jnp.issubdtype(
        jnp.asarray(img).dtype, jnp.floating) else out
    return out[..., 0] if squeeze else out


def sep_filter2d(img, kx, ky):
    """Separable filter: rows with kx then columns with ky."""
    kx = jnp.asarray(kx, jnp.float32).reshape(-1)
    ky = jnp.asarray(ky, jnp.float32).reshape(-1)
    out = filter2d(img, kx[None, :])
    return filter2d(out, ky[:, None])


_SMALL_GAUSS = {  # OpenCV small_gaussian_tab: fixed kernels for sigma<=0
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def get_gaussian_kernel(n: int, sigma: float) -> jnp.ndarray:
    """1-D Gaussian kernel, OpenCV getGaussianKernel semantics (including
    the sigma<=0 defaults: the fixed small-kernel table for n<=7, else
    sigma = 0.3*((n-1)*0.5 - 1) + 0.8)."""
    if sigma <= 0 and n in _SMALL_GAUSS:
        return jnp.asarray(_SMALL_GAUSS[n], jnp.float32)
    if sigma <= 0:
        sigma = 0.3 * ((n - 1) * 0.5 - 1) + 0.8
    xs = np.arange(n, dtype=np.float64) - (n - 1) / 2
    k = np.exp(-(xs ** 2) / (2 * sigma * sigma))
    return jnp.asarray(k / k.sum(), jnp.float32)


def gaussian_blur(img, ksize: Tuple[int, int], sigma_x: float,
                  sigma_y: float = 0.0):
    kw, kh = ksize
    kx = get_gaussian_kernel(kw, sigma_x)
    ky = get_gaussian_kernel(kh, sigma_y if sigma_y > 0 else sigma_x)
    return sep_filter2d(img, kx, ky)


def box_filter(img, ksize: Tuple[int, int], normalize: bool = True):
    kw, kh = ksize
    k = jnp.ones((kh, kw), jnp.float32)
    if normalize:
        k = k / (kh * kw)
    return filter2d(img, k)


def blur(img, ksize: Tuple[int, int]):
    return box_filter(img, ksize, normalize=True)


def sqr_box_filter(img, ksize: Tuple[int, int], normalize: bool = True):
    x, squeeze = _ensure_hwc(img)
    out = box_filter(x.astype(jnp.float32) ** 2, ksize, normalize=normalize)
    return out[..., 0] if squeeze else out


def get_deriv_kernels(dx: int, dy: int, ksize: int = 3):
    """Sobel derivative kernel pair (kx, ky), OpenCV getDerivKernels rule:
    the order-n difference kernel convolved with binomial smoothing up to
    length `ksize` (ksize=1 means the 3-point difference with no
    smoothing on the derivative axis)."""
    def k1(order):
        if order == 0:
            k = np.array([1.0])
        elif order == 1:
            k = np.array([-1.0, 0.0, 1.0])
        else:
            k = np.array([1.0, -2.0, 1.0])
            for _ in range(order - 2):
                k = np.convolve(k, np.array([-1.0, 0.0, 1.0]))
        target = 3 if ksize == 1 and order > 0 else max(ksize, 1)
        while len(k) < target:
            k = np.convolve(k, np.array([1.0, 2.0, 1.0]))
        return k

    return (jnp.asarray(k1(dx), jnp.float32),
            jnp.asarray(k1(dy), jnp.float32))


def sobel(img, dx: int, dy: int, ksize: int = 3, scale: float = 1.0):
    kx, ky = get_deriv_kernels(dx, dy, ksize)
    out = sep_filter2d(jnp.asarray(img, jnp.float32), kx, ky)
    return out * scale if scale != 1.0 else out


def scharr(img, dx: int, dy: int, scale: float = 1.0):
    kd = jnp.asarray([-1.0, 0.0, 1.0])
    ks = jnp.asarray([3.0, 10.0, 3.0])
    kx = kd if dx else ks
    ky = kd if dy else ks
    out = sep_filter2d(jnp.asarray(img, jnp.float32), kx, ky)
    return out * scale if scale != 1.0 else out


def laplacian(img, ksize: int = 1, scale: float = 1.0):
    if ksize == 1:
        k = jnp.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], jnp.float32)
        out = filter2d(jnp.asarray(img, jnp.float32), k)
    else:
        out = sobel(img, 2, 0, ksize) + sobel(img, 0, 2, ksize)
    return out * scale if scale != 1.0 else out


def spatial_gradient(img, ksize: int = 3):
    return sobel(img, 1, 0, ksize), sobel(img, 0, 1, ksize)


def get_structuring_element(shape: int, ksize: Tuple[int, int]) -> jnp.ndarray:
    kw, kh = ksize
    if shape == MORPH_RECT:
        return jnp.ones((kh, kw), jnp.uint8)
    if shape == MORPH_CROSS:
        e = np.zeros((kh, kw), np.uint8)
        e[kh // 2, :] = 1
        e[:, kw // 2] = 1
        return jnp.asarray(e)
    # ellipse: OpenCV's exact row-span rule (integer half-axes, rounded
    # half-width per row)
    r, c = kh // 2, kw // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    e = np.zeros((kh, kw), np.uint8)
    for i in range(kh):
        dy = i - r
        if abs(dy) <= r:
            dx = int(np.rint(c * math.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            e[i, max(c - dx, 0): min(c + dx + 1, kw)] = 1
    return jnp.asarray(e)


def _morph(img, kernel, op: str):
    """erode/dilate via reduce_window over the kernel's support (border:
    OpenCV uses +inf/-inf padding for erode/dilate respectively)."""
    x, squeeze = _ensure_hwc(img)
    k = np.asarray(kernel) > 0
    kh, kw = k.shape
    xf = x.astype(jnp.float32)
    pad_val = jnp.inf if op == "erode" else -jnp.inf
    xp = jnp.pad(xf, ((kh // 2, kh - 1 - kh // 2),
                      (kw // 2, kw - 1 - kw // 2), (0, 0)),
                 constant_values=pad_val)
    # windows [H, W, C, kh, kw] via shifted stacking (kernel support small)
    outs = []
    for i in range(kh):
        for j in range(kw):
            if k[i, j]:
                outs.append(xp[i:i + x.shape[0], j:j + x.shape[1]])
    stack = jnp.stack(outs)
    red = jnp.min(stack, 0) if op == "erode" else jnp.max(stack, 0)
    red = red.astype(x.dtype)
    return red[..., 0] if squeeze else red


def erode(img, kernel):
    return _morph(img, kernel, "erode")


def dilate(img, kernel):
    return _morph(img, kernel, "dilate")


def morphology_ex(img, op: str, kernel):
    """open | close | gradient | tophat | blackhat."""
    if op == "open":
        return dilate(erode(img, kernel), kernel)
    if op == "close":
        return erode(dilate(img, kernel), kernel)
    if op == "gradient":
        d = dilate(img, kernel).astype(jnp.float32)
        return d - erode(img, kernel).astype(jnp.float32)
    if op == "tophat":
        return jnp.asarray(img, jnp.float32) - \
            morphology_ex(img, "open", kernel).astype(jnp.float32)
    if op == "blackhat":
        return morphology_ex(img, "close", kernel).astype(jnp.float32) - \
            jnp.asarray(img, jnp.float32)
    raise ValueError(op)


_PYR_K = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]) / 256.0


def pyr_down(img):
    sm = filter2d(jnp.asarray(img, jnp.float32), jnp.asarray(_PYR_K))
    return sm[::2, ::2]


def pyr_up(img):
    x, squeeze = _ensure_hwc(jnp.asarray(img, jnp.float32))
    h, w, c = x.shape
    up = jnp.zeros((2 * h, 2 * w, c), jnp.float32)
    up = up.at[::2, ::2].set(x)
    out = filter2d(up, jnp.asarray(4.0 * _PYR_K))
    return out[..., 0] if squeeze else out


def bilateral_filter(img, d: int, sigma_color: float, sigma_space: float):
    """Edge-preserving smoothing: spatial Gaussian x range Gaussian.
    Window diameter d (<=0 -> from sigma_space, OpenCV rule)."""
    x, squeeze = _ensure_hwc(jnp.asarray(img, jnp.float32))
    if d <= 0:
        d = max(int(round(sigma_space * 1.5)) * 2 + 1, 3)
    r = d // 2
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    sw = np.exp(-(ys ** 2 + xs ** 2) / (2 * sigma_space ** 2))
    sw[ys ** 2 + xs ** 2 > r * r] = 0.0   # circular support (OpenCV)
    xp = _pad_reflect101(x, r, r)
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    inv2sc = 1.0 / (2 * sigma_color ** 2)
    h, w, _ = x.shape
    for i in range(d):
        for j in range(d):
            shifted = xp[i:i + h, j:j + w]
            wgt = float(sw[i, j]) * jnp.exp(
                -((shifted - x) ** 2) * inv2sc)
            num = num + wgt * shifted
            den = den + wgt
    out = num / den
    return out[..., 0] if squeeze else out
