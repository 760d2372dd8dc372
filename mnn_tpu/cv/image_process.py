"""ImageProcess: fused format-convert + affine + normalize pipeline.

Direct functional counterpart of the reference's `CV::ImageProcess`
(/root/reference/include/MNN/ImageProcess.hpp, source/cv/ImageProcess.cpp):
one configured object turns a raw camera/file image (any supported format)
into a normalized model-input tensor in a single fused jit graph — format
conversion, affine resample to the target size, then (x - mean) * normal,
emitting NCHW or NHWC float32/bf16.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.cv.color import cvt_color
from mnn_tpu.cv.geometric import resize, warp_affine


@dataclasses.dataclass
class ImageProcessConfig:
    source_format: str = "rgb"          # rgb|bgr|rgba|gray
    dest_format: str = "rgb"
    mean: Sequence[float] = (0.0, 0.0, 0.0)
    normal: Sequence[float] = (1.0, 1.0, 1.0)
    target_size: Optional[Tuple[int, int]] = None  # (H, W)
    matrix: Optional[np.ndarray] = None            # 2x3 src->dst affine
    layout: str = "nchw"                           # nchw|nhwc
    dtype: str = "float32"


class ImageProcess:
    def __init__(self, config: ImageProcessConfig):
        self.config = config

    def __call__(self, img) -> jnp.ndarray:
        c = self.config
        out = cvt_color(jnp.asarray(img), c.source_format, c.dest_format)
        if c.matrix is not None:
            if c.target_size is None:
                raise ValueError("matrix requires target_size")
            out = warp_affine(out, c.matrix, c.target_size)
        elif c.target_size is not None and out.shape[:2] != tuple(c.target_size):
            out = resize(out, c.target_size)
        out = out.astype(jnp.float32)
        mean = jnp.asarray(c.mean, jnp.float32)
        normal = jnp.asarray(c.normal, jnp.float32)
        if out.ndim == 2:
            out = out[..., None]
        out = (out - mean) * normal
        if c.dtype == "bfloat16":
            out = out.astype(jnp.bfloat16)
        if c.layout == "nchw":
            out = jnp.transpose(out, (2, 0, 1))
        return out[None]  # add batch dim
