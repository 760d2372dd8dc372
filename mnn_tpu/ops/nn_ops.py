"""Functional NN op library (NCHW, torch-convention) on jax/lax.

Role in the stack: the reference lowers its 191 schema ops through the
geometry layer onto ~20 backend kernels (SURVEY.md §2.3,
/root/reference/source/geometry/); on TPU, XLA *is* that lowering+fusion
layer, so this module is deliberately a thin table of lax wrappers with
torch layout/semantics (NCHW, same padding rules) used by the graph
converter (mnn_tpu.convert.torch_fx). Convolutions map straight onto
`lax.conv_general_dilated` which XLA tiles onto the MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr2 = Union[int, Tuple[int, int], Sequence[int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1] if len(v) > 1 else v[0]))
    return (int(v), int(v))


def conv2d(
    x: jax.Array,            # [N, Cin, H, W]
    weight: jax.Array,       # [Cout, Cin/groups, kH, kW]
    bias: Optional[jax.Array] = None,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    dilation: IntOr2 = 1,
    groups: int = 1,
) -> jax.Array:
    s, p, d = _pair(stride), _pair(padding), _pair(dilation)
    out = lax.conv_general_dilated(
        x, weight,
        window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        rhs_dilation=d,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def linear(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array] = None):
    """weight [out, in] (torch layout)."""
    out = jnp.matmul(x, weight.T)
    if bias is not None:
        out = out + bias
    return out


def batch_norm(
    x: jax.Array, running_mean, running_var, weight=None, bias=None,
    eps: float = 1e-5,
):
    """Inference-mode batchnorm over channel axis 1."""
    shape = [1, -1] + [1] * (x.ndim - 2)
    inv = lax.rsqrt(running_var.astype(jnp.float32) + eps)
    scale = inv if weight is None else inv * weight
    shift = -running_mean * scale + (0.0 if bias is None else bias)
    return (x * scale.reshape(shape) + shift.reshape(shape)).astype(x.dtype)


def layer_norm(x, normalized_shape, weight=None, bias=None, eps=1e-5):
    axes = tuple(range(x.ndim - len(tuple(normalized_shape)), x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=axes, keepdims=True)
    out = (x - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out


def max_pool2d(x, kernel_size: IntOr2, stride: Optional[IntOr2] = None,
               padding: IntOr2 = 0, ceil_mode: bool = False):
    k = _pair(kernel_size)
    s = _pair(stride) if stride is not None else k
    p = _pair(padding)
    pads = [(0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])]
    if ceil_mode:
        pads = [(lo, hi + st - 1) for (lo, hi), st in
                zip(pads, (1, 1) + s)]  # over-pad; -inf ignored by max
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 1) + k,
        window_strides=(1, 1) + s,
        padding=pads,
    )


def avg_pool2d(x, kernel_size: IntOr2, stride: Optional[IntOr2] = None,
               padding: IntOr2 = 0, count_include_pad: bool = True):
    k = _pair(kernel_size)
    s = _pair(stride) if stride is not None else k
    p = _pair(padding)
    pads = [(0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])]
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 1) + k, (1, 1) + s, pads
    )
    if count_include_pad or p == (0, 0):
        return summed / (k[0] * k[1])
    ones = jnp.ones_like(x)
    counts = lax.reduce_window(ones, 0.0, lax.add, (1, 1) + k, (1, 1) + s, pads)
    return summed / counts


def adaptive_avg_pool2d(x, output_size: IntOr2):
    oh, ow = _pair(output_size)
    n, c, h, w = x.shape
    if h % oh == 0 and w % ow == 0:
        return avg_pool2d(x, (h // oh, w // ow))
    # general case via mean over computed bins
    ys = [((i * h) // oh, ((i + 1) * h + oh - 1) // oh) for i in range(oh)]
    xs = [((j * w) // ow, ((j + 1) * w + ow - 1) // ow) for j in range(ow)]
    rows = [
        jnp.stack([x[:, :, y0:y1, x0:x1].mean(axis=(2, 3)) for (x0, x1) in xs],
                  axis=-1)
        for (y0, y1) in ys
    ]
    return jnp.stack(rows, axis=-2)


def global_avg_pool(x):
    return x.mean(axis=(2, 3), keepdims=True)


def resize_nearest(x, size: IntOr2):
    oh, ow = _pair(size)
    return jax.image.resize(x, (x.shape[0], x.shape[1], oh, ow), "nearest")


def resize_bilinear(x, size: IntOr2, align_corners: bool = False):
    oh, ow = _pair(size)
    method = "linear"
    return jax.image.resize(x, (x.shape[0], x.shape[1], oh, ow), method)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)


# activation table (reference: UnaryOp/ReLU/ReLU6 executions)
ACTIVATIONS = {
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.clip(x, 0, 6),
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "hardswish": jax.nn.hard_swish,
    "hardsigmoid": jax.nn.hard_sigmoid,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "softplus": jax.nn.softplus,
    "exp": jnp.exp,
    "log": jnp.log,
    "sqrt": jnp.sqrt,
    "abs": jnp.abs,
    "neg": jnp.negative,
}
