"""ONNX -> JAX graph converter.

Equivalent of the reference's primary converter frontend
(/root/reference/tools/converter/source/onnx/, ~160 per-op converters +
optimizer passes): parses a .onnx ModelProto (vendored minimal
wire-compatible schema, onnx_pb2) and lowers the graph through an op table
onto jnp / mnn_tpu.ops.nn_ops, producing a pure jax function + a params
pytree that jit-compiles for TPU.

Where the reference runs ~158 graph-rewrite passes (PostConverter.cpp:
MergeBNToConvolution, FuseGeLu, TransformBatchNormal, ...), this frontend
lowers structurally and lets XLA do the fusion — BN folds into convs, and
erf/add/mul gelu subgraphs fuse at compile time without pattern matching.

Static-shape semantics (TPU-first): shape-computation chains
(Shape -> Gather -> Concat -> Reshape ...) are folded to concrete numpy at
conversion time, since jit traces fix every input shape — the dynamic-shape
machinery that dominates the reference's shape-inference layer
(source/shape/, SURVEY.md §2.2) disappears by design.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.convert import onnx_pb2 as O
from mnn_tpu.ops import nn_ops as N

_DTYPES = {
    O.TensorProto.FLOAT: np.float32,
    O.TensorProto.UINT8: np.uint8,
    O.TensorProto.INT8: np.int8,
    O.TensorProto.INT16: np.int16,
    O.TensorProto.INT32: np.int32,
    O.TensorProto.INT64: np.int64,
    O.TensorProto.BOOL: np.bool_,
    O.TensorProto.FLOAT16: np.float16,
    O.TensorProto.DOUBLE: np.float64,
    O.TensorProto.UINT32: np.uint32,
    O.TensorProto.UINT64: np.uint64,
}


def tensor_to_np(t: "O.TensorProto") -> np.ndarray:
    """Decode a TensorProto (raw_data or typed repeated fields)."""
    if t.data_type == O.TensorProto.BFLOAT16:
        import ml_dtypes

        raw = np.frombuffer(t.raw_data, dtype=np.uint16)
        return raw.view(ml_dtypes.bfloat16).reshape(tuple(t.dims)).copy()
    dt = _DTYPES.get(t.data_type)
    if dt is None:
        raise NotImplementedError(f"onnx tensor dtype {t.data_type}")
    shape = tuple(t.dims)
    if t.raw_data:
        return np.frombuffer(t.raw_data, dtype=dt).reshape(shape).copy()
    field = {
        np.float32: t.float_data, np.float64: t.double_data,
        np.int64: t.int64_data, np.uint64: t.uint64_data,
    }.get(dt, t.int32_data)
    return np.asarray(list(field), dtype=dt).reshape(shape)


def _attrs(node: "O.NodeProto") -> Dict[str, Any]:
    out = {}
    for a in node.attribute:
        if a.type == O.AttributeProto.FLOAT:
            out[a.name] = a.f
        elif a.type == O.AttributeProto.INT:
            out[a.name] = int(a.i)
        elif a.type == O.AttributeProto.STRING:
            out[a.name] = a.s.decode()
        elif a.type == O.AttributeProto.TENSOR:
            out[a.name] = tensor_to_np(a.t)
        elif a.type == O.AttributeProto.FLOATS:
            out[a.name] = list(a.floats)
        elif a.type == O.AttributeProto.INTS:
            out[a.name] = [int(v) for v in a.ints]
        elif a.type == O.AttributeProto.STRINGS:
            out[a.name] = [s.decode() for s in a.strings]
        elif a.type == O.AttributeProto.GRAPH:
            out[a.name] = a.g
        elif a.type == O.AttributeProto.GRAPHS:
            out[a.name] = list(a.graphs)
        else:
            out[a.name] = None
    return out


def _is_static(v) -> bool:
    if isinstance(v, (list, tuple)):
        return all(_is_static(x) for x in v)
    return isinstance(v, (np.ndarray, np.generic, int, float, bool))


def _static_ints(v, what: str) -> np.ndarray:
    if not _is_static(v):
        raise NotImplementedError(
            f"onnx frontend: {what} must be statically known (shape-compute "
            "chains fold to numpy; a runtime-data-dependent value reached it)"
        )
    return np.asarray(v).astype(np.int64)


def _xp(vals):
    """numpy when every operand is static (shape-compute folding), else jnp."""
    return np if all(_is_static(v) for v in vals) else jnp


# -- op table ----------------------------------------------------------------

_OPS: Dict[str, Callable] = {}


def op(*names):
    def deco(fn):
        for n in names:
            _OPS[n] = fn
        return fn
    return deco


def _binary(fn_np, fn_jnp=None):
    def impl(ctx, node, a, b):
        xp = _xp([a, b])
        return (fn_np if xp is np else (fn_jnp or fn_np))(a, b)
    return impl


_OPS["Add"] = _binary(lambda a, b: a + b)
_OPS["Sub"] = _binary(lambda a, b: a - b)
_OPS["Mul"] = _binary(lambda a, b: a * b)
_OPS["Div"] = _binary(lambda a, b: a / b)
_OPS["Pow"] = _binary(lambda a, b: a ** b)
_OPS["Greater"] = _binary(lambda a, b: a > b)
_OPS["Less"] = _binary(lambda a, b: a < b)
_OPS["Equal"] = _binary(lambda a, b: a == b)
_OPS["Min"] = lambda ctx, node, *xs: functools.reduce(
    lambda a, b: _xp(xs).minimum(a, b), xs)
_OPS["Max"] = lambda ctx, node, *xs: functools.reduce(
    lambda a, b: _xp(xs).maximum(a, b), xs)
_OPS["And"] = _binary(lambda a, b: a & b)
_OPS["Or"] = _binary(lambda a, b: a | b)

for name, f in {
    "Relu": jax.nn.relu, "Sigmoid": jax.nn.sigmoid, "Tanh": jnp.tanh,
    "Exp": jnp.exp, "Log": jnp.log, "Sqrt": jnp.sqrt, "Neg": lambda x: -x,
    "Abs": jnp.abs, "Floor": jnp.floor, "Ceil": jnp.ceil,
    "Erf": jax.scipy.special.erf, "Softplus": jax.nn.softplus,
    "Not": jnp.logical_not, "Round": jnp.round, "Sin": jnp.sin,
    "Cos": jnp.cos, "Identity": lambda x: x, "Sign": jnp.sign,
    "Reciprocal": lambda x: 1.0 / x, "Mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}.items():
    _OPS[name] = (lambda f: lambda ctx, node, x: f(x))(f)


@op("Gelu")
def _gelu(ctx, node, x):
    return jax.nn.gelu(x, approximate=_attrs(node).get("approximate") == "tanh")


@op("LeakyRelu")
def _leaky(ctx, node, x):
    return jax.nn.leaky_relu(x, _attrs(node).get("alpha", 0.01))


@op("Elu")
def _elu(ctx, node, x):
    return jax.nn.elu(x, _attrs(node).get("alpha", 1.0))


@op("HardSigmoid")
def _hardsigmoid(ctx, node, x):
    a = _attrs(node)
    return jnp.clip(x * a.get("alpha", 0.2) + a.get("beta", 0.5), 0, 1)


@op("HardSwish")
def _hardswish(ctx, node, x):
    return jax.nn.hard_swish(x)


@op("PRelu")
def _prelu(ctx, node, x, slope):
    return jnp.where(x >= 0, x, x * slope)


@op("Clip")
def _clip(ctx, node, x, lo=None, hi=None):
    a = _attrs(node)
    lo = a.get("min") if lo is None else lo
    hi = a.get("max") if hi is None else hi
    if lo is not None:
        x = jnp.maximum(x, lo)
    if hi is not None:
        x = jnp.minimum(x, hi)
    return x


@op("Softmax")
def _softmax(ctx, node, x):
    return jax.nn.softmax(x, axis=_attrs(node).get("axis", -1))


@op("LogSoftmax")
def _logsoftmax(ctx, node, x):
    return jax.nn.log_softmax(x, axis=_attrs(node).get("axis", -1))


@op("MatMul")
def _matmul(ctx, node, a, b):
    return jnp.matmul(a, b)


@op("Gemm")
def _gemm(ctx, node, a, b, c=None):
    at = _attrs(node)
    if at.get("transA"):
        a = a.T
    if at.get("transB"):
        b = b.T
    y = jnp.matmul(a, b) * at.get("alpha", 1.0)
    if c is not None:
        y = y + c * at.get("beta", 1.0)
    return y


@op("Einsum")
def _einsum(ctx, node, *xs):
    return jnp.einsum(_attrs(node)["equation"], *xs)


def _conv_prepad(x, pads, auto_pad, kshape, strides, dilations):
    """Resolve onnx pads / auto_pad; returns (x, symmetric_pad_tuple or None)."""
    if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
        # lax handles SAME; emulate by explicit computation
        in_h, in_w = x.shape[2], x.shape[3]
        pad = []
        for i, dim in enumerate((in_h, in_w)):
            out = -(-dim // strides[i])
            eff = (kshape[i] - 1) * dilations[i] + 1
            total = max(0, (out - 1) * strides[i] + eff - dim)
            lo = total // 2 if auto_pad == "SAME_UPPER" else total - total // 2
            pad.append((lo, total - lo))
        x = jnp.pad(x, ((0, 0), (0, 0), pad[0], pad[1]))
        return x, (0, 0)
    if pads is None:
        return x, (0, 0)
    ph0, pw0, ph1, pw1 = (list(pads) + [0] * 4)[:4]
    if ph0 == ph1 and pw0 == pw1:
        return x, (ph0, pw0)
    x = jnp.pad(x, ((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)))
    return x, (0, 0)


@op("Conv")
def _conv(ctx, node, x, w, b=None):
    at = _attrs(node)
    strides = at.get("strides", [1, 1])
    dilations = at.get("dilations", [1, 1])
    kshape = at.get("kernel_shape", list(w.shape[2:]))
    if len(kshape) == 1:  # Conv1d via 2d
        x2 = x[..., None]
        w2 = w[..., None]
        y = _conv(ctx, _node1d_to_2d(node), x2, w2, b)
        return y[..., 0]
    x, pad = _conv_prepad(x, at.get("pads"), at.get("auto_pad", "NOTSET"),
                          kshape, strides, dilations)
    return N.conv2d(x, w, b, stride=tuple(strides), padding=pad,
                    dilation=tuple(dilations), groups=at.get("group", 1))


def _node1d_to_2d(node):
    n = O.NodeProto()
    n.CopyFrom(node)
    for a in n.attribute:
        if a.name in ("strides", "dilations", "kernel_shape"):
            a.ints.append(1)
        elif a.name == "pads" and len(a.ints) == 2:
            p = list(a.ints)
            del a.ints[:]
            a.ints.extend([p[0], 0, p[1], 0])
    return n


def conv_transpose2d_nchw(x, w, *, strides=(1, 1), pads=(0, 0, 0, 0),
                          output_padding=(0, 0), groups=1, dilation=(1, 1)):
    """Exact ConvTranspose (torch/onnx/caffe semantics) as an input-dilated
    forward conv with a spatially flipped kernel.

    x [N, Cin, H, W]; w [Cin, Cout/groups, kH, kW] (the onnx/torch/caffe
    transposed-conv layout). out = (in-1)*s - p0 - p1 + d*(k-1) + 1 + opad.
    """
    cin = w.shape[0]
    co_g = w.shape[1]
    kh, kw = w.shape[2], w.shape[3]
    # [Cin, Co/g, kh, kw] -> forward-conv HWIO [kh, kw, Cin/g, Co] (output
    # channels blocked per group), spatially flipped
    wg = w.reshape(groups, cin // groups, co_g, kh, kw)
    wf = jnp.flip(wg.transpose(3, 4, 1, 0, 2), (0, 1)).reshape(
        kh, kw, cin // groups, groups * co_g)
    ph0, pw0, ph1, pw1 = (list(pads) + [0] * 4)[:4]
    eh = dilation[0] * (kh - 1)
    ew = dilation[1] * (kw - 1)
    pad = ((eh - ph0, eh - ph1 + output_padding[0]),
           (ew - pw0, ew - pw1 + output_padding[1]))
    return jax.lax.conv_general_dilated(
        x, wf, window_strides=(1, 1), padding=pad,
        lhs_dilation=tuple(strides), rhs_dilation=tuple(dilation),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)


@op("ConvTranspose")
def _conv_transpose(ctx, node, x, w, b=None):
    at = _attrs(node)
    y = conv_transpose2d_nchw(
        x, w,
        strides=tuple(at.get("strides", [1, 1])),
        pads=tuple(at.get("pads", [0, 0, 0, 0])),
        output_padding=tuple(at.get("output_padding", [0, 0])),
        groups=at.get("group", 1),
        dilation=tuple(at.get("dilations", [1, 1])),
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


@op("MaxPool")
def _maxpool(ctx, node, x):
    at = _attrs(node)
    ks = at["kernel_shape"]
    x, pad = _conv_prepad(x, at.get("pads"), at.get("auto_pad", "NOTSET"),
                          ks, at.get("strides", ks), [1, 1])
    return N.max_pool2d(x, tuple(ks), tuple(at.get("strides", ks)), pad,
                        ceil_mode=bool(at.get("ceil_mode", 0)))


@op("AveragePool")
def _avgpool(ctx, node, x):
    at = _attrs(node)
    ks = at["kernel_shape"]
    x, pad = _conv_prepad(x, at.get("pads"), at.get("auto_pad", "NOTSET"),
                          ks, at.get("strides", ks), [1, 1])
    return N.avg_pool2d(x, tuple(ks), tuple(at.get("strides", ks)), pad)


@op("GlobalAveragePool")
def _gap(ctx, node, x):
    return N.global_avg_pool(x)


@op("GlobalMaxPool")
def _gmp(ctx, node, x):
    return jnp.max(x, axis=(2, 3), keepdims=True)


@op("BatchNormalization")
def _bn(ctx, node, x, scale, bias, mean, var):
    return N.batch_norm(x, mean, var, scale, bias,
                        eps=_attrs(node).get("epsilon", 1e-5))


@op("LayerNormalization")
def _ln(ctx, node, x, scale, bias=None):
    at = _attrs(node)
    axis = at.get("axis", -1)
    eps = at.get("epsilon", 1e-5)
    axes = tuple(range(axis % x.ndim, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * scale
    return y + bias if bias is not None else y


@op("InstanceNormalization")
def _in(ctx, node, x, scale, bias):
    eps = _attrs(node).get("epsilon", 1e-5)
    axes = tuple(range(2, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    sh = (1, -1) + (1,) * (x.ndim - 2)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale.reshape(sh) + bias.reshape(sh)


@op("Reshape")
def _reshape(ctx, node, x, shape=None):
    shape = _static_ints(
        shape if shape is not None else _attrs(node)["shape"], "Reshape shape")
    tgt = []
    for i, s in enumerate(shape.tolist()):
        tgt.append(x.shape[i] if s == 0 else s)
    xp = np if _is_static(x) else jnp
    return xp.reshape(x, tuple(tgt))


@op("Flatten")
def _flatten(ctx, node, x):
    ax = _attrs(node).get("axis", 1) % (x.ndim + 1)
    lead = int(np.prod(x.shape[:ax])) if ax else 1
    return jnp.reshape(x, (lead, -1))


@op("Transpose")
def _transpose(ctx, node, x):
    perm = _attrs(node).get("perm") or list(range(x.ndim))[::-1]
    return jnp.transpose(x, perm)


@op("Concat")
def _concat(ctx, node, *xs):
    xp = _xp(xs)
    return xp.concatenate(xs, axis=_attrs(node)["axis"])


@op("Split")
def _split(ctx, node, x, split=None):
    at = _attrs(node)
    axis = at.get("axis", 0)
    split = split if split is not None else at.get("split")
    if split is None:
        n = len(node.output)
        return tuple(jnp.split(x, n, axis=axis))
    sizes = _static_ints(split, "Split sizes").tolist()
    idx = np.cumsum(sizes)[:-1].tolist()
    return tuple(jnp.split(x, idx, axis=axis))


@op("Slice")
def _slice(ctx, node, x, starts=None, ends=None, axes=None, steps=None):
    at = _attrs(node)
    starts = _static_ints(starts if starts is not None else at["starts"], "Slice starts").tolist()
    ends = _static_ints(ends if ends is not None else at["ends"], "Slice ends").tolist()
    axes = (_static_ints(axes, "Slice axes").tolist() if axes is not None
            else at.get("axes") or list(range(len(starts))))
    steps = (_static_ints(steps, "Slice steps").tolist() if steps is not None
             else [1] * len(starts))
    sl = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        sl[a % x.ndim] = slice(int(s), int(e), int(st))
    return x[tuple(sl)]


@op("Squeeze")
def _squeeze(ctx, node, x, axes=None):
    at = _attrs(node)
    axes = axes if axes is not None else at.get("axes")
    xp = np if _is_static(x) else jnp
    if axes is None:
        return xp.squeeze(x)
    axes = tuple(int(a) for a in _static_ints(axes, "Squeeze axes"))
    return xp.squeeze(x, axis=axes)


@op("Unsqueeze")
def _unsqueeze(ctx, node, x, axes=None):
    at = _attrs(node)
    axes = _static_ints(
        axes if axes is not None else at["axes"], "Unsqueeze axes")
    xp = np if _is_static(x) else jnp
    for a in sorted(int(v) for v in axes):
        x = xp.expand_dims(x, a)
    return x


@op("Gather")
def _gather(ctx, node, x, idx):
    axis = _attrs(node).get("axis", 0)
    xp = _xp([x, idx])
    return xp.take(x, idx, axis=axis)


@op("GatherElements")
def _gather_elements(ctx, node, x, idx):
    axis = _attrs(node).get("axis", 0)
    return jnp.take_along_axis(x, idx, axis=axis)


@op("Shape")
def _shape(ctx, node, x):
    return np.asarray(x.shape, np.int64)


@op("Size")
def _size(ctx, node, x):
    return np.asarray(int(np.prod(x.shape)), np.int64)


@op("Cast")
def _cast(ctx, node, x):
    to = _DTYPES[_attrs(node)["to"]]
    if _is_static(x):
        return np.asarray(x).astype(to)
    return x.astype(to)


@op("Constant")
def _constant(ctx, node):
    at = _attrs(node)
    if "value" in at:
        return at["value"]
    for k in ("value_float", "value_int"):
        if k in at:
            return np.asarray(at[k])
    if "value_floats" in at:
        return np.asarray(at["value_floats"], np.float32)
    if "value_ints" in at:
        return np.asarray(at["value_ints"], np.int64)
    raise NotImplementedError("Constant without value")


@op("ConstantOfShape")
def _const_of_shape(ctx, node, shape):
    at = _attrs(node)
    val = at.get("value")
    fill = val.reshape(-1)[0] if val is not None else np.float32(0)
    return np.full(tuple(_static_ints(shape, "ConstantOfShape")), fill)


@op("Range")
def _range(ctx, node, start, limit, delta):
    if all(_is_static(v) for v in (start, limit, delta)):
        return np.arange(int(start), int(limit), int(delta), np.int64)
    return jnp.arange(start, limit, delta)


@op("Expand")
def _expand(ctx, node, x, shape):
    tgt = _static_ints(shape, "Expand shape").tolist()
    # onnx Expand uses numpy broadcasting with 1s allowed on either side
    full = list(x.shape)
    while len(full) < len(tgt):
        full.insert(0, 1)
    out = [max(a, b) for a, b in zip(full, tgt)]
    xp = np if _is_static(x) else jnp
    return xp.broadcast_to(xp.reshape(x, full), out)


@op("Tile")
def _tile(ctx, node, x, reps):
    xp = np if _is_static(x) else jnp
    return xp.tile(x, tuple(_static_ints(reps, "Tile reps").tolist()))


@op("Where")
def _where(ctx, node, c, a, b):
    xp = _xp([c, a, b])
    return xp.where(c, a, b)


@op("Pad")
def _pad(ctx, node, x, pads=None, value=None):
    at = _attrs(node)
    pads = _static_ints(
        pads if pads is not None else at["pads"], "Pad pads").tolist()
    mode = at.get("mode", "constant")
    n = x.ndim
    cfg = [(pads[i], pads[i + n]) for i in range(n)]
    if mode == "constant":
        cv = float(value) if value is not None else at.get("value", 0.0)
        return jnp.pad(x, cfg, constant_values=cv)
    return jnp.pad(x, cfg, mode={"reflect": "reflect", "edge": "edge"}[mode])


def _reduce(fn_jnp):
    def impl(ctx, node, x, axes=None):
        at = _attrs(node)
        if axes is None:
            axes = at.get("axes")
        if axes is not None:
            axes = tuple(int(a) for a in _static_ints(axes, "Reduce axes"))
        keep = bool(at.get("keepdims", 1))
        return fn_jnp(x, axis=axes, keepdims=keep)
    return impl


_OPS["ReduceMean"] = _reduce(jnp.mean)
_OPS["ReduceSum"] = _reduce(jnp.sum)
_OPS["ReduceMax"] = _reduce(jnp.max)
_OPS["ReduceMin"] = _reduce(jnp.min)
_OPS["ReduceProd"] = _reduce(jnp.prod)
_OPS["ReduceL2"] = _reduce(
    lambda x, axis, keepdims: jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims)))


@op("ArgMax")
def _argmax(ctx, node, x):
    at = _attrs(node)
    y = jnp.argmax(x, axis=at.get("axis", 0))
    if at.get("keepdims", 1):
        y = jnp.expand_dims(y, at.get("axis", 0))
    return y.astype(jnp.int64)


@op("TopK")
def _topk(ctx, node, x, k):
    kk = int(_static_ints(k, "TopK k").reshape(-1)[0])
    if _attrs(node).get("axis", -1) not in (-1, x.ndim - 1):
        raise NotImplementedError("TopK on non-last axis")
    vals, idx = jax.lax.top_k(x, kk)
    return vals, idx.astype(jnp.int64)


@op("Resize")
def _resize(ctx, node, x, roi=None, scales=None, sizes=None):
    at = _attrs(node)
    mode = at.get("mode", "nearest")
    if sizes is not None and np.size(np.asarray(sizes)):
        hw = _static_ints(sizes, "Resize sizes").tolist()[2:]
    else:
        sc = np.asarray(scales, np.float64).reshape(-1)
        hw = [int(round(x.shape[2] * sc[2])), int(round(x.shape[3] * sc[3]))]
    if mode == "nearest":
        return N.resize_nearest(x, tuple(hw))
    align = at.get("coordinate_transformation_mode", "half_pixel") == "align_corners"
    return N.resize_bilinear(x, tuple(hw), align_corners=align)


@op("Dropout")
def _dropout(ctx, node, x, *rest):
    return x  # inference


@op("Upsample")
def _upsample(ctx, node, x, scales=None):
    at = _attrs(node)
    sc = np.asarray(scales if scales is not None else at["scales"],
                    np.float64).reshape(-1)
    hw = (int(x.shape[2] * sc[2]), int(x.shape[3] * sc[3]))
    if at.get("mode", "nearest") == "nearest":
        return N.resize_nearest(x, hw)
    return N.resize_bilinear(x, hw)


# -- breadth ops (reference: Unary/BinaryOp/Reduce converter groups cover
# these op families in tools/converter/source/onnx/) ------------------------

for name, f in {
    "Tan": jnp.tan, "Atan": jnp.arctan, "Asin": jnp.arcsin,
    "Acos": jnp.arccos, "Sinh": jnp.sinh, "Cosh": jnp.cosh,
    "Asinh": jnp.arcsinh, "Acosh": jnp.arccosh, "Atanh": jnp.arctanh,
    "IsNaN": jnp.isnan, "Softsign": jax.nn.soft_sign,
}.items():
    _OPS[name] = (lambda f: lambda ctx, node, x: f(x))(f)

_OPS["Mod"] = _binary(lambda a, b: a % b)
_OPS["Xor"] = _binary(lambda a, b: a ^ b)
_OPS["Sum"] = lambda ctx, node, *xs: functools.reduce(lambda a, b: a + b, xs)
_OPS["Mean"] = lambda ctx, node, *xs: functools.reduce(
    lambda a, b: a + b, xs) / len(xs)

_OPS["ReduceL1"] = _reduce(
    lambda x, axis, keepdims: jnp.sum(jnp.abs(x), axis=axis,
                                      keepdims=keepdims))
_OPS["ReduceSumSquare"] = _reduce(
    lambda x, axis, keepdims: jnp.sum(x * x, axis=axis, keepdims=keepdims))
_OPS["ReduceLogSum"] = _reduce(
    lambda x, axis, keepdims: jnp.log(jnp.sum(x, axis=axis,
                                              keepdims=keepdims)))
_OPS["ReduceLogSumExp"] = _reduce(
    lambda x, axis, keepdims: jax.scipy.special.logsumexp(
        x, axis=axis, keepdims=keepdims))


@op("Selu")
def _selu(ctx, node, x):
    at = _attrs(node)
    a = at.get("alpha", 1.6732632)
    g = at.get("gamma", 1.050701)
    return g * jnp.where(x > 0, x, a * (jnp.exp(x) - 1.0))


@op("Celu")
def _celu(ctx, node, x):
    a = _attrs(node).get("alpha", 1.0)
    return jnp.maximum(x, 0) + jnp.minimum(0, a * (jnp.exp(x / a) - 1.0))


@op("ThresholdedRelu")
def _thresholded_relu(ctx, node, x):
    a = _attrs(node).get("alpha", 1.0)
    return jnp.where(x > a, x, 0.0)


@op("Shrink")
def _shrink(ctx, node, x):
    at = _attrs(node)
    lam = at.get("lambd", 0.5)
    bias = at.get("bias", 0.0)
    return jnp.where(x < -lam, x + bias, jnp.where(x > lam, x - bias, 0.0))


@op("Hardmax")
def _hardmax(ctx, node, x):
    ax = _attrs(node).get("axis", -1)
    return jax.nn.one_hot(jnp.argmax(x, axis=ax), x.shape[ax], axis=ax,
                          dtype=x.dtype)


@op("ArgMin")
def _argmin(ctx, node, x):
    at = _attrs(node)
    y = jnp.argmin(x, axis=at.get("axis", 0))
    if at.get("keepdims", 1):
        y = jnp.expand_dims(y, at.get("axis", 0))
    return y.astype(jnp.int64)


@op("CumSum")
def _cumsum(ctx, node, x, axis):
    ax = int(_static_ints(axis, "CumSum axis").reshape(-1)[0])
    at = _attrs(node)
    y = jnp.cumsum(jnp.flip(x, ax) if at.get("reverse") else x, axis=ax)
    if at.get("exclusive"):
        y = jnp.roll(y, 1, axis=ax)
        idx = [slice(None)] * y.ndim
        idx[ax] = 0
        y = y.at[tuple(idx)].set(0)
    return jnp.flip(y, ax) if at.get("reverse") else y


@op("DepthToSpace")
def _depth_to_space(ctx, node, x):
    at = _attrs(node)
    bs = int(at["blocksize"])
    n, c, h, w = x.shape
    if at.get("mode", "DCR") == "DCR":
        y = x.reshape(n, bs, bs, c // (bs * bs), h, w)
        y = y.transpose(0, 3, 4, 1, 5, 2)
    else:  # CRD
        y = x.reshape(n, c // (bs * bs), bs, bs, h, w)
        y = y.transpose(0, 1, 4, 2, 5, 3)
    return y.reshape(n, c // (bs * bs), h * bs, w * bs)


@op("SpaceToDepth")
def _space_to_depth(ctx, node, x):
    bs = int(_attrs(node)["blocksize"])
    n, c, h, w = x.shape
    y = x.reshape(n, c, h // bs, bs, w // bs, bs)
    y = y.transpose(0, 3, 5, 1, 2, 4)
    return y.reshape(n, c * bs * bs, h // bs, w // bs)


@op("LRN")
def _lrn(ctx, node, x):
    at = _attrs(node)
    size = int(at["size"])
    alpha = at.get("alpha", 1e-4)
    beta = at.get("beta", 0.75)
    bias = at.get("bias", 1.0)
    sq = x * x
    half = size // 2
    pad = jnp.pad(sq, ((0, 0), (half, size - 1 - half), (0, 0), (0, 0)))
    acc = sum(pad[:, i:i + x.shape[1]] for i in range(size))
    return x / (bias + (alpha / size) * acc) ** beta


@op("EyeLike")
def _eyelike(ctx, node, x):
    k = _attrs(node).get("k", 0)
    return jnp.eye(x.shape[0], x.shape[1], k=k, dtype=jnp.asarray(x).dtype)


@op("OneHot")
def _onehot(ctx, node, indices, depth, values):
    ax = _attrs(node).get("axis", -1)
    d = int(_static_ints(depth, "OneHot depth").reshape(-1)[0])
    vals = jnp.asarray(values)
    oh = jax.nn.one_hot(jnp.asarray(indices) % d, d, axis=ax)
    return oh * (vals[1] - vals[0]) + vals[0]


@op("Trilu")
def _trilu(ctx, node, x, k=None):
    kk = int(_static_ints(k, "Trilu k").reshape(-1)[0]) if k is not None else 0
    upper = _attrs(node).get("upper", 1)
    return jnp.triu(x, kk) if upper else jnp.tril(x, kk)


@op("GatherND")
def _gather_nd(ctx, node, data, indices):
    b = _attrs(node).get("batch_dims", 0)
    if b:
        raise NotImplementedError("GatherND batch_dims > 0")
    data = jnp.asarray(data)
    idx = jnp.asarray(indices)
    m = idx.shape[-1]
    flat = idx.reshape(-1, m)
    out = data[tuple(flat[:, i] for i in range(m))]
    return out.reshape(idx.shape[:-1] + data.shape[m:])


@op("ScatterND")
def _scatter_nd(ctx, node, data, indices, updates):
    data = jnp.asarray(data)
    idx = jnp.asarray(indices)
    upd = jnp.asarray(updates)
    m = idx.shape[-1]
    flat = idx.reshape(-1, m)
    upd_flat = upd.reshape((flat.shape[0],) + data.shape[m:])
    return data.at[tuple(flat[:, i] for i in range(m))].set(upd_flat)


@op("ScatterElements")
def _scatter_elements(ctx, node, data, indices, updates):
    ax = _attrs(node).get("axis", 0)
    data = jnp.asarray(data)
    idx = jnp.asarray(indices)
    upd = jnp.asarray(updates)
    ii = jnp.indices(idx.shape)
    ii = list(ii)
    ii[ax] = idx
    red = _attrs(node).get("reduction", "none")
    at = data.at[tuple(ii)]
    if red == "add":
        return at.add(upd)
    if red in ("mul", "max", "min"):
        return getattr(at, red)(upd)
    return at.set(upd)


@op("GroupNormalization")
def _group_norm(ctx, node, x, scale, bias):
    at = _attrs(node)
    g = int(at["num_groups"])
    eps = at.get("epsilon", 1e-5)
    n, c = x.shape[:2]
    xg = x.reshape(n, g, c // g, *x.shape[2:])
    axes = tuple(range(2, xg.ndim))
    mu = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    y = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    shp = (1, c) + (1,) * (x.ndim - 2)
    return y * jnp.asarray(scale).reshape(shp) + \
        jnp.asarray(bias).reshape(shp)


@op("NonMaxSuppression")
def _nms_op(ctx, node, boxes, scores, max_out=None, iou_th=None, score_th=None):
    """Static-shape NMS via ops/nms.py (TPU-jittable); emits the ONNX
    [num_selected, 3] (batch, class, box) index layout, padded entries
    dropped host-side when static."""
    from mnn_tpu.ops.nms import nms

    mo = int(_static_ints(max_out, "nms max_out").reshape(-1)[0]) \
        if max_out is not None else boxes.shape[1]
    iou = float(np.asarray(iou_th).reshape(-1)[0]) if iou_th is not None else 0.5
    sth = float(np.asarray(score_th).reshape(-1)[0]) \
        if score_th is not None else 0.0
    b = np.asarray(boxes)  # [1, N, 4] y1x1y2x2 per onnx center_point_box=0
    s = np.asarray(scores)  # [1, C, N]
    out = []
    for ci in range(s.shape[1]):
        idx, valid = nms(jnp.asarray(b[0]), jnp.asarray(s[0, ci]),
                         iou_threshold=iou, score_threshold=sth,
                         max_outputs=mo)
        idx = np.asarray(idx)[np.asarray(valid)]
        out.extend((0, ci, int(i)) for i in idx)
    return np.asarray(out, np.int64).reshape(-1, 3)


@op("DequantizeLinear")
def _dequantize_linear(ctx, node, x, scale, zero=None):
    ax = _attrs(node).get("axis", 1)
    x = jnp.asarray(x).astype(jnp.int32)
    z = jnp.asarray(zero).astype(jnp.int32) if zero is not None else 0
    s = jnp.asarray(scale, jnp.float32)
    if s.ndim:  # per-axis
        shp = [1] * x.ndim
        shp[ax] = -1
        s = s.reshape(shp)
        if zero is not None:
            z = jnp.asarray(z).reshape(shp)
    return (x - z).astype(jnp.float32) * s


@op("QuantizeLinear")
def _quantize_linear(ctx, node, x, scale, zero=None):
    ax = _attrs(node).get("axis", 1)
    s = jnp.asarray(scale, jnp.float32)
    z = jnp.asarray(zero).astype(jnp.int32) if zero is not None else 0
    if s.ndim:
        shp = [1] * jnp.asarray(x).ndim
        shp[ax] = -1
        s = s.reshape(shp)
        if zero is not None:
            z = jnp.asarray(z).reshape(shp)
    zdt = jnp.asarray(zero).dtype if zero is not None else jnp.uint8
    info = jnp.iinfo(zdt)
    return jnp.clip(jnp.round(jnp.asarray(x, jnp.float32) / s) + z,
                    info.min, info.max).astype(zdt)


# -- driver ------------------------------------------------------------------


# -- control flow + sampling tail (reference: tools/converter/source/onnx/
# IfOnnx/LoopOnnx/GridSampleOnnx/ROIAlignOnnx; coverage notes in
# docs/onnx_coverage.md) -----------------------------------------------------

@op("CastLike")
def _cast_like(ctx, node, a, b):
    if _is_static(a) and _is_static(b):
        return np.asarray(a).astype(np.asarray(b).dtype)
    return jnp.asarray(a).astype(jnp.asarray(b).dtype)


@op("If")
def _if_op(ctx, node, cond):
    at = _attrs(node)
    tb, eb = at["then_branch"], at["else_branch"]
    if _is_static(cond):
        outs = ctx.run_graph(tb if bool(np.asarray(cond).reshape(()))
                             else eb, {})
        return outs if len(outs) > 1 else outs[0]
    # traced condition -> lax.cond; both branches must produce matching
    # shapes/dtypes (the ONNX spec requires it)
    outs = jax.lax.cond(
        jnp.asarray(cond).reshape(()).astype(bool),
        lambda: tuple(jnp.asarray(v) for v in ctx.run_graph(tb, {})),
        lambda: tuple(jnp.asarray(v) for v in ctx.run_graph(eb, {})),
    )
    return outs if len(outs) > 1 else outs[0]


@op("Loop")
def _loop(ctx, node, m=None, cond=None, *carried):
    """For-loop semantics: a STATIC trip count M runs as lax.scan with the
    body's scan outputs stacked. Dynamic early-exit (a traced or
    body-computed condition) has data-dependent output shapes, which XLA
    cannot express — deliberately unsupported (docs/onnx_coverage.md)."""
    at = _attrs(node)
    body = at["body"]
    if m is None:
        raise NotImplementedError("Loop without trip count (while-style)")
    if cond is not None and not (_is_static(cond)
                                 and bool(np.asarray(cond).reshape(()))):
        if _is_static(cond):
            return tuple(jnp.asarray(v) for v in carried)  # cond false
        raise NotImplementedError("Loop with a traced condition")
    trip = int(_static_ints(m, "Loop trip count").reshape(()))
    names = [vi.name for vi in body.input]
    n_carry = len(carried)
    n_scan = len(body.output) - 1 - n_carry

    def body_fn(carry, i):
        bound = {names[0]: i, names[1]: jnp.asarray(True)}
        bound.update(zip(names[2:], carry))
        vals = ctx.run_graph(body, bound)
        vals = tuple(jnp.asarray(v) for v in vals)
        return vals[1:1 + n_carry], vals[1 + n_carry:]

    carry0 = tuple(jnp.asarray(v) for v in carried)
    carry, ys = jax.lax.scan(body_fn, carry0,
                             jnp.arange(trip, dtype=jnp.int32))
    out = tuple(carry) + tuple(ys[:n_scan] if n_scan else ())
    return out if len(out) > 1 else out[0]


@op("Scan")
def _scan_op(ctx, node, *args):
    at = _attrs(node)
    body = at["body"]
    k = at["num_scan_inputs"]
    n_state = len(args) - k
    states = tuple(jnp.asarray(a) for a in args[:n_state])
    xs = tuple(jnp.asarray(a) for a in args[n_state:])
    in_dirs = at.get("scan_input_directions") or [0] * k
    xs = tuple(jnp.flip(x, 0) if d else x for x, d in zip(xs, in_dirs))
    names = [vi.name for vi in body.input]

    def body_fn(carry, sl):
        bound = dict(zip(names, list(carry) + list(sl)))
        vals = ctx.run_graph(body, bound)
        vals = tuple(jnp.asarray(v) for v in vals)
        return vals[:n_state], vals[n_state:]

    carry, ys = jax.lax.scan(body_fn, states, xs)
    n_sout = len(body.output) - n_state
    out_dirs = at.get("scan_output_directions") or [0] * n_sout
    ys = tuple(jnp.flip(y, 0) if d else y for y, d in zip(ys, out_dirs))
    out = tuple(carry) + tuple(ys)
    return out if len(out) > 1 else out[0]


def _bilinear_gather(img, ix, iy, border):
    """img [C, H, W]; ix/iy [...] sample coords. zeros or border padding."""
    h, w = img.shape[1], img.shape[2]
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (wx if dx else 1 - wx) * (wy if dy else 1 - wy)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            v = img[:, yc, xc]                      # [C, ...]
            if not border:  # zeros padding: mask out-of-range taps
                ok = ((xi >= 0) & (xi <= w - 1) & (yi >= 0)
                      & (yi <= h - 1)).astype(img.dtype)
                v = v * ok
            out = out + v * wgt.astype(img.dtype)
    return out


@op("GridSample")
def _grid_sample(ctx, node, x, grid):
    """2D bilinear/nearest; padding zeros|border; align_corners."""
    at = _attrs(node)
    mode = at.get("mode", "bilinear")
    padding = at.get("padding_mode", "zeros")
    align = bool(at.get("align_corners", 0))
    if mode not in ("bilinear", "linear", "nearest"):
        raise NotImplementedError(f"GridSample mode {mode}")
    if padding not in ("zeros", "border"):
        raise NotImplementedError(f"GridSample padding {padding}")
    x = jnp.asarray(x)
    grid = jnp.asarray(grid).astype(jnp.float32)
    n, ch, h, w = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align:
        ix = (gx + 1) * (w - 1) / 2
        iy = (gy + 1) * (h - 1) / 2
    else:
        ix = ((gx + 1) * w - 1) / 2
        iy = ((gy + 1) * h - 1) / 2

    def one(img, ix, iy):
        if mode == "nearest":
            xi = jnp.round(ix)
            yi = jnp.round(iy)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            v = img[:, yc, xc]
            if padding == "zeros":
                ok = ((xi >= 0) & (xi <= w - 1) & (yi >= 0)
                      & (yi <= h - 1)).astype(img.dtype)
                v = v * ok
            return v
        return _bilinear_gather(img, ix, iy, padding == "border")

    return jax.vmap(one)(x, ix, iy)


@op("RoiAlign")
def _roi_align(ctx, node, x, rois, batch_indices):
    """avg/max RoiAlign (reference ROIAlignOnnx). sampling_ratio=0 (the
    spec's adaptive, data-dependent grid) is approximated with 2 samples
    per bin — torchvision uses ceil(roi_size/out_size), which is
    data-dependent and unexpressible with static shapes."""
    at = _attrs(node)
    oh = at.get("output_height", 1)
    ow = at.get("output_width", 1)
    sr = at.get("sampling_ratio", 0) or 2
    scale = at.get("spatial_scale", 1.0)
    mode = at.get("mode", "avg")
    half = at.get("coordinate_transformation_mode", "half_pixel")         == "half_pixel"
    x = jnp.asarray(x)
    rois = jnp.asarray(rois).astype(jnp.float32)
    bi = jnp.asarray(batch_indices).astype(jnp.int32)

    def one(roi, b):
        img = x[b]                                   # [C, H, W]
        off = 0.5 if half else 0.0
        x1 = roi[0] * scale - off
        y1 = roi[1] * scale - off
        x2 = roi[2] * scale - off
        y2 = roi[3] * scale - off
        rw = x2 - x1
        rh = y2 - y1
        if not half:
            rw = jnp.maximum(rw, 1.0)
            rh = jnp.maximum(rh, 1.0)
        bw = rw / ow
        bh = rh / oh
        # sample grid: (oh*sr) x (ow*sr) bilinear taps, reduced per bin
        sy = y1 + (jnp.arange(oh * sr) + 0.5) * bh / sr
        sx = x1 + (jnp.arange(ow * sr) + 0.5) * bw / sr
        iy, ix = jnp.meshgrid(sy, sx, indexing="ij")
        v = _bilinear_gather(img, ix, iy, border=True)   # [C, oh*sr, ow*sr]
        v = v.reshape(v.shape[0], oh, sr, ow, sr)
        if mode == "max":
            return v.max(axis=(2, 4))
        return v.mean(axis=(2, 4))

    return jax.vmap(one)(rois, bi)


def load_onnx(path: str) -> "O.ModelProto":
    with open(path, "rb") as f:
        return O.ModelProto.FromString(f.read())


class _Ctx:
    """Execution context handed to converters: the live env (for
    control-flow subgraphs' lexical outer-scope captures) + a subgraph
    runner. Regular ops ignore it."""

    __slots__ = ("env",)

    def __init__(self, env):
        self.env = env

    def run_graph(self, graph, bound):
        """Run a GraphProto with `bound` mapping its formal inputs;
        outer names resolve from the calling env (ONNX lexical scoping).
        Returns the subgraph's output values (tuple)."""
        sub = dict(self.env)
        for t in graph.initializer:
            sub[t.name] = tensor_to_np(t)
        sub.update(bound)
        _run_nodes(list(graph.node), sub)
        return tuple(sub[vi.name] for vi in graph.output)


def _run_nodes(nodes, env):
    ctx = _Ctx(env)
    for node in nodes:
        args = [env[i] if i else None for i in node.input]
        # drop trailing optional Nones (onnx encodes absent optionals
        # as empty-string inputs)
        while args and args[-1] is None:
            args.pop()
        out = _OPS[node.op_type](ctx, node, *args)
        if isinstance(out, tuple):
            for nm, v in zip(node.output, out):
                env[nm] = v
        else:
            env[node.output[0]] = out
    return env


def convert_onnx(model):
    """ModelProto (or path) -> (fn(params, *inputs) -> output(s), params).

    Float initializers become the `params` pytree (trainable/shardable);
    integer initializers stay concrete so shape chains fold at trace time.
    """
    if isinstance(model, (str, bytes)) and not isinstance(model, bytes):
        model = load_onnx(model)
    g = model.graph

    consts: Dict[str, np.ndarray] = {}
    params: Dict[str, jnp.ndarray] = {}
    for t in g.initializer:
        arr = tensor_to_np(t)
        if arr.dtype in (np.int64, np.int32, np.bool_):
            consts[t.name] = arr
        else:
            params[t.name] = jnp.asarray(arr)

    input_names = [vi.name for vi in g.input if vi.name not in consts
                   and vi.name not in params]
    output_names = list(vi.name for vi in g.output)

    def all_ops(graph):  # recurse into If/Loop/Scan subgraphs
        for n in graph.node:
            yield n.op_type
            for a in n.attribute:
                if a.type == O.AttributeProto.GRAPH:
                    yield from all_ops(a.g)
                elif a.type == O.AttributeProto.GRAPHS:
                    for sub in a.graphs:
                        yield from all_ops(sub)

    unsupported = sorted({t for t in all_ops(g) if t not in _OPS})
    if unsupported:
        raise NotImplementedError(
            f"onnx ops not supported by the frontend: {unsupported} "
            "(extend mnn_tpu.convert.onnx_frontend._OPS, or register a "
            "plugin via mnn_tpu.plugin.register_op)")

    nodes = list(g.node)

    def fn(params, *inputs):
        env: Dict[str, Any] = dict(consts)
        env.update(params)
        env[""] = None  # optional inputs
        for name, val in zip(input_names, inputs):
            env[name] = val
        _run_nodes(nodes, env)
        outs = tuple(env[n] for n in output_names)
        return outs[0] if len(outs) == 1 else outs

    fn.input_names = input_names
    fn.output_names = output_names
    return fn, params
