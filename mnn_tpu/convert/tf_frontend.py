"""TensorFlow GraphDef -> JAX graph converter.

Equivalent of the reference's TensorFlow converter frontend
(/root/reference/tools/converter/source/tensorflow/, per-op `...Tf.cpp`
converters over a vendored GraphDef proto): lowers GraphDef NodeDefs
through an op table onto jnp, producing the same (fn, params) contract
as convert_onnx / convert_tflite.

The proto itself is parsed with the tensorflow package when present
(this environment ships it); the lowering below never executes TF — it
only reads NodeDef attrs — so converted functions are pure jax and
jit-compile for TPU. NHWC graphs only (TF's default; the reference
inserts NCHW converters for the rare NCHW graph, we reject instead).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

_OPS: Dict[str, Callable] = {}


def op(*names):
    def deco(fn):
        for n in names:
            _OPS[n] = fn
        return fn
    return deco


# -- attr helpers -----------------------------------------------------------

def _a(node, name, default=None):
    if name not in node.attr:
        return default
    v = node.attr[name]
    kind = v.WhichOneof("value")
    if kind == "i":
        return int(v.i)
    if kind == "f":
        return float(v.f)
    if kind == "b":
        return bool(v.b)
    if kind == "s":
        return v.s.decode()
    if kind == "list":
        lst = v.list
        for field in ("i", "f", "b", "s"):
            vals = list(getattr(lst, field))
            if vals:
                return vals
        return []
    return default


def _nhwc(node):
    fmt = _a(node, "data_format", "NHWC")
    if fmt not in (None, "NHWC"):
        raise NotImplementedError(f"{node.op}: data_format {fmt} (NHWC only)")


def _pad_attr(node):
    p = _a(node, "padding", "SAME")
    if p == "EXPLICIT":
        ep = _a(node, "explicit_paddings", [])
        return [(int(ep[2 * i]), int(ep[2 * i + 1])) for i in (1, 2)]
    return p


# -- math / activations -----------------------------------------------------

def _elem(fn):
    return lambda node, *xs: fn(*xs)


for tf_name, fn in {
    "AddV2": jnp.add, "Add": jnp.add, "Sub": jnp.subtract,
    "Mul": jnp.multiply, "RealDiv": jnp.divide, "Div": jnp.divide,
    "Maximum": jnp.maximum, "Minimum": jnp.minimum, "Pow": jnp.power,
    "SquaredDifference": lambda a, b: jnp.square(a - b),
    "FloorDiv": jnp.floor_divide, "FloorMod": jnp.mod,
    "Relu": jax.nn.relu, "Relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "Sigmoid": jax.nn.sigmoid, "Tanh": jnp.tanh, "Elu": jax.nn.elu,
    "Selu": jax.nn.selu, "Softplus": jax.nn.softplus,
    "Softsign": lambda x: x / (1 + jnp.abs(x)),
    "Exp": jnp.exp, "Log": jnp.log, "Sqrt": jnp.sqrt,
    "Rsqrt": jax.lax.rsqrt, "Neg": jnp.negative, "Abs": jnp.abs,
    "Square": jnp.square, "Erf": jax.lax.erf, "Floor": jnp.floor,
    "Ceil": jnp.ceil, "Round": jnp.round, "Sign": jnp.sign,
    "Sin": jnp.sin, "Cos": jnp.cos,
    "Reciprocal": jnp.reciprocal,
    "LogicalAnd": jnp.logical_and, "LogicalOr": jnp.logical_or,
    "LogicalNot": jnp.logical_not,
    "Equal": jnp.equal, "NotEqual": jnp.not_equal, "Less": jnp.less,
    "LessEqual": jnp.less_equal, "Greater": jnp.greater,
    "GreaterEqual": jnp.greater_equal,
    "Select": jnp.where, "SelectV2": jnp.where,
    "Identity": lambda x: x, "StopGradient": lambda x: x,
    "ZerosLike": jnp.zeros_like, "OnesLike": jnp.ones_like,
}.items():
    _OPS[tf_name] = _elem(fn)


@op("BiasAdd")
def _bias_add(node, x, bias):
    # bias broadcasts over the CHANNEL axis; NCHW would silently broadcast
    # over W with a plain add, so reject it like the conv lowerings do
    _nhwc(node)
    return jnp.add(x, bias)


@op("LeakyRelu")
def _leaky(node, x):
    return jnp.where(x >= 0, x, x * _a(node, "alpha", 0.2))


@op("Softmax")
def _softmax(node, x):
    return jax.nn.softmax(x, axis=-1)


@op("LogSoftmax")
def _log_softmax(node, x):
    return jax.nn.log_softmax(x, axis=-1)


# -- matmul / conv / pool ---------------------------------------------------

@op("MatMul")
def _matmul(node, a, b):
    if _a(node, "transpose_a", False):
        a = a.T
    if _a(node, "transpose_b", False):
        b = b.T
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


@op("BatchMatMulV2", "BatchMatMul", "BatchMatMulV3")
def _batch_matmul(node, a, b):
    if _a(node, "adj_x", False):
        a = jnp.swapaxes(a, -1, -2)
    if _a(node, "adj_y", False):
        b = jnp.swapaxes(b, -1, -2)
    return jnp.matmul(a, b)


@op("Conv2D")
def _conv2d(node, x, w):
    _nhwc(node)
    s = _a(node, "strides", [1, 1, 1, 1])
    d = _a(node, "dilations", [1, 1, 1, 1])
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(int(s[1]), int(s[2])), padding=_pad_attr(node),
        rhs_dilation=(int(d[1]), int(d[2])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


@op("DepthwiseConv2dNative")
def _dwconv(node, x, w):
    _nhwc(node)
    s = _a(node, "strides", [1, 1, 1, 1])
    kh, kw, c, m = w.shape
    return jax.lax.conv_general_dilated(
        x, w.reshape(kh, kw, 1, c * m),
        window_strides=(int(s[1]), int(s[2])), padding=_pad_attr(node),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        preferred_element_type=jnp.float32).astype(x.dtype)


@op("Conv2DBackpropInput")
def _deconv(node, out_shape, w, x):
    _nhwc(node)
    s = _a(node, "strides", [1, 1, 1, 1])
    out = jax.lax.conv_transpose(
        x, w, strides=(int(s[1]), int(s[2])), padding=_pad_attr(node),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    # TF derives SAME padding from the requested output shape (input 0);
    # crop symmetrically when conv_transpose over-produces (odd sizes)
    oh, ow = int(np.asarray(out_shape)[1]), int(np.asarray(out_shape)[2])
    if out.shape[1] < oh or out.shape[2] < ow:
        raise NotImplementedError(
            f"Conv2DBackpropInput: produced {out.shape[1:3]}, "
            f"requested {(oh, ow)}")
    top = (out.shape[1] - oh) // 2
    left = (out.shape[2] - ow) // 2
    return out[:, top: top + oh, left: left + ow]


def _pool(kind):
    def run(node, x):
        _nhwc(node)
        k = _a(node, "ksize", [1, 1, 1, 1])
        s = _a(node, "strides", [1, 1, 1, 1])
        k = tuple(int(v) for v in k)
        s = tuple(int(v) for v in s)
        pad = _pad_attr(node)
        if kind == "max":
            return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, k, s, pad)
        out = jax.lax.reduce_window(x, 0.0, jax.lax.add, k, s, pad)
        ones = jnp.ones_like(x[..., :1])
        cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, k, s, pad)
        return out / cnt
    return run


_OPS["MaxPool"] = _pool("max")
_OPS["AvgPool"] = _pool("avg")


@op("FusedBatchNormV3", "FusedBatchNorm", "FusedBatchNormV2")
def _fused_bn(node, x, scale, offset, mean, var):
    eps = _a(node, "epsilon", 1e-3)
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + offset
    return (y,)  # TF emits 5-6 outputs; only y is consumed in inference


# -- shape / layout ---------------------------------------------------------

@op("Reshape")
def _reshape(node, x, shape):
    return x.reshape([int(d) for d in np.asarray(shape)])


@op("Transpose")
def _transpose(node, x, perm):
    return jnp.transpose(x, tuple(int(p) for p in np.asarray(perm)))


@op("ConcatV2")
def _concat(node, *args):
    return jnp.concatenate(args[:-1], axis=int(np.asarray(args[-1])))


@op("Split")
def _split(node, axis, x):
    return tuple(jnp.split(x, _a(node, "num_split"),
                           axis=int(np.asarray(axis))))


@op("SplitV")
def _splitv(node, x, sizes, axis):
    pts = np.cumsum(np.asarray(sizes))[:-1]
    return tuple(jnp.split(x, [int(p) for p in pts],
                           axis=int(np.asarray(axis))))


@op("Pad", "PadV2", "MirrorPad")
def _padop(node, x, pads, value=None):
    pads = [tuple(int(v) for v in p) for p in np.asarray(pads)]
    if node.op == "MirrorPad":
        mode = _a(node, "mode", "REFLECT").lower()
        return jnp.pad(x, pads, mode=mode)
    return jnp.pad(x, pads,
                   constant_values=float(np.asarray(value)) if value is not None
                   else 0.0)


@op("Squeeze")
def _squeeze(node, x):
    dims = _a(node, "squeeze_dims", []) or _a(node, "axis", [])
    return jnp.squeeze(x, tuple(int(d) for d in dims) or None)


@op("ExpandDims")
def _expand_dims(node, x, axis):
    return jnp.expand_dims(x, int(np.asarray(axis)))


@op("StridedSlice")
def _strided_slice(node, x, begin, end, strides):
    begin, end, strides = (np.asarray(v) for v in (begin, end, strides))
    bm, em = _a(node, "begin_mask", 0), _a(node, "end_mask", 0)
    sm = _a(node, "shrink_axis_mask", 0)
    nm = _a(node, "new_axis_mask", 0)
    idx: List[Any] = []
    for d in range(len(begin)):
        if (nm >> d) & 1:
            idx.append(None)
        elif (sm >> d) & 1:
            idx.append(int(begin[d]))
        else:
            b = None if (bm >> d) & 1 else int(begin[d])
            e = None if (em >> d) & 1 else int(end[d])
            idx.append(slice(b, e, int(strides[d])))
    return x[tuple(idx)]


@op("Slice")
def _slice(node, x, begin, size):
    begin, size = np.asarray(begin), np.asarray(size)
    sizes = [int(v) if v != -1 else int(d) - int(b)
             for v, d, b in zip(size, x.shape, begin)]
    return jax.lax.dynamic_slice(x, [int(b) for b in begin], sizes)


@op("Pack")
def _pack(node, *xs):
    return jnp.stack(xs, axis=_a(node, "axis", 0))


@op("Unpack")
def _unpack(node, x):
    ax = _a(node, "axis", 0)
    return tuple(jnp.squeeze(s, ax)
                 for s in jnp.split(x, _a(node, "num"), axis=ax))


@op("GatherV2", "Gather")
def _gather(node, x, idx, axis=None):
    ax = int(np.asarray(axis)) if axis is not None else 0
    return jnp.take(x, jnp.asarray(idx), axis=ax)


@op("GatherNd")
def _gather_nd(node, x, idx):
    return x[tuple(jnp.moveaxis(jnp.asarray(idx), -1, 0))]


@op("Tile")
def _tile(node, x, reps):
    return jnp.tile(x, tuple(int(v) for v in np.asarray(reps)))


@op("Fill")
def _fill(node, shape, value):
    return jnp.full([int(d) for d in np.asarray(shape)], np.asarray(value))


@op("Shape")
def _shape(node, x):
    return np.asarray(x.shape, np.int32)


@op("Rank")
def _rank(node, x):
    return np.int32(x.ndim)


@op("Size")
def _size(node, x):
    return np.int32(int(np.prod(x.shape)))


@op("Range")
def _range(node, start, limit, delta):
    return np.arange(int(np.asarray(start)), int(np.asarray(limit)),
                     int(np.asarray(delta)), np.int32)


@op("Cast")
def _cast(node, x):
    from tensorflow.python.framework import dtypes  # attr DstT is a TF enum
    dt = dtypes.as_dtype(node.attr["DstT"].type).as_numpy_dtype
    return jnp.asarray(x).astype(dt)


# -- reductions -------------------------------------------------------------

def _reduce(fn):
    def run(node, x, axes):
        ax = tuple(int(a) for a in np.atleast_1d(np.asarray(axes)))
        return fn(x, axis=ax, keepdims=_a(node, "keep_dims", False))
    return run


_OPS["Mean"] = _reduce(jnp.mean)
_OPS["Sum"] = _reduce(jnp.sum)
_OPS["Max"] = _reduce(jnp.max)
_OPS["Min"] = _reduce(jnp.min)
_OPS["Prod"] = _reduce(jnp.prod)
_OPS["All"] = _reduce(jnp.all)
_OPS["Any"] = _reduce(jnp.any)


@op("ArgMax")
def _argmax(node, x, axis):
    # int32 result (TPU has no x64; consumers cast as needed)
    return jnp.argmax(x, axis=int(np.asarray(axis))).astype(jnp.int32)


@op("ArgMin")
def _argmin(node, x, axis):
    return jnp.argmin(x, axis=int(np.asarray(axis))).astype(jnp.int32)


def _check_resize_attrs(node):
    """jax.image.resize implements half_pixel_centers semantics; TF's
    legacy align_corners grid differs at every interior pixel — refuse it
    rather than silently resampling on the wrong grid."""
    if _a(node, "align_corners", False):
        raise NotImplementedError(f"{node.op}: align_corners=True")


@op("ResizeBilinear")
def _resize_bl(node, x, size):
    _check_resize_attrs(node)
    h, w = (int(v) for v in np.asarray(size))
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]),
                            method="bilinear")


@op("ResizeNearestNeighbor")
def _resize_nn(node, x, size):
    _check_resize_attrs(node)
    h, w = (int(v) for v in np.asarray(size))
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]),
                            method="nearest")


# ---------------------------------------------------------------------------

def convert_graphdef(graph_def, outputs: Optional[List[str]] = None,
                     inputs: Optional[List[str]] = None):
    """GraphDef (proto or a tf.function/concrete function) ->
    (fn(params, *inputs) -> output(s), params).

    Float Const nodes become `params`; integer Consts stay concrete so
    shape chains fold at trace time. `inputs` defaults to the graph's
    Placeholders in definition order; `outputs` defaults to sink nodes.
    """
    graph_def = _as_graph_def(graph_def)
    from tensorflow.python.framework import tensor_util

    nodes = [n for n in graph_def.node if n.op != "NoOp"]
    consts: Dict[str, np.ndarray] = {}
    params: Dict[str, jnp.ndarray] = {}
    placeholders: List[str] = []
    compute = []
    for n in nodes:
        if n.op == "Const":
            arr = tensor_util.MakeNdarray(n.attr["value"].tensor)
            if arr.dtype in (np.float32, np.float16, np.float64):
                params[n.name] = jnp.asarray(arr, jnp.float32)
            else:
                consts[n.name] = arr
        elif n.op in ("Placeholder", "PlaceholderWithDefault"):
            placeholders.append(n.name)
        else:
            if n.op not in _OPS:
                raise NotImplementedError(
                    f"tf op not supported by the frontend: {n.op} "
                    "(extend mnn_tpu.convert.tf_frontend._OPS)")
            compute.append(n)

    input_names = list(inputs) if inputs is not None else placeholders
    if outputs is None:
        consumed = {inp.split(":")[0].lstrip("^")
                    for n in compute for inp in n.input}
        outputs = [n.name for n in compute if n.name not in consumed]
    output_refs = [o if ":" in o else o + ":0" for o in outputs]

    def fn(params, *args):
        env: Dict[str, Any] = {k: (v,) for k, v in consts.items()}
        env.update({k: (v,) for k, v in params.items()})
        for name, val in zip(input_names, args):
            env[name] = (val,)

        def resolve(ref):
            ref = ref.split(":")
            vals = env[ref[0]]
            return vals[int(ref[1]) if len(ref) > 1 else 0]

        for n in compute:
            ins = [resolve(i) for i in n.input if not i.startswith("^")]
            out = _OPS[n.op](n, *ins)
            env[n.name] = out if isinstance(out, tuple) else (out,)
        outs = tuple(resolve(r) for r in output_refs)
        return outs[0] if len(outs) == 1 else outs

    fn.input_names = input_names
    fn.output_names = outputs
    return fn, params


def _as_graph_def(g):
    if hasattr(g, "node"):
        return g
    if hasattr(g, "get_concrete_function"):  # tf.function
        g = g.get_concrete_function()
    if hasattr(g, "graph"):                  # concrete function
        return g.graph.as_graph_def()
    raise TypeError(f"cannot extract GraphDef from {type(g)}")
