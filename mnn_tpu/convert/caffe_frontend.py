"""Caffe -> JAX graph converter.

Equivalent of the reference's Caffe converter frontend
(/root/reference/tools/converter/source/caffe/, per-layer converters over
a vendored caffe.proto): parses a deploy .prototxt (text) + .caffemodel
(binary NetParameter carrying the weight blobs) with a vendored minimal
wire-compatible schema (caffe_pb2; field numbers follow the public BVLC
spec) and lowers layers onto jnp — same (fn, params) contract as the
ONNX/TFLite/TF frontends.

Caffe semantics preserved: NCHW layout, grouped convolutions, CEIL
pooling rounding with window clipping, BatchNorm's scale_factor blob,
in-place layers (bottom == top).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.convert import caffe_pb2 as C


def _blob_np(b) -> np.ndarray:
    if b.shape.dim:
        shape = tuple(int(d) for d in b.shape.dim)
    else:
        legacy = [b.num, b.channels, b.height, b.width]
        shape = tuple(d for d in legacy if d) or (len(b.data),)
    return np.asarray(b.data, np.float32).reshape(shape)


def _hw(param, name, default):
    """Resolve caffe's (repeated `name` | `name_h`/`name_w`) conventions."""
    h = getattr(param, name + "_h", 0)
    w = getattr(param, name + "_w", 0)
    if h or w:
        return int(h or default), int(w or default)
    rep = getattr(param, name, [])
    if isinstance(rep, int):  # pooling uses scalar fields, conv repeated
        rep = [rep] if rep else []
    rep = list(rep)
    if len(rep) == 0:
        return default, default
    if len(rep) == 1:
        return int(rep[0]), int(rep[0])
    return int(rep[0]), int(rep[1])


# ---------------------------------------------------------------------------
# layer implementations (x is NCHW)

def _conv(layer, blobs, x, transposed=False):
    p = layer.convolution_param
    sh, sw = _hw(p, "stride", 1)
    ph, pw = _hw(p, "pad", 0)
    dil = list(p.dilation) or [1]
    d = (int(dil[0]), int(dil[-1]))
    w = jnp.asarray(blobs[0])  # [out, in/group, kh, kw]
    if transposed:
        # caffe Deconvolution weights are [in, out/group, kh, kw]; exact
        # gradient-of-conv semantics via the shared dilated-forward form
        from mnn_tpu.convert.onnx_frontend import conv_transpose2d_nchw

        out = conv_transpose2d_nchw(
            x, w, strides=(sh, sw), pads=(ph, pw, ph, pw),
            groups=int(p.group), dilation=d)
    else:
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(sh, sw), padding=((ph, ph), (pw, pw)),
            rhs_dilation=d, dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=int(p.group),
            preferred_element_type=jnp.float32).astype(x.dtype)
    if p.bias_term and len(blobs) > 1:
        out = out + jnp.asarray(blobs[1])[None, :, None, None]
    return out


def _pool_extent(n, k, s, p, ceil_mode):
    rnd = math.ceil if ceil_mode else math.floor
    out = int(rnd((n + 2 * p - k) / s)) + 1
    if p > 0 and (out - 1) * s >= n + p:  # caffe clips the last window
        out -= 1
    return out


def _pool(layer, blobs, x):
    p = layer.pooling_param
    n, c, h, w = x.shape
    if p.global_pooling:
        fn = jnp.max if p.pool == C.PoolingParameter.MAX else jnp.mean
        return fn(x, axis=(2, 3), keepdims=True)
    kh, kw = _hw(p, "kernel", int(p.kernel_size))
    sh, sw = _hw(p, "stride", int(p.stride))
    ph, pw = _hw(p, "pad", int(p.pad))
    ceil_mode = p.round_mode == C.PoolingParameter.CEIL
    oh = _pool_extent(h, kh, sh, ph, ceil_mode)
    ow = _pool_extent(w, kw, sw, pw, ceil_mode)
    # right padding may exceed `pad` under CEIL rounding
    eh = max(0, (oh - 1) * sh + kh - h - ph)
    ew = max(0, (ow - 1) * sw + kw - w - pw)
    dims = (1, 1, kh, kw)
    strides = (1, 1, sh, sw)
    if p.pool == C.PoolingParameter.MAX:
        xp = jnp.pad(x, ((0, 0), (0, 0), (ph, eh), (pw, ew)),
                     constant_values=-np.inf)
        return jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max, dims, strides,
                                     "VALID")
    # AVE: zero-pad; denominator counts window ∩ padded image (caffe rule:
    # pad positions count, the ceil overhang beyond pad does not). The
    # padded extent is h + ph + eh, which can be SHORTER than h + 2*ph
    # (FLOOR mode clips the pad), so build the count mask at that extent.
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, eh), (pw, ew)))
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, dims, strides, "VALID")
    mh = min(h + 2 * ph, h + ph + eh)
    mw = min(w + 2 * pw, w + pw + ew)
    mask = jnp.pad(jnp.ones((1, 1, mh, mw), x.dtype),
                   ((0, 0), (0, 0), (0, h + ph + eh - mh),
                    (0, w + pw + ew - mw)))
    cnt = jax.lax.reduce_window(mask, 0.0, jax.lax.add, dims, strides, "VALID")
    return s / cnt


def _inner_product(layer, blobs, x):
    p = layer.inner_product_param
    axis = p.axis if p.axis >= 0 else x.ndim + p.axis
    x2 = x.reshape(int(np.prod(x.shape[:axis])), -1)
    w = jnp.asarray(blobs[0])
    if not p.transpose:
        w = w.T
    out = jnp.dot(x2, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if p.bias_term and len(blobs) > 1:
        out = out + jnp.asarray(blobs[1])
    return out.reshape(*x.shape[:axis], -1)


def _batch_norm(layer, blobs, x):
    p = layer.batch_norm_param
    sf = float(blobs[2].reshape(-1)[0]) if len(blobs) > 2 else 1.0
    sf = 1.0 / sf if sf != 0 else 0.0
    mean = jnp.asarray(blobs[0]).reshape(-1) * sf
    var = jnp.asarray(blobs[1]).reshape(-1) * sf
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (x - mean.reshape(shape)) * jax.lax.rsqrt(
        var.reshape(shape) + p.eps)


def _scale(layer, blobs, x, y=None):
    p = layer.scale_param
    if y is None:
        y = jnp.asarray(blobs[0])
    axis = p.axis if p.axis >= 0 else x.ndim + p.axis
    shape = [1] * x.ndim
    shape[axis: axis + y.ndim] = y.shape
    out = x * y.reshape(shape)
    if p.bias_term and len(blobs) > 1:
        out = out + jnp.asarray(blobs[1]).reshape(shape)
    return out


def _lrn(layer, blobs, x):
    p = layer.lrn_param
    if p.norm_region != C.LRNParameter.ACROSS_CHANNELS:
        raise NotImplementedError("LRN WITHIN_CHANNEL")
    n = int(p.local_size)
    sq = jnp.square(x)
    pad = n // 2
    sqp = jnp.pad(sq, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    den = jax.lax.reduce_window(sqp, 0.0, jax.lax.add, (1, n, 1, 1),
                                (1, 1, 1, 1), "VALID")
    return x / jnp.power(p.k + (p.alpha / n) * den, p.beta)


def _eltwise(layer, blobs, *xs):
    p = layer.eltwise_param
    if p.operation == C.EltwiseParameter.PROD:
        out = xs[0]
        for x in xs[1:]:
            out = out * x
        return out
    if p.operation == C.EltwiseParameter.MAX:
        out = xs[0]
        for x in xs[1:]:
            out = jnp.maximum(out, x)
        return out
    coeff = list(p.coeff) or [1.0] * len(xs)
    out = xs[0] * coeff[0]
    for x, c in zip(xs[1:], coeff[1:]):
        out = out + x * c
    return out


def _reshape(layer, blobs, x):
    p = layer.reshape_param
    dims = [int(d) for d in p.shape.dim]
    axis = p.axis if p.axis >= 0 else x.ndim + p.axis
    num = p.num_axes if p.num_axes >= 0 else x.ndim - axis
    # caffe semantics: only dims [axis, axis+num) are reshaped; 0 copies
    # the corresponding source dim within that span
    span = x.shape[axis: axis + num]
    new = [span[i] if d == 0 else d for i, d in enumerate(dims)]
    return x.reshape(list(x.shape[:axis]) + new
                     + list(x.shape[axis + num:]))


def _flatten(layer, blobs, x):
    p = layer.flatten_param
    a = p.axis if p.axis >= 0 else x.ndim + p.axis
    e = p.end_axis if p.end_axis >= 0 else x.ndim + p.end_axis
    shape = x.shape[:a] + (-1,) + x.shape[e + 1:]
    return x.reshape(shape)


def _slice(layer, blobs, x):
    p = layer.slice_param
    pts = [int(v) for v in p.slice_point]
    if pts:
        return tuple(jnp.split(x, pts, axis=p.axis))
    # no slice_point: Caffe splits evenly across the layer's tops
    return tuple(jnp.split(x, max(len(layer.top), 1), axis=p.axis))


def _prelu(layer, blobs, x):
    slope = jnp.asarray(blobs[0]).reshape(-1)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    s = slope.reshape(shape) if slope.size > 1 else slope
    return jnp.where(x >= 0, x, x * s)


_LAYERS: Dict[str, Callable] = {
    "Convolution": _conv,
    "Deconvolution": lambda l, b, x: _conv(l, b, x, transposed=True),
    "Pooling": _pool,
    "InnerProduct": _inner_product,
    "BatchNorm": _batch_norm,
    "Scale": _scale,
    "LRN": _lrn,
    "Eltwise": _eltwise,
    "ReLU": lambda l, b, x: (
        jnp.where(x >= 0, x, x * l.relu_param.negative_slope)
        if l.relu_param.negative_slope else jax.nn.relu(x)),
    "ReLU6": lambda l, b, x: jnp.clip(x, 0.0, 6.0),
    "PReLU": _prelu,
    "ELU": lambda l, b, x: jnp.where(
        x >= 0, x, l.elu_param.alpha * (jnp.exp(x) - 1)),
    "Sigmoid": lambda l, b, x: jax.nn.sigmoid(x),
    "TanH": lambda l, b, x: jnp.tanh(x),
    "AbsVal": lambda l, b, x: jnp.abs(x),
    "BNLL": lambda l, b, x: jax.nn.softplus(x),
    "Power": lambda l, b, x: jnp.power(
        l.power_param.shift + l.power_param.scale * x, l.power_param.power),
    "Exp": lambda l, b, x: jnp.exp(x),
    "Log": lambda l, b, x: jnp.log(x),
    "Softmax": lambda l, b, x: jax.nn.softmax(x, axis=l.softmax_param.axis),
    "Concat": lambda l, b, *xs: jnp.concatenate(xs, axis=l.concat_param.axis),
    "Slice": _slice,
    "Reshape": _reshape,
    "Flatten": _flatten,
    "Dropout": lambda l, b, x: x,       # inference
    "Split": lambda l, b, x: x,         # fan-out; tops all alias the bottom
    "ArgMax": lambda l, b, x: jnp.argmax(
        x, axis=int(l.argmax_param.axis)).astype(jnp.int32),
}


# ---------------------------------------------------------------------------

def load_prototxt(text: str) -> "C.NetParameter":
    """Parse a deploy prototxt; unknown fields (fillers, phases) skipped."""
    from google.protobuf import text_format
    net = C.NetParameter()
    text_format.Parse(text, net, allow_unknown_field=True)
    return net


def convert_caffe(prototxt, caffemodel: Optional[bytes] = None):
    """(.prototxt path/text, .caffemodel path/bytes) ->
    (fn(params, *inputs), params).

    Weight blobs become `params` keyed "layer_name.N" (the reference keeps
    the same layer-name association when writing its model format).
    """
    if isinstance(prototxt, str) and "\n" not in prototxt:
        with open(prototxt) as f:
            prototxt = f.read()
    net = prototxt if isinstance(prototxt, C.NetParameter) else \
        load_prototxt(prototxt)

    weights: Dict[str, List[np.ndarray]] = {}
    for layer in net.layer:
        if layer.blobs:
            weights[layer.name] = [_blob_np(b) for b in layer.blobs]
    if caffemodel is not None:
        if isinstance(caffemodel, str):
            with open(caffemodel, "rb") as f:
                caffemodel = f.read()
        wnet = C.NetParameter()
        wnet.ParseFromString(caffemodel)
        for layer in wnet.layer:
            if layer.blobs:
                weights[layer.name] = [_blob_np(b) for b in layer.blobs]

    # graph inputs: `input` fields or Input layers
    input_names = list(net.input)
    layers = []
    for layer in net.layer:
        if layer.type == "Input":
            input_names.extend(layer.top)
        else:
            if layer.type not in _LAYERS:
                raise NotImplementedError(
                    f"caffe layer type not supported: {layer.type} "
                    "(extend mnn_tpu.convert.caffe_frontend._LAYERS)")
            layers.append(layer)

    params: Dict[str, jnp.ndarray] = {}
    for name, blobs in weights.items():
        for i, b in enumerate(blobs):
            params[f"{name}.{i}"] = jnp.asarray(b)

    # outputs: tops never consumed as bottoms (after in-place collapsing)
    consumed = {b for l in layers for b in l.bottom}
    produced = [t for l in layers for t in l.top]
    output_names = [t for t in produced if t not in consumed] or produced[-1:]

    def fn(params, *inputs):
        env: Dict[str, Any] = dict(zip(input_names, inputs))
        for layer in layers:
            blobs = [params[f"{layer.name}.{i}"]
                     for i in range(len(weights.get(layer.name, [])))]
            args = [env[b] for b in layer.bottom]
            out = _LAYERS[layer.type](layer, blobs, *args)
            tops = list(layer.top)
            if isinstance(out, tuple):
                for t, v in zip(tops, out):
                    env[t] = v
            elif layer.type == "Split":
                for t in tops:
                    env[t] = out
            else:
                env[tops[0]] = out
        outs = tuple(env[n] for n in output_names)
        return outs[0] if len(outs) == 1 else outs

    fn.input_names = input_names
    fn.output_names = output_names
    return fn, params
