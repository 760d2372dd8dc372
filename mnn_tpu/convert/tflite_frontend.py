"""TFLite -> JAX graph converter.

Equivalent of the reference's TFLite converter frontend
(/root/reference/tools/converter/source/tflite/, per-op `...Tflite.cpp`
converters): parses a `.tflite` FlatBuffers model with a self-contained
minimal FlatBuffers wire-format reader (field ids transcribed from the
public tensorflow/lite/schema/schema.fbs — no generated code, mirroring
how the ONNX frontend vendors a minimal proto schema) and lowers the
graph through an op table onto jnp, producing a pure jax function +
params pytree, same contract as `convert_onnx`.

TPU notes: TFLite graphs are NHWC natively, which is exactly the layout
our conv path uses — no NCHW↔NHWC format-converter passes needed (the
reference inserts explicit format-convert ops,
tools/converter/.../AddTensorFormatConverter). Quantized weight tensors
(int8/uint8 with quantization params) are dequantized to float at
conversion; execution is float/bf16 on the MXU.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# minimal FlatBuffers wire-format reader

class _FB:
    """Read-only FlatBuffers accessor (tables, vtables, vectors, strings)."""

    def __init__(self, buf: bytes):
        self.buf = buf

    def _sc(self, fmt, pos):
        return struct.unpack_from(fmt, self.buf, pos)[0]

    def u8(self, p): return self._sc("<B", p)
    def i8(self, p): return self._sc("<b", p)
    def u16(self, p): return self._sc("<H", p)
    def i32(self, p): return self._sc("<i", p)
    def u32(self, p): return self._sc("<I", p)
    def i64(self, p): return self._sc("<q", p)
    def f32(self, p): return self._sc("<f", p)

    def root(self) -> int:
        return self.u32(0)

    def field_pos(self, table: int, fid: int) -> int:
        """Absolute position of field `fid` in `table`, or 0 if absent."""
        vt = table - self.i32(table)
        entry = 4 + 2 * fid
        if entry >= self.u16(vt):
            return 0
        off = self.u16(vt + entry)
        return table + off if off else 0

    def scalar(self, table: int, fid: int, fmt: str, default=0):
        p = self.field_pos(table, fid)
        return self._sc(fmt, p) if p else default

    def indirect(self, table: int, fid: int) -> int:
        """Follow an offset field (table/vector/string); 0 if absent."""
        p = self.field_pos(table, fid)
        return p + self.u32(p) if p else 0

    def vec_len(self, vpos: int) -> int:
        return self.u32(vpos) if vpos else 0

    def vec_table(self, vpos: int, i: int) -> int:
        ep = vpos + 4 + 4 * i
        return ep + self.u32(ep)

    def vec_scalars(self, vpos: int, dtype) -> np.ndarray:
        if not vpos:
            return np.zeros((0,), dtype)
        n = self.u32(vpos)
        return np.frombuffer(self.buf, dtype, n, vpos + 4).copy()

    def string(self, table: int, fid: int) -> str:
        sp = self.indirect(table, fid)
        if not sp:
            return ""
        n = self.u32(sp)
        return self.buf[sp + 4: sp + 4 + n].decode("utf-8", "replace")


# TensorType enum per the public tflite schema: 0=F32 1=F16 2=I32 3=U8
# 4=I64 5=STRING 6=BOOL 7=I16 8=COMPLEX64 9=I8 10=F64 11=COMPLEX128
# 12=U64 13=RESOURCE 14=VARIANT 15=U32 16=U16 17=INT4 18=BF16
_TENSOR_DTYPES = {0: np.float32, 1: np.float16, 2: np.int32, 3: np.uint8,
                  4: np.int64, 6: np.bool_, 7: np.int16, 9: np.int8,
                  10: np.float64, 12: np.uint64, 15: np.uint32,
                  16: np.uint16}


class _Tensor:
    def __init__(self, fb: _FB, tpos: int):
        self.shape = fb.vec_scalars(fb.indirect(tpos, 0), np.int32)
        self.type = fb.scalar(tpos, 1, "<b")
        self.buffer = fb.scalar(tpos, 2, "<I")
        self.name = fb.string(tpos, 3)
        self.scale = self.zero = None
        q = fb.indirect(tpos, 4)  # QuantizationParameters
        if q:
            sc = fb.vec_scalars(fb.indirect(q, 2), np.float32)
            zp = fb.vec_scalars(fb.indirect(q, 3), np.int64)
            qd = fb.scalar(q, 6, "<i")
            if sc.size:
                self.scale, self.zero, self.qdim = sc, zp, qd


class _Op:
    def __init__(self, fb: _FB, opos: int, opcodes: List[int]):
        self.code = opcodes[fb.scalar(opos, 0, "<I")]
        self.inputs = fb.vec_scalars(fb.indirect(opos, 1), np.int32)
        self.outputs = fb.vec_scalars(fb.indirect(opos, 2), np.int32)
        self._fb = fb
        self._opts = fb.indirect(opos, 4)

    # option accessors (field ids from schema.fbs builtin-options tables)
    def opt_i(self, fid, default=0):
        return self._fb.scalar(self._opts, fid, "<i", default) if self._opts \
            else default

    def opt_b(self, fid, default=0):
        return self._fb.scalar(self._opts, fid, "<b", default) if self._opts \
            else default

    def opt_bool(self, fid, default=False):
        return bool(self._fb.scalar(self._opts, fid, "<B", int(default))) \
            if self._opts else default

    def opt_f(self, fid, default=0.0):
        return self._fb.scalar(self._opts, fid, "<f", default) if self._opts \
            else default

    def opt_ivec(self, fid):
        return self._fb.vec_scalars(self._fb.indirect(self._opts, fid),
                                    np.int32) if self._opts else \
            np.zeros((0,), np.int32)


def _parse(buf: bytes):
    fb = _FB(buf)
    model = fb.root()
    ocv = fb.indirect(model, 1)  # operator_codes
    opcodes = []
    for i in range(fb.vec_len(ocv)):
        oc = fb.vec_table(ocv, i)
        code = fb.scalar(oc, 3, "<i")          # builtin_code (new field)
        if code == 0:
            code = fb.scalar(oc, 0, "<b")      # deprecated_builtin_code
        opcodes.append(code)

    bufs_v = fb.indirect(model, 4)
    buffers: List[Optional[np.ndarray]] = []
    for i in range(fb.vec_len(bufs_v)):
        b = fb.vec_table(bufs_v, i)
        dv = fb.indirect(b, 0)
        buffers.append(fb.vec_scalars(dv, np.uint8) if dv else None)

    sg = fb.vec_table(fb.indirect(model, 2), 0)  # subgraph 0
    tv = fb.indirect(sg, 0)
    tensors = [_Tensor(fb, fb.vec_table(tv, i)) for i in range(fb.vec_len(tv))]
    g_inputs = fb.vec_scalars(fb.indirect(sg, 1), np.int32)
    g_outputs = fb.vec_scalars(fb.indirect(sg, 2), np.int32)
    ov = fb.indirect(sg, 3)
    ops = [_Op(fb, fb.vec_table(ov, i), opcodes) for i in range(fb.vec_len(ov))]
    return tensors, buffers, g_inputs, g_outputs, ops


def _const_value(t: _Tensor, buffers) -> Optional[np.ndarray]:
    raw = buffers[t.buffer] if t.buffer < len(buffers) else None
    if raw is None or raw.size == 0:
        return None
    dt = _TENSOR_DTYPES.get(t.type)
    if dt is None:
        raise NotImplementedError(f"tflite tensor type {t.type}")
    arr = raw.view(dt).reshape([int(d) for d in t.shape] or [])
    if t.scale is not None and arr.dtype in (np.int8, np.uint8, np.int16):
        # weight dequantization (per-tensor or per-channel)
        sc, zp = t.scale, t.zero
        if sc.size > 1:  # per-channel along qdim
            shape = [1] * arr.ndim
            shape[t.qdim] = sc.size
            sc = sc.reshape(shape)
            zp = zp.reshape(shape) if zp.size > 1 else zp
        arr = (arr.astype(np.float32) - zp.astype(np.float32)) * sc
    return arr


# ---------------------------------------------------------------------------
# lowering table

_PAD = {0: "SAME", 1: "VALID"}


def _fused(act: int, x):
    if act == 0:
        return x
    if act == 1:
        return jax.nn.relu(x)
    if act == 2:
        return jnp.clip(x, -1.0, 1.0)
    if act == 3:
        return jnp.clip(x, 0.0, 6.0)
    if act == 4:
        return jnp.tanh(x)
    raise NotImplementedError(f"fused activation {act}")


def _conv2d(op: _Op, x, w, b=None):
    # tflite conv weights OHWI -> HWIO
    w = jnp.transpose(w, (1, 2, 3, 0))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(op.opt_i(2, 1), op.opt_i(1, 1)),
        padding=_PAD[op.opt_b(0)],
        rhs_dilation=(op.opt_i(5, 1) or 1, op.opt_i(4, 1) or 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return _fused(op.opt_b(3), out)


def _dwconv2d(op: _Op, x, w, b=None):
    # tflite depthwise weights [1, kh, kw, c*mult] -> HWIO with I=1
    c = x.shape[-1]
    w = jnp.transpose(w, (1, 2, 0, 3))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(op.opt_i(2, 1), op.opt_i(1, 1)),
        padding=_PAD[op.opt_b(0)],
        rhs_dilation=(op.opt_i(6, 1) or 1, op.opt_i(5, 1) or 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return _fused(op.opt_b(4), out)


def _transpose_conv(op: _Op, out_shape, w, x, b=None):
    # weights OHWI with O=output channels; inputs: (output_shape, w, x[, b])
    w = jnp.transpose(w, (1, 2, 0, 3))  # -> H W O I
    out = jax.lax.conv_transpose(
        x, w, strides=(op.opt_i(2, 1), op.opt_i(1, 1)),
        padding=_PAD[op.opt_b(0)],
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
        transpose_kernel=True)
    if b is not None:
        out = out + b
    return out


def _pool(kind):
    def run(op: _Op, x):
        k = (1, op.opt_i(4, 1), op.opt_i(3, 1), 1)
        s = (1, op.opt_i(2, 1), op.opt_i(1, 1), 1)
        pad = _PAD[op.opt_b(0)]
        if kind == "max":
            out = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, k, s, pad)
        else:
            out = jax.lax.reduce_window(x, 0.0, jax.lax.add, k, s, pad)
            ones = jnp.ones(x.shape[1:3] + (1,), x.dtype)[None]
            cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, k, s, pad)
            out = out / cnt
        return _fused(op.opt_b(5), out)
    return run


def _fully_connected(op: _Op, x, w, b=None):
    if not op.opt_bool(2):  # keep_num_dims=False: flatten to [batch, in]
        x = x.reshape(-1, w.shape[-1])
    out = jnp.dot(x, w.T, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return _fused(op.opt_b(0), out)


def _reshape(op: _Op, x, shape=None):
    new = op.opt_ivec(0)
    if new.size == 0 and shape is not None:
        new = np.asarray(shape)
    return x.reshape([int(d) for d in new])


def _strided_slice(op: _Op, x, begin, end, strides):
    begin, end, strides = (np.asarray(v) for v in (begin, end, strides))
    bm, em, sm = op.opt_i(0), op.opt_i(1), op.opt_i(4)
    idx = []
    for d in range(len(begin)):
        b = None if (bm >> d) & 1 else int(begin[d])
        e = None if (em >> d) & 1 else int(end[d])
        if (sm >> d) & 1:  # shrink axis
            idx.append(int(begin[d]))
        else:
            idx.append(slice(b, e, int(strides[d])))
    return x[tuple(idx)]


def _resize(method):
    def run(op: _Op, x, size):
        b, _, _, c = x.shape
        h, w = (int(v) for v in np.asarray(size))
        return jax.image.resize(x, (b, h, w, c), method=method)
    return run


def _mirror_pad(op: _Op, x, pads):
    mode = "reflect" if op.opt_b(0) == 0 else "symmetric"
    return jnp.pad(x, [tuple(p) for p in np.asarray(pads)], mode=mode)


def _batch_matmul(op: _Op, a, b):
    if op.opt_bool(0):
        a = jnp.swapaxes(a, -1, -2)
    if op.opt_bool(1):
        b = jnp.swapaxes(b, -1, -2)
    return jnp.matmul(a, b)


def _reduce(fn):
    def run(op: _Op, x, axes):
        ax = tuple(int(a) for a in np.atleast_1d(np.asarray(axes)))
        return fn(x, axis=ax, keepdims=op.opt_bool(0))
    return run


def _split(op: _Op, axis, x):
    n = op.opt_i(0, 1)
    return tuple(jnp.split(x, n, axis=int(np.asarray(axis))))


def _split_v(op: _Op, x, sizes, axis):
    sizes = np.asarray(sizes)
    pts = np.cumsum(sizes)[:-1]
    return tuple(jnp.split(x, [int(p) for p in pts], axis=int(np.asarray(axis))))


def _pack(op: _Op, *xs):
    return jnp.stack(xs, axis=op.opt_i(1))


def _unpack(op: _Op, x):
    ax = op.opt_i(1)
    n = op.opt_i(0, x.shape[ax])
    return tuple(jnp.squeeze(s, ax) for s in jnp.split(x, n, axis=ax))


def _gelu(op: _Op, x):
    return jax.nn.gelu(x, approximate=op.opt_bool(0))


def _arg(fn):
    def run(op: _Op, x, axis):
        return fn(x, axis=int(np.asarray(axis))).astype(jnp.int32)
    return run


def _cast(op: _Op, x):
    dt = _TENSOR_DTYPES.get(op.opt_b(1), np.float32)
    return jnp.asarray(x).astype(dt)


def _elem(fn, act_fid=None):
    def run(op: _Op, *xs):
        out = fn(*xs)
        return _fused(op.opt_b(act_fid), out) if act_fid is not None else out
    return run


_OPS: Dict[int, Any] = {
    0: _elem(jnp.add, 0), 41: _elem(jnp.subtract, 0),
    18: _elem(jnp.multiply, 0), 42: _elem(jnp.divide, 0),
    1: _pool("avg"), 17: _pool("max"),
    2: lambda op, *xs: _fused(op.opt_b(1), jnp.concatenate(xs, op.opt_i(0))),
    3: _conv2d, 4: _dwconv2d, 67: _transpose_conv,
    9: _fully_connected,
    14: _elem(jax.nn.sigmoid), 19: _elem(jax.nn.relu),
    21: _elem(lambda x: jnp.clip(x, 0.0, 6.0)), 28: _elem(jnp.tanh),
    22: _reshape,
    25: lambda op, x: jax.nn.softmax(x * op.opt_f(0, 1.0), axis=-1),
    50: _elem(jax.nn.log_softmax),
    34: lambda op, x, p: jnp.pad(x, [tuple(q) for q in np.asarray(p)]),
    60: lambda op, x, p, v: jnp.pad(x, [tuple(q) for q in np.asarray(p)],
                                    constant_values=float(np.asarray(v))),
    100: _mirror_pad,
    39: lambda op, x, perm: jnp.transpose(x, tuple(int(p) for p
                                                   in np.asarray(perm))),
    40: _reduce(jnp.mean), 74: _reduce(jnp.sum), 82: _reduce(jnp.max),
    89: _reduce(jnp.min), 81: _reduce(jnp.prod),
    43: lambda op, x: jnp.squeeze(x, tuple(int(a) for a in op.opt_ivec(0))
                                  or None),
    70: lambda op, x, ax: jnp.expand_dims(x, int(np.asarray(ax))),
    45: _strided_slice,
    65: lambda op, x, b, s: jax.lax.dynamic_slice(
        x, [int(v) for v in np.asarray(b)],
        [int(v) if v != -1 else int(d) - int(bb) for v, d, bb
         in zip(np.asarray(s), x.shape, np.asarray(b))]),
    47: _elem(jnp.exp), 73: _elem(jnp.log), 75: _elem(jnp.sqrt),
    76: _elem(jax.lax.rsqrt), 78: _elem(jnp.power),
    59: _elem(jnp.negative), 101: _elem(jnp.abs), 92: _elem(jnp.square),
    99: _elem(lambda a, b: jnp.square(a - b)),
    8: _elem(jnp.floor), 104: _elem(jnp.ceil),
    116: _elem(lambda x: jnp.round(x)),
    90: _elem(lambda a, b: jnp.floor_divide(a, b)),
    95: _elem(jnp.mod),
    55: _elem(jnp.maximum), 57: _elem(jnp.minimum),
    58: _elem(jnp.less), 61: _elem(jnp.greater), 71: _elem(jnp.equal),
    72: _elem(jnp.not_equal), 62: _elem(jnp.greater_equal),
    63: _elem(jnp.less_equal),
    84: _elem(jnp.logical_or), 86: _elem(jnp.logical_and),
    87: _elem(jnp.logical_not),
    64: _elem(jnp.where), 123: _elem(jnp.where),
    54: _elem(lambda x, a: jnp.where(x >= 0, x, x * a)),
    98: lambda op, x: jnp.where(x >= 0, x, x * op.opt_f(0, 0.01)),
    111: _elem(jax.nn.elu),
    117: _elem(lambda x: x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0),
    150: _gelu,
    11: _elem(lambda x: x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)),
    66: _elem(jnp.sin), 108: _elem(jnp.cos),
    36: lambda op, x, i: jnp.take(x, jnp.asarray(i), axis=op.opt_i(0)),
    107: lambda op, x, i: x[tuple(jnp.moveaxis(jnp.asarray(i), -1, 0))],
    69: lambda op, x, r: jnp.tile(x, tuple(int(v) for v in np.asarray(r))),
    77: lambda op, x: np.asarray(x.shape, np.int32),
    110: lambda op, x: np.int32(x.ndim),
    94: lambda op, s, v: jnp.full([int(d) for d in np.asarray(s)],
                                  np.asarray(v)),
    93: _elem(jnp.zeros_like),
    83: _pack, 88: _unpack, 49: _split, 102: _split_v,
    53: _cast, 56: _arg(jnp.argmax), 79: _arg(jnp.argmin),
    23: _resize("bilinear"), 97: _resize("nearest"),
    26: lambda op, x: _space_to_depth(x, op.opt_i(0, 2)),
    5: lambda op, x: _depth_to_space(x, op.opt_i(0, 2)),
    106: lambda op, *xs: sum(xs),
    6: _elem(lambda x: x),    # DEQUANTIZE (weights already dequantized)
    114: _elem(lambda x: x),  # QUANTIZE (float execution)
    126: _batch_matmul,
}

_OP_NAMES = {3: "CONV_2D", 4: "DEPTHWISE_CONV_2D", 9: "FULLY_CONNECTED"}


def _space_to_depth(x, bs):
    b, h, w, c = x.shape
    x = x.reshape(b, h // bs, bs, w // bs, bs, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // bs, w // bs,
                                                 c * bs * bs)


def _depth_to_space(x, bs):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, bs, bs, c // (bs * bs))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * bs, w * bs,
                                                 c // (bs * bs))


# ---------------------------------------------------------------------------

def convert_tflite(model):
    """.tflite path or bytes -> (fn(params, *inputs) -> output(s), params).

    Same contract as convert_onnx: float constants become the `params`
    pytree; integer constants stay concrete so shapes fold at trace time.
    """
    if isinstance(model, str):
        with open(model, "rb") as f:
            model = f.read()
    tensors, buffers, g_in, g_out, ops = _parse(model)

    unsupported = sorted({o.code for o in ops if o.code not in _OPS})
    if unsupported:
        raise NotImplementedError(
            f"tflite builtin ops not supported: {unsupported} "
            "(extend mnn_tpu.convert.tflite_frontend._OPS)")

    consts: Dict[int, np.ndarray] = {}
    params: Dict[str, jnp.ndarray] = {}
    param_idx: Dict[int, str] = {}
    for i, t in enumerate(tensors):
        val = _const_value(t, buffers)
        if val is None:
            continue
        if val.dtype in (np.float32, np.float16, np.float64):
            name = t.name or f"t{i}"
            params[name] = jnp.asarray(val, jnp.float32)
            param_idx[i] = name
        else:
            consts[i] = val

    input_idx = [int(i) for i in g_in]
    output_idx = [int(i) for i in g_out]

    def fn(params, *inputs):
        env: Dict[int, Any] = dict(consts)
        for i, name in param_idx.items():
            env[i] = params[name]
        for i, val in zip(input_idx, inputs):
            env[i] = val
        for op in ops:
            args = [env[int(i)] if i >= 0 else None for i in op.inputs]
            while args and args[-1] is None:
                args.pop()
            out = _OPS[op.code](op, *args)
            if isinstance(out, tuple):
                for oi, v in zip(op.outputs, out):
                    env[int(oi)] = v
            else:
                env[int(op.outputs[0])] = out
        outs = tuple(env[i] for i in output_idx)
        return outs[0] if len(outs) == 1 else outs

    fn.input_names = [tensors[i].name or f"t{i}" for i in input_idx]
    fn.output_names = [tensors[i].name or f"t{i}" for i in output_idx]
    fn.input_shapes = [tuple(int(d) for d in tensors[i].shape)
                       for i in input_idx]
    return fn, params
