"""ONNX frontend: build ModelProtos in-process, diff against torch/numpy
oracles — the reference's converter round-trip strategy
(/root/reference/tools/script/testMNNFromOnnx.py: run source framework and
converted model on the same random inputs, compare outputs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mnn_tpu.convert import onnx_pb2 as O
from mnn_tpu.convert.onnx_frontend import convert_onnx, tensor_to_np


def _tensor(name, arr):
    t = O.TensorProto()
    t.name = name
    t.dims.extend(arr.shape)
    dt = {np.dtype(np.float32): O.TensorProto.FLOAT,
          np.dtype(np.int64): O.TensorProto.INT64,
          np.dtype(np.int32): O.TensorProto.INT32,
          np.dtype(np.bool_): O.TensorProto.BOOL}[arr.dtype]
    t.data_type = dt
    t.raw_data = np.ascontiguousarray(arr).tobytes()
    return t


def _vi(name):
    v = O.ValueInfoProto()
    v.name = name
    return v


def _node(op_type, inputs, outputs, **attrs):
    n = O.NodeProto()
    n.op_type = op_type
    n.input.extend(inputs)
    n.output.extend(outputs)
    for k, v in attrs.items():
        a = n.attribute.add()
        a.name = k
        if isinstance(v, float):
            a.type = O.AttributeProto.FLOAT
            a.f = v
        elif isinstance(v, bool) or isinstance(v, int):
            a.type = O.AttributeProto.INT
            a.i = int(v)
        elif isinstance(v, str):
            a.type = O.AttributeProto.STRING
            a.s = v.encode()
        elif isinstance(v, (list, tuple)) and all(
                isinstance(x, int) for x in v):
            a.type = O.AttributeProto.INTS
            a.ints.extend(v)
        elif isinstance(v, (list, tuple)):
            a.type = O.AttributeProto.FLOATS
            a.floats.extend(v)
        elif isinstance(v, np.ndarray):
            a.type = O.AttributeProto.TENSOR
            a.t.CopyFrom(_tensor("", v))
        else:
            raise TypeError(type(v))
    return n


def _model(nodes, inputs, outputs, initializers=()):
    m = O.ModelProto()
    m.ir_version = 8
    op = m.opset_import.add()
    op.version = 17
    g = m.graph
    g.name = "test"
    for n in nodes:
        g.node.add().CopyFrom(n)
    for i in inputs:
        g.input.add().CopyFrom(_vi(i))
    for o in outputs:
        g.output.add().CopyFrom(_vi(o))
    for t in initializers:
        g.initializer.add().CopyFrom(t)
    # exercise real serialization (what load_onnx sees)
    return O.ModelProto.FromString(m.SerializeToString())


class TestTensorDecode:
    def test_raw_and_typed(self):
        a = np.arange(6, dtype=np.float32).reshape(2, 3)
        np.testing.assert_array_equal(tensor_to_np(_tensor("x", a)), a)
        t = O.TensorProto()
        t.dims.extend([3])
        t.data_type = O.TensorProto.INT64
        t.int64_data.extend([1, 2, 3])
        np.testing.assert_array_equal(tensor_to_np(t), [1, 2, 3])


class TestMlp:
    def test_gemm_relu_gemm_vs_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(0)
        w1 = rng.randn(16, 8).astype(np.float32)
        b1 = rng.randn(16).astype(np.float32)
        w2 = rng.randn(4, 16).astype(np.float32)
        x = rng.randn(5, 8).astype(np.float32)

        m = _model(
            [_node("Gemm", ["x", "w1", "b1"], ["h"], transB=1),
             _node("Relu", ["h"], ["a"]),
             _node("Gemm", ["a", "w2"], ["y"], transB=1)],
            ["x"], ["y"],
            [_tensor("w1", w1), _tensor("b1", b1), _tensor("w2", w2)],
        )
        fn, params = convert_onnx(m)
        got = np.asarray(fn(params, jnp.asarray(x)))
        want = F.linear(F.relu(F.linear(torch.from_numpy(x),
                                        torch.from_numpy(w1),
                                        torch.from_numpy(b1))),
                        torch.from_numpy(w2)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


class TestConvNet:
    def test_conv_bn_pool_vs_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(1)
        w = rng.randn(8, 3, 3, 3).astype(np.float32) * 0.2
        b = rng.randn(8).astype(np.float32) * 0.1
        scale = rng.rand(8).astype(np.float32) + 0.5
        bias = rng.randn(8).astype(np.float32) * 0.1
        mean = rng.randn(8).astype(np.float32) * 0.1
        var = rng.rand(8).astype(np.float32) + 0.5
        wfc = rng.randn(10, 8).astype(np.float32) * 0.3
        x = rng.randn(2, 3, 16, 16).astype(np.float32)

        m = _model(
            [_node("Conv", ["x", "w", "b"], ["c"], strides=[1, 1],
                   pads=[1, 1, 1, 1], kernel_shape=[3, 3]),
             _node("BatchNormalization",
                   ["c", "scale", "bias", "mean", "var"], ["n"],
                   epsilon=1e-5),
             _node("Relu", ["n"], ["r"]),
             _node("MaxPool", ["r"], ["p"], kernel_shape=[2, 2],
                   strides=[2, 2]),
             _node("GlobalAveragePool", ["p"], ["g"]),
             _node("Flatten", ["g"], ["f"], axis=1),
             _node("Gemm", ["f", "wfc"], ["y"], transB=1)],
            ["x"], ["y"],
            [_tensor(n, a) for n, a in [
                ("w", w), ("b", b), ("scale", scale), ("bias", bias),
                ("mean", mean), ("var", var), ("wfc", wfc)]],
        )
        fn, params = convert_onnx(m)
        got = np.asarray(fn(params, jnp.asarray(x)))

        t = torch.from_numpy
        h = F.conv2d(t(x), t(w), t(b), padding=1)
        h = F.batch_norm(h, t(mean), t(var), t(scale), t(bias), eps=1e-5)
        h = F.max_pool2d(F.relu(h), 2)
        h = h.mean((2, 3))
        want = F.linear(h, t(wfc)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


class TestShapeFolding:
    def test_shape_gather_concat_reshape(self):
        # reshape x [B, C, H, W] -> [B, C*H*W] via a Shape-compute chain
        x = np.random.RandomState(2).randn(3, 4, 5, 2).astype(np.float32)
        m = _model(
            [_node("Shape", ["x"], ["sh"]),
             _node("Gather", ["sh", "zero"], ["b"], axis=0),
             _node("Unsqueeze", ["b", "ax0"], ["b1"]),
             _node("Concat", ["b1", "neg1"], ["tgt"], axis=0),
             _node("Reshape", ["x", "tgt"], ["y"])],
            ["x"], ["y"],
            [_tensor("zero", np.asarray(0, np.int64)),
             _tensor("ax0", np.asarray([0], np.int64)),
             _tensor("neg1", np.asarray([-1], np.int64))],
        )
        fn, params = convert_onnx(m)
        got = np.asarray(fn(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, x.reshape(3, -1), atol=1e-6)


class TestTensorOps:
    def test_slice_transpose_split(self):
        x = np.arange(48, dtype=np.float32).reshape(2, 4, 6)
        m = _model(
            [_node("Transpose", ["x"], ["t"], perm=[0, 2, 1]),
             _node("Slice", ["t", "st", "en", "ax"], ["s"]),
             _node("Split", ["s"], ["a", "b"], axis=2)],
            ["x"], ["a", "b"],
            [_tensor("st", np.asarray([1], np.int64)),
             _tensor("en", np.asarray([5], np.int64)),
             _tensor("ax", np.asarray([1], np.int64))],
        )
        fn, params = convert_onnx(m)
        a, b = fn(params, jnp.asarray(x))
        want = x.transpose(0, 2, 1)[:, 1:5]
        np.testing.assert_allclose(np.asarray(a), want[..., :2])
        np.testing.assert_allclose(np.asarray(b), want[..., 2:])

    def test_attention_block(self):
        rng = np.random.RandomState(3)
        q = rng.randn(1, 4, 8).astype(np.float32)
        k = rng.randn(1, 4, 8).astype(np.float32)
        m = _model(
            [_node("Transpose", ["k"], ["kt"], perm=[0, 2, 1]),
             _node("MatMul", ["q", "kt"], ["s"]),
             _node("Softmax", ["s"], ["p"], axis=-1),
             _node("MatMul", ["p", "k"], ["y"])],
            ["q", "k"], ["y"],
        )
        fn, params = convert_onnx(m)
        got = np.asarray(fn(params, jnp.asarray(q), jnp.asarray(k)))
        s = q @ k.transpose(0, 2, 1)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        np.testing.assert_allclose(got, p @ k, atol=1e-5)

    def test_resize_vs_torch(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(4).randn(1, 3, 4, 4).astype(np.float32)
        m = _model(
            [_node("Resize", ["x", "", "scales"], ["y"], mode="nearest")],
            ["x"], ["y"],
            [_tensor("scales", np.asarray([1, 1, 2, 2], np.float32))],
        )
        # scales is float -> params; frontend needs it static: use sizes form
        m2 = _model(
            [_node("Resize", ["x", "", "", "sizes"], ["y"], mode="nearest")],
            ["x"], ["y"],
            [_tensor("sizes", np.asarray([1, 3, 8, 8], np.int64))],
        )
        fn, params = convert_onnx(m2)
        got = np.asarray(fn(params, jnp.asarray(x)))
        want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                             mode="nearest").numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_layernorm_vs_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(5)
        x = rng.randn(2, 6, 16).astype(np.float32)
        g = rng.rand(16).astype(np.float32) + 0.5
        b = rng.randn(16).astype(np.float32)
        m = _model(
            [_node("LayerNormalization", ["x", "g", "b"], ["y"], axis=-1,
                   epsilon=1e-5)],
            ["x"], ["y"], [_tensor("g", g), _tensor("b", b)],
        )
        fn, params = convert_onnx(m)
        got = np.asarray(fn(params, jnp.asarray(x)))
        want = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(g),
                            torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


class TestErrors:
    def test_unsupported_op_lists_names(self):
        m = _model([_node("FancyCustomOp", ["x"], ["y"])], ["x"], ["y"])
        with pytest.raises(NotImplementedError, match="FancyCustomOp"):
            convert_onnx(m)

    def test_jit_compiles(self):
        import jax

        x = np.random.RandomState(6).randn(2, 8).astype(np.float32)
        w = np.random.RandomState(7).randn(8, 8).astype(np.float32)
        m = _model(
            [_node("MatMul", ["x", "w"], ["h"]),
             _node("Gelu", ["h"], ["y"])],
            ["x"], ["y"], [_tensor("w", w)],
        )
        fn, params = convert_onnx(m)
        got = np.asarray(jax.jit(fn)(params, jnp.asarray(x)))
        assert got.shape == (2, 8) and np.isfinite(got).all()


class TestConvTranspose:
    def test_matches_torch_basic_and_grouped(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        for cin, cout, groups, stride, pad, opad in [
            (3, 5, 1, 2, 1, 0),      # cin != cout (channel-axis regression)
            (4, 6, 2, 2, 1, 1),      # grouped + output_padding
            (2, 2, 1, 3, 0, 0),
        ]:
            x = rng.standard_normal((1, cin, 7, 6), np.float32)
            w = rng.standard_normal((cin, cout // groups, 3, 3),
                                    np.float32) * 0.3
            node = _node("ConvTranspose", ["x", "w"], ["y"],
                         strides=[stride, stride],
                         pads=[pad, pad, pad, pad],
                         output_padding=[opad, opad], group=groups)
            m = _model([node], ["x"], ["y"], [_tensor("w", w)])
            fn, params = convert_onnx(m)
            got = np.asarray(fn(params, jnp.asarray(x)), np.float32)
            ref = torch.nn.functional.conv_transpose2d(
                torch.from_numpy(x), torch.from_numpy(w), stride=stride,
                padding=pad, output_padding=opad, groups=groups).numpy()
            np.testing.assert_allclose(got, ref, atol=2e-5,
                                       err_msg=f"{(cin, cout, groups)}")
