"""Breadth ONNX ops (trig/hyperbolic family, reduce variants, scatter /
gather-nd, depth<->space, LRN, quantize/dequantize, NMS, ...) vs
torch/numpy oracles — extends the converter round-trip strategy of
test_onnx.py toward the reference's full converter table
(/root/reference/tools/converter/source/onnx/)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mnn_tpu.convert import onnx_pb2 as O
from mnn_tpu.convert.onnx_frontend import convert_onnx

from tests.test_onnx import _model, _node, _tensor


def _run(nodes, feeds, outputs=("y",), initializers=()):
    m = _model(nodes, list(feeds), list(outputs), initializers)
    fn, params = convert_onnx(m)
    out = fn(params, *[jnp.asarray(v) for v in feeds.values()])
    return np.asarray(out)


class TestUnaryFamily:
    @pytest.mark.parametrize("op,ref", [
        ("Tan", np.tan), ("Atan", np.arctan), ("Sinh", np.sinh),
        ("Cosh", np.cosh), ("Asinh", np.arcsinh), ("Atanh", np.arctanh),
        ("Softsign", lambda x: x / (1 + np.abs(x))),
    ])
    def test_elementwise(self, op, ref):
        x = np.linspace(-0.9, 0.9, 24).astype(np.float32).reshape(4, 6)
        got = _run([_node(op, ["x"], ["y"])], {"x": x})
        np.testing.assert_allclose(got, ref(x), atol=1e-5, rtol=1e-5)

    def test_asin_acos(self):
        x = np.linspace(-0.99, 0.99, 12).astype(np.float32)
        got = _run([_node("Asin", ["x"], ["y"])], {"x": x})
        np.testing.assert_allclose(got, np.arcsin(x), atol=1e-5)
        got = _run([_node("Acos", ["x"], ["y"])], {"x": x})
        np.testing.assert_allclose(got, np.arccos(x), atol=1e-5)

    @pytest.mark.parametrize("op,torch_fn", [
        ("Selu", "selu"), ("Celu", "celu"), ("Softsign", "softsign"),
    ])
    def test_activations_vs_torch(self, op, torch_fn):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(0).randn(3, 5).astype(np.float32)
        got = _run([_node(op, ["x"], ["y"])], {"x": x})
        want = getattr(F, torch_fn)(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_shrink_hardmax_thresholded(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(1).randn(2, 6).astype(np.float32)
        got = _run([_node("Shrink", ["x"], ["y"], lambd=0.5, bias=0.1)],
                   {"x": x})
        want = F.hardshrink(torch.from_numpy(x), 0.5).numpy()
        want = np.where(want > 0, want - 0.1, np.where(want < 0,
                                                       want + 0.1, 0.0))
        np.testing.assert_allclose(got, want, atol=1e-6)
        got = _run([_node("Hardmax", ["x"], ["y"], axis=-1)], {"x": x})
        assert (got.sum(-1) == 1).all()
        assert (got.argmax(-1) == x.argmax(-1)).all()
        got = _run([_node("ThresholdedRelu", ["x"], ["y"], alpha=0.3)],
                   {"x": x})
        np.testing.assert_allclose(got, np.where(x > 0.3, x, 0.0))


class TestReduceFamily:
    @pytest.mark.parametrize("op,ref", [
        ("ReduceL1", lambda x, a: np.abs(x).sum(a, keepdims=True)),
        ("ReduceSumSquare", lambda x, a: (x * x).sum(a, keepdims=True)),
        ("ReduceLogSum", lambda x, a: np.log(x.sum(a, keepdims=True))),
        ("ReduceLogSumExp",
         lambda x, a: np.log(np.exp(x).sum(a, keepdims=True))),
    ])
    def test_reduce(self, op, ref):
        x = np.random.RandomState(2).rand(3, 4, 5).astype(np.float32) + 0.1
        got = _run([_node(op, ["x"], ["y"], axes=[1])], {"x": x})
        np.testing.assert_allclose(got, ref(x, 1), atol=1e-4, rtol=1e-4)

    def test_argmin_cumsum(self):
        x = np.random.RandomState(3).randn(4, 6).astype(np.float32)
        got = _run([_node("ArgMin", ["x"], ["y"], axis=1, keepdims=0)],
                   {"x": x})
        np.testing.assert_array_equal(got, x.argmin(1))
        ax = np.asarray([1], np.int64)
        got = _run([_node("CumSum", ["x", "ax"], ["y"])], {"x": x},
                   initializers=[_tensor("ax", ax)])
        np.testing.assert_allclose(got, np.cumsum(x, 1), atol=1e-5)


class TestSpatial:
    def test_depth_to_space_dcr_crd(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(4).randn(1, 8, 3, 2).astype(np.float32)
        got = _run([_node("DepthToSpace", ["x"], ["y"], blocksize=2,
                          mode="DCR")], {"x": x})
        want = F.pixel_shuffle(torch.from_numpy(
            x.reshape(1, 2, 2, 2, 3, 2).transpose(0, 3, 1, 2, 4, 5)
            .reshape(1, 8, 3, 2)), 2).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)
        got_crd = _run([_node("DepthToSpace", ["x"], ["y"], blocksize=2,
                              mode="CRD")], {"x": x})
        want_crd = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
        np.testing.assert_allclose(got_crd, want_crd, atol=1e-6)

    def test_space_to_depth_roundtrip(self):
        x = np.random.RandomState(5).randn(1, 2, 4, 6).astype(np.float32)
        down = _run([_node("SpaceToDepth", ["x"], ["y"], blocksize=2)],
                    {"x": x})
        assert down.shape == (1, 8, 2, 3)
        back = _run([_node("DepthToSpace", ["x"], ["y"], blocksize=2,
                           mode="DCR")], {"x": down})
        np.testing.assert_allclose(back, x, atol=1e-6)

    def test_lrn_vs_torch(self):
        import torch

        x = np.random.RandomState(6).randn(2, 7, 3, 3).astype(np.float32)
        got = _run([_node("LRN", ["x"], ["y"], size=3, alpha=2e-4,
                          beta=0.6, bias=1.2)], {"x": x})
        want = torch.nn.LocalResponseNorm(3, alpha=2e-4, beta=0.6, k=1.2)(
            torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    def test_group_norm_vs_torch(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(7).randn(2, 6, 4).astype(np.float32)
        w = np.random.RandomState(8).rand(6).astype(np.float32)
        b = np.random.RandomState(9).rand(6).astype(np.float32)
        got = _run([_node("GroupNormalization", ["x", "w", "b"], ["y"],
                          num_groups=3, epsilon=1e-5)], {"x": x},
                   initializers=[_tensor("w", w), _tensor("b", b)])
        want = F.group_norm(torch.from_numpy(x), 3, torch.from_numpy(w),
                            torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


class TestIndexing:
    def test_gather_nd(self):
        data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        idx = np.asarray([[0, 1], [1, 2]], np.int64)
        got = _run([_node("GatherND", ["d", "i"], ["y"])],
                   {"d": data, "i": idx})
        np.testing.assert_array_equal(got, data[[0, 1], [1, 2]])

    def test_scatter_nd(self):
        data = np.zeros((4, 3), np.float32)
        idx = np.asarray([[1], [3]], np.int64)
        upd = np.ones((2, 3), np.float32) * 7
        got = _run([_node("ScatterND", ["d", "i", "u"], ["y"])],
                   {"d": data, "i": idx, "u": upd})
        want = data.copy()
        want[[1, 3]] = 7
        np.testing.assert_array_equal(got, want)

    def test_scatter_elements(self):
        import torch

        data = np.zeros((3, 5), np.float32)
        idx = np.asarray([[0, 2], [1, 4], [2, 3]], np.int64)
        upd = np.random.RandomState(10).rand(3, 2).astype(np.float32)
        got = _run([_node("ScatterElements", ["d", "i", "u"], ["y"], axis=1)],
                   {"d": data, "i": idx, "u": upd})
        want = torch.zeros(3, 5).scatter_(
            1, torch.from_numpy(idx), torch.from_numpy(upd)).numpy()
        np.testing.assert_allclose(got, want)

    def test_onehot_trilu_eyelike(self):
        idx = np.asarray([0, 2, 1], np.int64)
        got = _run([_node("OneHot", ["i", "d", "v"], ["y"], axis=-1)],
                   {"i": idx},
                   initializers=[_tensor("d", np.asarray([4], np.int64)),
                                 _tensor("v", np.asarray([0.0, 1.0],
                                                         np.float32))])
        np.testing.assert_array_equal(got, np.eye(4)[idx])
        x = np.random.RandomState(11).randn(4, 4).astype(np.float32)
        got = _run([_node("Trilu", ["x"], ["y"], upper=0)], {"x": x})
        np.testing.assert_array_equal(got, np.tril(x))
        got = _run([_node("EyeLike", ["x"], ["y"], k=1)], {"x": x})
        np.testing.assert_array_equal(got, np.eye(4, 4, 1, dtype=np.float32))


class TestQuantNms:
    def test_quant_dequant_roundtrip(self):
        x = np.random.RandomState(12).rand(3, 4).astype(np.float32) * 10
        s = np.asarray(0.1, np.float32)
        z = np.asarray(5, np.uint8)
        # QuantizeLinear needs uint8 zero-point initializer support
        q = np.clip(np.round(x / 0.1) + 5, 0, 255).astype(np.uint8)
        got = _run([_node("DequantizeLinear", ["q", "s", "z"], ["y"])],
                   {"q": q.astype(np.int32)},
                   initializers=[_tensor("s", s.reshape(())),
                                 _tensor("z", np.asarray(5, np.int32)
                                         .reshape(()))])
        np.testing.assert_allclose(got, (q.astype(np.int32) - 5) * 0.1,
                                   atol=1e-6)

    def test_nms(self):
        boxes = np.asarray([[[0, 0, 1, 1], [0, 0.05, 1, 1.05],
                             [0, 2, 1, 3]]], np.float32)
        scores = np.asarray([[[0.9, 0.8, 0.7]]], np.float32)
        got = _run(
            [_node("NonMaxSuppression", ["b", "s", "m", "t"], ["y"])],
            {"b": boxes, "s": scores},
            initializers=[_tensor("m", np.asarray([2], np.int64)),
                          _tensor("t", np.asarray([0.5], np.float32))])
        # box 1 suppressed by box 0 (iou > 0.5); boxes 0 and 2 kept
        assert got.tolist() == [[0, 0, 0], [0, 0, 2]]
