"""ONNX control flow (If/Loop/Scan) + sampling tail vs torch/numpy oracles.

Reference converters: tools/converter/source/onnx/{If,Loop,GridSample,
ROIAlign}Onnx.cpp; coverage notes in docs/onnx_coverage.md.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mnn_tpu.convert import onnx_pb2 as O
from mnn_tpu.convert.onnx_frontend import convert_onnx

from tests.test_onnx import _model, _node, _tensor, _vi


def _graph(name, nodes, inputs, outputs, initializers=()):
    g = O.GraphProto()
    g.name = name
    for n in nodes:
        g.node.add().CopyFrom(n)
    for i in inputs:
        g.input.add().CopyFrom(_vi(i))
    for o in outputs:
        g.output.add().CopyFrom(_vi(o))
    for t in initializers:
        g.initializer.add().CopyFrom(t)
    return g


def _gattr(node, name, graph):
    a = node.attribute.add()
    a.name = name
    a.type = O.AttributeProto.GRAPH
    a.g.CopyFrom(graph)
    return node


class TestIf:
    def _build(self):
        then_g = _graph("t", [_node("Mul", ["x", "x"], ["o"])], [], ["o"])
        else_g = _graph("e", [_node("Neg", ["x"], ["o"])], [], ["o"])
        n = _node("If", ["cond"], ["y"])
        _gattr(n, "then_branch", then_g)
        _gattr(n, "else_branch", else_g)
        return _model([n], ["cond", "x"], ["y"])

    def test_static_and_traced_cond(self):
        fn, params = convert_onnx(self._build())
        x = np.random.default_rng(0).normal(size=(2, 3)).astype(np.float32)
        for cond in (True, False):
            got = np.asarray(fn(params, np.asarray(cond), jnp.asarray(x)))
            want = x * x if cond else -x
            np.testing.assert_allclose(got, want, rtol=1e-6)
            # traced condition -> lax.cond
            got_t = np.asarray(fn(params, jnp.asarray(cond), jnp.asarray(x)))
            np.testing.assert_allclose(got_t, want, rtol=1e-6)


class TestLoop:
    def test_accumulating_for_loop(self):
        # body: (i, cond, s) -> (cond, s + x, s + x)  [carried + scan out]
        body = _graph(
            "b",
            [_node("Add", ["s", "x"], ["s2"]),
             _node("Identity", ["cond_in"], ["cond_out"]),
             _node("Identity", ["s2"], ["y_out"])],
            ["iter", "cond_in", "s"], ["cond_out", "s2", "y_out"])
        n = _node("Loop", ["M", "cond", "s0"], ["s_final", "ys"])
        _gattr(n, "body", body)
        m = _model([n], ["cond", "s0", "x"], ["s_final", "ys"],
                   [_tensor("M", np.asarray(4, np.int64))])
        fn, params = convert_onnx(m)
        x = np.asarray([1.0, 2.0], np.float32)
        s_final, ys = fn(params, np.asarray(True), jnp.zeros(2), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(s_final), 4 * x, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ys), np.stack([x, 2 * x, 3 * x, 4 * x]), rtol=1e-6)

    def test_false_cond_skips(self):
        body = _graph(
            "b", [_node("Identity", ["cond_in"], ["cond_out"]),
                  _node("Add", ["s", "s"], ["s2"])],
            ["iter", "cond_in", "s"], ["cond_out", "s2"])
        n = _node("Loop", ["M", "cond", "s0"], ["s_final"])
        _gattr(n, "body", body)
        m = _model([n], ["cond", "s0"], ["s_final"],
                   [_tensor("M", np.asarray(3, np.int64))])
        fn, params = convert_onnx(m)
        out = fn(params, np.asarray(False), jnp.asarray([5.0]))
        np.testing.assert_allclose(np.asarray(out), [5.0])


class TestScan:
    def test_running_sum(self):
        body = _graph(
            "b",
            [_node("Add", ["s", "xi"], ["s2"]),
             _node("Identity", ["s2"], ["yi"])],
            ["s", "xi"], ["s2", "yi"])
        n = _node("Scan", ["s0", "xs"], ["s_final", "ys"],
                  num_scan_inputs=1)
        _gattr(n, "body", body)
        m = _model([n], ["s0", "xs"], ["s_final", "ys"])
        fn, params = convert_onnx(m)
        xs = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)
        s_final, ys = fn(params, jnp.zeros(3), jnp.asarray(xs))
        np.testing.assert_allclose(np.asarray(s_final), xs.sum(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ys), np.cumsum(xs, 0),
                                   rtol=1e-5)


class TestCastLike:
    def test_cast_like(self):
        n = _node("CastLike", ["a", "b"], ["y"])
        m = _model([n], ["a", "b"], ["y"])
        fn, params = convert_onnx(m)
        out = fn(params, jnp.asarray([1.7, -2.3]),
                 jnp.asarray([1], jnp.int32))
        assert np.asarray(out).dtype == np.int32


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    @pytest.mark.parametrize("padding", ["zeros", "border"])
    @pytest.mark.parametrize("align", [0, 1])
    def test_vs_torch(self, mode, padding, align):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 8, 9)).astype(np.float32)
        grid = rng.uniform(-1.3, 1.3, size=(2, 5, 6, 2)).astype(np.float32)
        n = _node("GridSample", ["x", "grid"], ["y"], mode=mode,
                  padding_mode=padding, align_corners=align)
        m = _model([n], ["x", "grid"], ["y"])
        fn, params = convert_onnx(m)
        got = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(grid)))
        want = torch.nn.functional.grid_sample(
            torch.from_numpy(x), torch.from_numpy(grid), mode=mode,
            padding_mode=padding, align_corners=bool(align)).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)


def _roi_align_np(x, rois, bi, oh, ow, sr, scale):
    """Straightforward numpy RoiAlign (avg, half_pixel) oracle."""
    out = np.zeros((len(rois), x.shape[1], oh, ow), np.float32)

    def sample(img, yy, xx):
        h, w = img.shape[1:]
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        wy, wx = yy - y0, xx - x0
        acc = np.zeros(img.shape[0], np.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                yc = min(max(y0 + dy, 0), h - 1)
                xc = min(max(x0 + dx, 0), w - 1)
                acc += img[:, yc, xc] * ((wy if dy else 1 - wy)
                                         * (wx if dx else 1 - wx))
        return acc

    for r, (roi, b) in enumerate(zip(rois, bi)):
        img = x[b]
        x1, y1, x2, y2 = roi * scale - 0.5
        bw, bh = (x2 - x1) / ow, (y2 - y1) / oh
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(x.shape[1], np.float32)
                for si in range(sr):
                    for sj in range(sr):
                        yy = y1 + (i * sr + si + 0.5) * bh / sr
                        xx = x1 + (j * sr + sj + 0.5) * bw / sr
                        acc += sample(img, yy, xx)
                out[r, :, i, j] = acc / (sr * sr)
    return out


class TestRoiAlign:
    def test_vs_numpy_oracle(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
        rois = np.asarray([[1.0, 1.0, 10.0, 12.0], [0.0, 2.0, 15.0, 9.0]],
                          np.float32)
        bi = np.asarray([0, 1], np.int64)
        n = _node("RoiAlign", ["x", "rois", "bi"], ["y"],
                  output_height=4, output_width=4, sampling_ratio=2,
                  spatial_scale=0.5)
        n.attribute.add().name = "coordinate_transformation_mode"
        n.attribute[-1].type = O.AttributeProto.STRING
        n.attribute[-1].s = b"half_pixel"
        m = _model([n], ["x", "rois", "bi"], ["y"])
        fn, params = convert_onnx(m)
        got = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(rois),
                            jnp.asarray(bi)))
        want = _roi_align_np(x, rois, bi, 4, 4, 2, 0.5)
        np.testing.assert_allclose(got, want, atol=2e-4)
