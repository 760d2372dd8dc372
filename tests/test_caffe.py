"""Caffe frontend tests: proto-built nets diffed against torch oracles.

Mirrors the reference's converter correctness strategy (its Caffe
frontend tests via tools/converter round-trips): layers are checked
against torch.nn.functional equivalents — caffe's NCHW layout and torch's
agree, including CEIL pooling (torch ceil_mode=True) and across-channel
LRN (torch local_response_norm uses caffe's formula).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mnn_tpu.convert import caffe_pb2 as C
from mnn_tpu.convert.caffe_frontend import convert_caffe, load_prototxt

torch = pytest.importorskip("torch")


def _blob(layer, arr):
    b = layer.blobs.add()
    b.shape.dim.extend(arr.shape)
    b.data.extend(arr.reshape(-1).tolist())


def _net(input_shape):
    net = C.NetParameter()
    net.input.append("data")
    s = net.input_shape.add()
    s.dim.extend(input_shape)
    return net


class TestLeNetStyle:
    def test_conv_pool_ip_softmax(self):
        """A LeNet-shaped net vs torch, including caffe CEIL pooling."""
        rng = np.random.default_rng(0)
        net = _net((2, 1, 12, 12))

        conv = net.layer.add()
        conv.name, conv.type = "conv1", "Convolution"
        conv.bottom.append("data"); conv.top.append("conv1")
        conv.convolution_param.num_output = 4
        conv.convolution_param.kernel_size.append(3)
        conv.convolution_param.stride.append(1)
        w1 = rng.standard_normal((4, 1, 3, 3), np.float32) * 0.3
        b1 = rng.standard_normal(4, np.float32) * 0.1
        _blob(conv, w1); _blob(conv, b1)

        relu = net.layer.add()
        relu.name, relu.type = "relu1", "ReLU"
        relu.bottom.append("conv1"); relu.top.append("conv1")  # in-place

        pool = net.layer.add()
        pool.name, pool.type = "pool1", "Pooling"
        pool.bottom.append("conv1"); pool.top.append("pool1")
        pool.pooling_param.pool = C.PoolingParameter.MAX
        pool.pooling_param.kernel_size = 2
        pool.pooling_param.stride = 2

        ip = net.layer.add()
        ip.name, ip.type = "ip1", "InnerProduct"
        ip.bottom.append("pool1"); ip.top.append("ip1")
        ip.inner_product_param.num_output = 7
        w2 = rng.standard_normal((7, 4 * 5 * 5), np.float32) * 0.1
        b2 = rng.standard_normal(7, np.float32) * 0.1
        _blob(ip, w2); _blob(ip, b2)

        sm = net.layer.add()
        sm.name, sm.type = "prob", "Softmax"
        sm.bottom.append("ip1"); sm.top.append("prob")

        fn, params = convert_caffe(net)
        x = rng.standard_normal((2, 1, 12, 12), np.float32)
        got = np.asarray(jax.jit(fn)(params, jnp.asarray(x)))

        xt = torch.from_numpy(x)
        h = torch.relu(torch.nn.functional.conv2d(
            xt, torch.from_numpy(w1), torch.from_numpy(b1)))
        h = torch.nn.functional.max_pool2d(h, 2, 2, ceil_mode=True)
        h = h.reshape(2, -1) @ torch.from_numpy(w2).T + torch.from_numpy(b2)
        ref = torch.softmax(h, dim=1).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)

    def test_ceil_pooling_odd_size(self):
        """5x5 input, k=2 s=2: caffe CEIL gives 3x3 (torch ceil_mode)."""
        net = _net((1, 2, 5, 5))
        pool = net.layer.add()
        pool.name, pool.type = "p", "Pooling"
        pool.bottom.append("data"); pool.top.append("p")
        pool.pooling_param.pool = C.PoolingParameter.MAX
        pool.pooling_param.kernel_size = 2
        pool.pooling_param.stride = 2
        fn, params = convert_caffe(net)
        x = np.random.default_rng(1).standard_normal((1, 2, 5, 5), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        ref = torch.nn.functional.max_pool2d(
            torch.from_numpy(x), 2, 2, ceil_mode=True).numpy()
        assert got.shape == (1, 2, 3, 3)
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_ave_pool_floor_mode_with_pad(self):
        """FLOOR rounding clips the right pad (eh < ph) — regression for
        the negative-pad crash."""
        net = _net((1, 2, 6, 6))
        pool = net.layer.add()
        pool.name, pool.type = "p", "Pooling"
        pool.bottom.append("data"); pool.top.append("p")
        pool.pooling_param.pool = C.PoolingParameter.AVE
        pool.pooling_param.kernel_size = 3
        pool.pooling_param.stride = 2
        pool.pooling_param.pad = 1
        pool.pooling_param.round_mode = C.PoolingParameter.FLOOR
        fn, params = convert_caffe(net)
        x = np.random.default_rng(8).standard_normal((1, 2, 6, 6), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        ref = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x), 3, 2, padding=1, ceil_mode=False,
            count_include_pad=True).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_reshape_axis_span(self):
        """Reshape with axis=1 must keep the leading axes untouched."""
        net = _net((2, 6, 2, 2))
        rs = net.layer.add()
        rs.name, rs.type = "r", "Reshape"
        rs.bottom.append("data"); rs.top.append("r")
        rs.reshape_param.shape.dim.extend([0, -1])
        rs.reshape_param.axis = 1
        fn, params = convert_caffe(net)
        x = np.random.default_rng(9).standard_normal((2, 6, 2, 2), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        assert got.shape == (2, 6, 4)
        np.testing.assert_allclose(got, x.reshape(2, 6, 4))

    def test_ave_pool_with_pad(self):
        net = _net((1, 3, 8, 8))
        pool = net.layer.add()
        pool.name, pool.type = "p", "Pooling"
        pool.bottom.append("data"); pool.top.append("p")
        pool.pooling_param.pool = C.PoolingParameter.AVE
        pool.pooling_param.kernel_size = 3
        pool.pooling_param.stride = 2
        pool.pooling_param.pad = 1
        fn, params = convert_caffe(net)
        x = np.random.default_rng(2).standard_normal((1, 3, 8, 8), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        ref = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x), 3, 2, padding=1, ceil_mode=True,
            count_include_pad=True).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestBnScaleEltwise:
    def test_batchnorm_scale(self):
        rng = np.random.default_rng(3)
        net = _net((2, 4, 6, 6))
        bn = net.layer.add()
        bn.name, bn.type = "bn", "BatchNorm"
        bn.bottom.append("data"); bn.top.append("bn")
        mean = rng.standard_normal(4, np.float32)
        var = np.abs(rng.standard_normal(4, np.float32)) + 0.5
        sf = np.asarray([2.0], np.float32)   # caffe scale_factor blob
        _blob(bn, mean * 2.0); _blob(bn, var * 2.0); _blob(bn, sf)

        sc = net.layer.add()
        sc.name, sc.type = "scale", "Scale"
        sc.bottom.append("bn"); sc.top.append("scale")
        sc.scale_param.bias_term = True
        gamma = rng.standard_normal(4, np.float32)
        beta = rng.standard_normal(4, np.float32)
        _blob(sc, gamma); _blob(sc, beta)

        fn, params = convert_caffe(net)
        x = rng.standard_normal((2, 4, 6, 6), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        ref = torch.nn.functional.batch_norm(
            torch.from_numpy(x), torch.from_numpy(mean),
            torch.from_numpy(var), torch.from_numpy(gamma),
            torch.from_numpy(beta), eps=1e-5).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)

    def test_eltwise_and_grouped_conv(self):
        rng = np.random.default_rng(4)
        net = _net((1, 4, 5, 5))
        conv = net.layer.add()
        conv.name, conv.type = "g", "Convolution"
        conv.bottom.append("data"); conv.top.append("g")
        conv.convolution_param.num_output = 4
        conv.convolution_param.kernel_size.append(3)
        conv.convolution_param.pad.append(1)
        conv.convolution_param.group = 2
        conv.convolution_param.bias_term = False
        w = rng.standard_normal((4, 2, 3, 3), np.float32) * 0.3
        _blob(conv, w)

        elt = net.layer.add()
        elt.name, elt.type = "sum", "Eltwise"
        elt.bottom.append("data"); elt.bottom.append("g")
        elt.top.append("sum")
        elt.eltwise_param.coeff.extend([0.5, 2.0])

        fn, params = convert_caffe(net)
        x = rng.standard_normal((1, 4, 5, 5), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        ref = 0.5 * x + 2.0 * torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), padding=1,
            groups=2).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_lrn_across_channels(self):
        net = _net((1, 8, 4, 4))
        lrn = net.layer.add()
        lrn.name, lrn.type = "n", "LRN"
        lrn.bottom.append("data"); lrn.top.append("n")
        lrn.lrn_param.local_size = 5
        lrn.lrn_param.alpha = 1e-3
        lrn.lrn_param.beta = 0.75
        fn, params = convert_caffe(net)
        x = np.random.default_rng(5).standard_normal((1, 8, 4, 4), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        ref = torch.nn.functional.local_response_norm(
            torch.from_numpy(x), 5, alpha=1e-3, beta=0.75, k=1.0).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


class TestPrototxt:
    def test_text_parse_with_unknown_fields(self):
        txt = """
name: "toy"
input: "data"
input_shape { dim: 1 dim: 2 dim: 4 dim: 4 }
layer {
  name: "c" type: "Convolution" bottom: "data" top: "c"
  convolution_param {
    num_output: 3 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" }   # unknown field: skipped
  }
}
layer { name: "r" type: "ReLU" bottom: "c" top: "c" }
"""
        net = load_prototxt(txt)
        assert net.layer[0].convolution_param.num_output == 3
        # weights come from a separate caffemodel
        wnet = C.NetParameter()
        wl = wnet.layer.add()
        wl.name, wl.type = "c", "Convolution"
        rng = np.random.default_rng(6)
        w = rng.standard_normal((3, 2, 3, 3), np.float32) * 0.2
        b = rng.standard_normal(3, np.float32) * 0.1
        _blob(wl, w); _blob(wl, b)
        fn, params = convert_caffe(net, wnet.SerializeToString())
        x = rng.standard_normal((1, 2, 4, 4), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        ref = torch.relu(torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            padding=1)).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_slice_concat_flatten(self):
        net = _net((1, 6, 2, 2))
        sl = net.layer.add()
        sl.name, sl.type = "s", "Slice"
        sl.bottom.append("data")
        sl.top.extend(["a", "b"])
        sl.slice_param.axis = 1
        sl.slice_param.slice_point.append(2)
        cat = net.layer.add()
        cat.name, cat.type = "cat", "Concat"
        cat.bottom.extend(["b", "a"])
        cat.top.append("cat")
        fl = net.layer.add()
        fl.name, fl.type = "fl", "Flatten"
        fl.bottom.append("cat"); fl.top.append("out")
        fn, params = convert_caffe(net)
        x = np.random.default_rng(7).standard_normal((1, 6, 2, 2), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        ref = np.concatenate([x[:, 2:], x[:, :2]], 1).reshape(1, -1)
        np.testing.assert_allclose(got, ref)


class TestDeconvolution:
    def test_matches_torch(self):
        rng = np.random.default_rng(11)
        net = _net((1, 3, 5, 5))
        dc = net.layer.add()
        dc.name, dc.type = "d", "Deconvolution"
        dc.bottom.append("data"); dc.top.append("d")
        dc.convolution_param.num_output = 4
        dc.convolution_param.kernel_size.append(4)
        dc.convolution_param.stride.append(2)
        dc.convolution_param.pad.append(1)
        # caffe deconv weights: [C_in, C_out/g, kh, kw]
        w = rng.standard_normal((3, 4, 4, 4), np.float32) * 0.2
        b = rng.standard_normal(4, np.float32) * 0.1
        _blob(dc, w); _blob(dc, b)
        fn, params = convert_caffe(net)
        x = rng.standard_normal((1, 3, 5, 5), np.float32)
        got = np.asarray(fn(params, jnp.asarray(x)))
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=2, padding=1).numpy()
        assert got.shape == ref.shape == (1, 4, 10, 10)
        np.testing.assert_allclose(got, ref, atol=1e-5)
