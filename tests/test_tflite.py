"""TFLite frontend round-trip tests.

Mirrors the reference's converter gate
(/root/reference/tools/script/testMNNFromTflite.py): build a TF graph,
convert to .tflite, run the TFLite interpreter and our JAX lowering side
by side on random inputs, and diff the outputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from mnn_tpu.convert.tflite_frontend import convert_tflite  # noqa: E402


def _tflite_bytes(fn, *specs):
    f = tf.function(fn, input_signature=list(specs))
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [f.get_concrete_function()])
    return conv.convert()


def _oracle(tfl: bytes, *inputs):
    interp = tf.lite.Interpreter(model_content=tfl)
    interp.allocate_tensors()
    for det, x in zip(interp.get_input_details(), inputs):
        interp.set_tensor(det["index"], x)
    interp.invoke()
    outs = [interp.get_tensor(d["index"]) for d in interp.get_output_details()]
    return outs[0] if len(outs) == 1 else outs


def _check(tfl, inputs, atol=1e-5, rtol=1e-4):
    ref = _oracle(tfl, *inputs)
    fn, params = convert_tflite(tfl)
    got = jax.jit(fn)(params, *[jnp.asarray(x) for x in inputs])
    if not isinstance(ref, list):
        ref, got = [ref], [got]
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   r.astype(np.float32), atol=atol, rtol=rtol)
    return fn, params


class TestMlp:
    def test_dense_relu_softmax(self):
        w1 = tf.constant(np.random.default_rng(0).standard_normal(
            (16, 32), np.float32) * 0.3)
        b1 = tf.constant(np.zeros(32, np.float32))
        w2 = tf.constant(np.random.default_rng(1).standard_normal(
            (32, 10), np.float32) * 0.3)

        def net(x):
            h = tf.nn.relu(tf.matmul(x, w1) + b1)
            return tf.nn.softmax(tf.matmul(h, w2))

        tfl = _tflite_bytes(net, tf.TensorSpec((2, 16), tf.float32))
        x = np.random.default_rng(2).standard_normal((2, 16), np.float32)
        _check(tfl, [x])


class TestConvNet:
    def test_conv_dw_pool_stack(self):
        rng = np.random.default_rng(0)
        k1 = tf.constant(rng.standard_normal((3, 3, 3, 8), np.float32) * 0.2)
        kdw = tf.constant(rng.standard_normal((3, 3, 8, 1), np.float32) * 0.2)
        k2 = tf.constant(rng.standard_normal((1, 1, 8, 16), np.float32) * 0.2)

        def net(x):
            h = tf.nn.relu6(tf.nn.conv2d(x, k1, 2, "SAME"))
            h = tf.nn.depthwise_conv2d(h, kdw, (1, 1, 1, 1), "SAME")
            h = tf.nn.relu(h)
            h = tf.nn.conv2d(h, k2, 1, "VALID")
            h = tf.nn.avg_pool2d(h, 2, 2, "VALID")
            h = tf.nn.max_pool2d(h, 2, 2, "SAME")
            return tf.reduce_mean(h, axis=(1, 2))

        tfl = _tflite_bytes(net, tf.TensorSpec((1, 16, 16, 3), tf.float32))
        x = np.random.default_rng(1).standard_normal((1, 16, 16, 3),
                                                     np.float32)
        _check(tfl, [x], atol=1e-4)

    def test_strided_valid_conv(self):
        k = tf.constant(np.random.default_rng(3).standard_normal(
            (5, 5, 2, 4), np.float32) * 0.1)

        def net(x):
            return tf.nn.conv2d(x, k, (1, 2, 3, 1), "VALID")

        tfl = _tflite_bytes(net, tf.TensorSpec((2, 17, 19, 2), tf.float32))
        x = np.random.default_rng(4).standard_normal((2, 17, 19, 2),
                                                     np.float32)
        _check(tfl, [x], atol=1e-4)


class TestTensorOps:
    def test_shape_manipulation(self):
        def net(x):
            h = tf.transpose(x, (0, 2, 1))
            h = tf.reshape(h, (1, -1))
            a, b = tf.split(h, 2, axis=1)
            return tf.concat([b, a], axis=1) * 2.0 + 1.0

        tfl = _tflite_bytes(net, tf.TensorSpec((1, 4, 6), tf.float32))
        x = np.random.default_rng(0).standard_normal((1, 4, 6), np.float32)
        _check(tfl, [x])

    def test_elementwise_zoo(self):
        def net(x):
            h = tf.abs(x) + tf.sqrt(tf.square(x) + 1.0)
            h = tf.minimum(tf.maximum(h, 0.5), 4.0)
            h = tf.math.rsqrt(h) * tf.sigmoid(x) + tf.tanh(x)
            return tf.exp(-h) + tf.nn.gelu(x)

        tfl = _tflite_bytes(net, tf.TensorSpec((3, 7), tf.float32))
        x = np.random.default_rng(1).standard_normal((3, 7), np.float32)
        _check(tfl, [x], atol=1e-4)

    def test_pad_slice_gather(self):
        def net(x):
            h = tf.pad(x, [[0, 0], [1, 2], [2, 1]])
            h = h[:, 1:5, 0:6]
            return tf.gather(h, [2, 0, 1], axis=1)

        tfl = _tflite_bytes(net, tf.TensorSpec((2, 4, 5), tf.float32))
        x = np.random.default_rng(2).standard_normal((2, 4, 5), np.float32)
        _check(tfl, [x])

    def test_reductions_and_argmax(self):
        def net(x):
            return (tf.reduce_sum(x, axis=1),
                    tf.reduce_max(x, axis=-1, keepdims=True),
                    tf.cast(tf.argmax(x, axis=1), tf.int32))

        tfl = _tflite_bytes(net, tf.TensorSpec((3, 5, 4), tf.float32))
        x = np.random.default_rng(3).standard_normal((3, 5, 4), np.float32)
        ref = _oracle(tfl, x)
        fn, params = convert_tflite(tfl)
        got = fn(params, jnp.asarray(x))
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       r.astype(np.float32), atol=1e-5)

    def test_pack_stack_resize(self):
        def net(x):
            up = tf.image.resize(x, (8, 8), method="nearest")
            return tf.stack([up, up * 2.0], axis=1)

        tfl = _tflite_bytes(net, tf.TensorSpec((1, 4, 4, 2), tf.float32))
        x = np.random.default_rng(4).standard_normal((1, 4, 4, 2), np.float32)
        _check(tfl, [x])

    def test_batch_matmul(self):
        def net(a, b):
            return tf.matmul(a, b)

        tfl = _tflite_bytes(net, tf.TensorSpec((2, 3, 4), tf.float32),
                            tf.TensorSpec((2, 4, 5), tf.float32))
        rng = np.random.default_rng(5)
        a = rng.standard_normal((2, 3, 4), np.float32)
        b = rng.standard_normal((2, 4, 5), np.float32)
        _check(tfl, [a, b])


class TestQuantizedWeights:
    def test_dynamic_range_quant_dequantizes(self):
        """Weight-only int8 quantized model runs as float (weights
        dequantized at conversion, like the reference's low-memory path)."""
        rng = np.random.default_rng(0)
        w = tf.constant(rng.standard_normal((32, 48), np.float32) * 0.3)

        def net(x):
            return tf.nn.relu(tf.matmul(x, w))

        f = tf.function(net, input_signature=[tf.TensorSpec((4, 32),
                                                            tf.float32)])
        conv = tf.lite.TFLiteConverter.from_concrete_functions(
            [f.get_concrete_function()])
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
        tfl = conv.convert()
        x = rng.standard_normal((4, 32), np.float32)
        # looser tolerance: oracle runs int8 kernels, we run dequantized f32
        _check(tfl, [x], atol=0.05, rtol=0.05)


class TestMetadata:
    def test_io_names_and_shapes(self):
        def net(x):
            return x + 1.0

        tfl = _tflite_bytes(net, tf.TensorSpec((2, 3), tf.float32, name="inp"))
        fn, params = convert_tflite(tfl)
        assert fn.input_shapes == [(2, 3)]
        assert len(fn.input_names) == 1
