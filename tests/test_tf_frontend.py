"""TF GraphDef frontend round-trip tests.

Mirrors the reference's converter gate
(/root/reference/tools/script/testMNNFromTf.py): build a TF graph, freeze
it, run TF and our JAX lowering side by side on random inputs, diff.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")
from tensorflow.python.framework.convert_to_constants import (  # noqa: E402
    convert_variables_to_constants_v2)

from mnn_tpu.convert.tf_frontend import convert_graphdef  # noqa: E402


def _roundtrip(f, *xs, atol=1e-5, rtol=1e-4, outputs=None):
    specs = [tf.TensorSpec(x.shape, tf.as_dtype(x.dtype)) for x in xs]
    cf = tf.function(f).get_concrete_function(*specs)
    frozen = convert_variables_to_constants_v2(cf)
    gd = frozen.graph.as_graph_def()
    ref = f(*[tf.constant(x) for x in xs])
    fn, params = convert_graphdef(gd, outputs=outputs)
    got = jax.jit(fn)(params, *[jnp.asarray(x) for x in xs])
    refs = ref if isinstance(ref, (tuple, list)) else [ref]
    gots = got if isinstance(got, tuple) else [got]
    for r, g in zip(refs, gots):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r).astype(np.float32),
                                   atol=atol, rtol=rtol)
    return fn, params


class TestMlp:
    def test_dense_stack(self):
        rng = np.random.default_rng(0)
        w1 = tf.constant(rng.standard_normal((12, 24), np.float32) * 0.3)
        b1 = tf.constant(rng.standard_normal(24, np.float32) * 0.1)
        w2 = tf.constant(rng.standard_normal((24, 5), np.float32) * 0.3)

        def net(x):
            h = tf.nn.relu(tf.nn.bias_add(tf.matmul(x, w1), b1))
            return tf.nn.softmax(tf.matmul(h, w2))

        x = rng.standard_normal((3, 12), np.float32)
        _roundtrip(net, x)


class TestConvNet:
    def test_conv_bn_pool(self):
        rng = np.random.default_rng(1)
        k = tf.constant(rng.standard_normal((3, 3, 3, 8), np.float32) * 0.2)
        kdw = tf.constant(rng.standard_normal((3, 3, 8, 2), np.float32) * 0.2)
        scale = tf.constant(rng.standard_normal(8, np.float32) * 0.1 + 1)
        offset = tf.constant(rng.standard_normal(8, np.float32) * 0.1)
        mean = tf.constant(rng.standard_normal(8, np.float32) * 0.1)
        var = tf.constant(np.abs(rng.standard_normal(8, np.float32)) + 0.5)

        def net(x):
            h = tf.nn.conv2d(x, k, 2, "SAME")
            h, *_ = tf.compat.v1.nn.fused_batch_norm(
                h, scale, offset, mean, var, is_training=False)
            h = tf.nn.relu6(h)
            h = tf.nn.depthwise_conv2d(h, kdw, (1, 1, 1, 1), "VALID")
            h = tf.nn.max_pool2d(h, 2, 2, "SAME")
            h = tf.nn.avg_pool2d(h, 2, 1, "VALID")
            return tf.reduce_mean(h, axis=(1, 2))

        x = rng.standard_normal((2, 16, 16, 3), np.float32)
        _roundtrip(net, x, atol=1e-4)


class TestTensorOps:
    def test_shape_ops(self):
        def net(x):
            h = tf.transpose(x, (0, 2, 1))
            h = tf.reshape(h, (-1, 8))
            a, b = tf.split(h, 2, axis=0)
            h = tf.concat([b * 2.0, a], axis=0)
            h = tf.expand_dims(h, 1)
            return tf.squeeze(h, 1)[1:5, ::2]

        x = np.random.default_rng(2).standard_normal((2, 8, 4), np.float32)
        _roundtrip(net, x)

    def test_elementwise_zoo(self):
        def net(x):
            h = tf.abs(x) + tf.sqrt(tf.square(x) + 1.0)
            h = tf.math.rsqrt(tf.maximum(h, 0.5))
            h = h * tf.sigmoid(x) - tf.nn.leaky_relu(x, 0.1)
            g = 0.5 * x * (1.0 + tf.math.erf(x / np.sqrt(2.0)))
            return tf.exp(-h) + g + tf.nn.elu(x)

        x = np.random.default_rng(3).standard_normal((3, 9), np.float32)
        _roundtrip(net, x, atol=1e-4)

    def test_pad_gather_stack(self):
        def net(x):
            h = tf.pad(x, [[0, 0], [1, 1], [0, 2]])
            h = tf.gather(h, [1, 0, 3], axis=1)
            return tf.stack([h, h + 1.0], axis=0)

        x = np.random.default_rng(4).standard_normal((2, 4, 3), np.float32)
        _roundtrip(net, x)

    def test_reductions_argmax_cast(self):
        def net(x):
            return (tf.reduce_sum(x, axis=1),
                    tf.cast(tf.argmax(x, axis=-1), tf.int32),
                    tf.reduce_max(x, axis=(0, 2), keepdims=True))

        x = np.random.default_rng(5).standard_normal((2, 5, 3), np.float32)
        _roundtrip(net, x)

    def test_batch_matmul_and_resize(self):
        def net(a, b):
            m = tf.matmul(a, b)                       # BatchMatMulV2
            img = tf.reshape(m, (1, 3, 3, 1))
            return tf.image.resize(img, (6, 6))       # bilinear

        rng = np.random.default_rng(6)
        a = rng.standard_normal((1, 3, 4), np.float32)
        b = rng.standard_normal((1, 4, 3), np.float32)
        _roundtrip(net, a, b, atol=1e-4)

    def test_strided_slice_masks(self):
        def net(x):
            return x[:, 1:, ::2] + x[:, :-1, 1::2]

        x = np.random.default_rng(7).standard_normal((2, 5, 6), np.float32)
        _roundtrip(net, x)
