"""Custom-op (plugin) registration: a user-supplied converter — backed by
a custom Pallas kernel — handles an op the frontends don't know.

≈ the reference's plugin demo (/root/reference/test/plugin/ with
MNN_WITH_PLUGIN: user registers shape inference + kernel for
OpType_Plugin); here the registered converter IS both (XLA abstract eval
covers shapes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu import plugin


def _softshrink_kernel(lam):
    """x -> sign(x) * max(|x| - lam, 0), as a Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam, 0.0)

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=pltpu.InterpretParams(),
        )(x)

    return run


class TestPluginRegistration:
    def test_custom_onnx_op_with_pallas_kernel(self):
        from mnn_tpu.convert import onnx_pb2 as O
        from mnn_tpu.convert.onnx_frontend import convert_onnx

        node = O.NodeProto()
        node.op_type = "MnnTpuSoftShrink"
        node.domain = "mnn_tpu.plugin"
        node.input.extend(["x"])
        node.output.extend(["y"])
        m = O.ModelProto()
        m.ir_version = 8
        m.opset_import.add().version = 17
        g = m.graph
        g.name = "plug"
        g.node.add().CopyFrom(node)
        g.input.add().name = "x"
        g.output.add().name = "y"
        model = O.ModelProto.FromString(m.SerializeToString())

        # unknown op must fail loudly before registration
        with pytest.raises(NotImplementedError):
            convert_onnx(model)

        run = _softshrink_kernel(0.3)
        plugin.register_op("MnnTpuSoftShrink",
                           lambda ctx, node, x: run(jnp.asarray(x)))
        try:
            fn, params = convert_onnx(model)[:2]
            x = np.random.default_rng(0).normal(
                size=(2, 8, 128)).astype(np.float32)
            out = fn(params, jnp.asarray(x))
            got = np.asarray(out[0] if isinstance(out, (tuple, list))
                             else out)
            want = np.sign(x) * np.maximum(np.abs(x) - 0.3, 0.0)
            np.testing.assert_allclose(got, want, atol=1e-6)
        finally:
            plugin.unregister_op("MnnTpuSoftShrink")
        assert "MnnTpuSoftShrink" not in plugin.registered_ops()

    def test_no_silent_shadowing(self):
        with pytest.raises(ValueError):
            plugin.register_op("Add", lambda ctx, n, a, b: a + b)
        # explicit override + restore
        from mnn_tpu.convert.onnx_frontend import _OPS

        orig = _OPS["Add"]
        plugin.register_op("Add", lambda ctx, n, a, b: a + b, override=True)
        plugin.register_op("Add", orig, override=True)

    def test_tf_and_tflite_tables_reachable(self):
        assert "MaxPool" in plugin.registered_ops("tf")
        assert plugin.registered_ops("tflite")
        assert plugin.registered_ops("caffe")
        with pytest.raises(ValueError):
            plugin.registered_ops("torch")


class TestIntrospection:
    """Llm.info() ≈ the reference's Interpreter::getSessionInfo
    (MEMORY / FLOPS / BACKENDS, include/MNN/Interpreter.hpp:447-476)."""

    def test_llm_info(self):
        from mnn_tpu.models.config import RuntimeConfig
        from mnn_tpu.runtime.llm import Llm

        llm = Llm.synthetic("tiny", rt=RuntimeConfig(max_seq_len=64))
        info = llm.info()
        assert info["param_bytes"] > 0
        assert info["kv_cache_bytes"] > 0
        assert info["flops_per_token"] > 0
        assert info["backend"]
        assert info["kv_capacity"] == 64
        llm.generate("hi", max_new_tokens=3)
        assert llm.info()["context_len"] > 0


class TestDebugHooks:
    """§5.2 equivalents: NaN-raise hook + donation audit (≈ the
    reference's MNN_DEBUG_* / checkInvalidValue debug tooling)."""

    def test_debug_nans_flag_raises(self):
        import jax
        import jax.numpy as jnp

        from mnn_tpu.models.config import RuntimeConfig
        from mnn_tpu.runtime.llm import Llm

        assert not jax.config.jax_debug_nans
        try:
            Llm.synthetic("tiny", rt=RuntimeConfig(max_seq_len=32,
                                                   debug_nans=True))
            assert jax.config.jax_debug_nans
            with pytest.raises(Exception):
                jax.jit(lambda x: x / x)(jnp.zeros((4,)))
        finally:
            jax.config.update("jax_debug_nans", False)

    def test_no_unintended_donation(self):
        """forward() must not donate its cache: callers reuse the input
        cache (per-step parity tests, speculative rollbacks). An
        accidental donate_argnums would invalidate those buffers."""
        import jax
        import jax.numpy as jnp

        from mnn_tpu.models.config import PRESETS
        from mnn_tpu.models.decoder import forward, init_random_params
        from mnn_tpu.runtime import kvcache

        cfg = PRESETS["tiny"]
        params = init_random_params(cfg, jax.random.PRNGKey(0), scale=0.05)
        cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 32,
                               cfg.head_dim, quantized=True)
        toks = jnp.asarray([[1, 2, 3]], jnp.int32)
        _, c2 = forward(params, cfg, toks, cache)
        # the ORIGINAL cache must still be readable (not donated/deleted)
        assert int(jnp.sum(cache.length)) == 0
        assert int(c2.length[0]) == 3
