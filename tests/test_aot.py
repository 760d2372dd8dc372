"""AOT executable export/load (MNN2QNNModel-equivalent offline compile)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mnn_tpu.utils.aot import export_compiled, load_compiled


class TestAot:
    def test_roundtrip_simple(self, tmp_path):
        path = str(tmp_path / "f.xla")
        export_compiled(lambda x: x * 2 + 1, (jnp.zeros((8,)),), path)
        f = load_compiled(path)
        np.testing.assert_allclose(np.asarray(f(jnp.ones((8,)))), 3.0)

    def test_decoder_step_exports(self, tmp_path):
        from mnn_tpu.models.config import PRESETS
        from mnn_tpu.models.decoder import forward, init_random_params
        from mnn_tpu.runtime import kvcache

        cfg = PRESETS["tiny"]
        params = init_random_params(cfg, jax.random.PRNGKey(0), scale=0.05)
        cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 32,
                               cfg.head_dim, quantized=False)
        tok = jnp.zeros((1, 1), jnp.int32)

        def step(params, tok, cache):
            logits, cache2 = forward(params, cfg, tok, cache)
            return logits, cache2.length

        path = str(tmp_path / "decode.xla")
        export_compiled(step, (params, tok, cache), path)
        f = load_compiled(path)
        logits, length = f(params, tok, cache)
        want, cache2 = forward(params, cfg, tok, cache)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                                   atol=1e-5)
        assert int(length[0]) == 1

    def test_device_kind_mismatch_rejected(self, tmp_path):
        import pickle
        path = str(tmp_path / "g.xla")
        export_compiled(lambda x: x + 1, (jnp.zeros((2,)),), path)
        with open(path, "rb") as fh:
            d = pickle.load(fh)
        d["device_kind"] = "TPU v9000"
        with open(path, "wb") as fh:
            pickle.dump(d, fh)
        with pytest.raises(ValueError):
            load_compiled(path)
