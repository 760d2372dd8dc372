"""GEMM block-size autotuner: table round-trip + kernel pickup.

= the reference's GemmTune persistent-cache behavior
(/root/reference/source/backend/opencl/core/OpenCLBackend.cpp:191-240):
tuned tilings survive restart via the cache file and the kernel uses them.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnn_tpu.kernels import autotune
from mnn_tpu.kernels.dequant_matmul import dequant_matmul
from mnn_tpu.quant.quantize import matmul_dequant_ref, quantize


@pytest.fixture(autouse=True)
def _tmp_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("MNN_TPU_CACHE_DIR", str(tmp_path))
    autotune._PATH = None
    autotune.invalidate_cache()
    yield
    autotune._PATH = None
    autotune.invalidate_cache()


class TestAutotune:
    def test_store_lookup_roundtrip(self):
        assert autotune.lookup(1, 256, 512, 128, 4, 16) is None
        autotune.store(1, 256, 512, 128, 4, 16, (8, 256, 256))
        autotune.invalidate_cache()   # force reload from disk
        assert autotune.lookup(1, 256, 512, 128, 4, 16) == (8, 256, 256)

    def test_candidates_include_default(self):
        from mnn_tpu.kernels.dequant_matmul import choose_blocks

        cands = autotune.candidates(1, 896, 9728, 128)
        assert choose_blocks(1, 896, 9728, 128) in cands
        assert len(cands) > 1

    def test_kernel_uses_tuned_blocks(self):
        # a deliberately non-default (but valid) tiling must produce the
        # same numbers through the kernel
        w = jax.random.normal(jax.random.PRNGKey(0), (256, 512)) * 0.1
        ql = quantize(w, bits=4, block_size=128)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 256), jnp.bfloat16)
        want = np.asarray(
            dequant_matmul(x, ql, out_dtype=jnp.float32, interpret=True)
        )
        autotune.store(1, 256, 512, 128, 4, 16, (8, 128, 128))
        got = np.asarray(
            dequant_matmul(x, ql, out_dtype=jnp.float32, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-4)

    def test_tuned_file_per_device(self):
        autotune.store(1, 128, 128, 128, 8, 16, (8, 128, 128))
        path = autotune._cache_path()
        assert os.path.exists(path)
        assert "gemm_tune_" in os.path.basename(path)
