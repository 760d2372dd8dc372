"""Native C++ components vs the safetensors/Python reference implementations."""

import numpy as np
import pytest

from mnn_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library failed to build"
)


class TestStFile:
    def test_matches_safetensors_lib(self, tmp_path):
        from safetensors.numpy import save_file

        rng = np.random.default_rng(0)
        tensors = {
            "a": rng.standard_normal((17, 9)).astype(np.float32),
            "b": rng.integers(-128, 128, (33,), dtype=np.int8),
            "c.d": rng.standard_normal((2, 3, 4)).astype(np.float32),
        }
        path = str(tmp_path / "x.safetensors")
        save_file(tensors, path, metadata={"k": "v"})

        with native.StFile(path) as f:
            assert set(f.names) == set(tensors)
            assert f.metadata() == {"k": "v"}
            for name, want in tensors.items():
                got = f.tensor(name)
                assert got.dtype == want.dtype
                np.testing.assert_array_equal(got, want)

    def test_bf16_view(self, tmp_path):
        import jax.numpy as jnp
        from safetensors.numpy import save_file

        x = np.asarray(jnp.asarray([1.5, -2.25, 3.0], jnp.bfloat16))
        save_file({"t": x.view(np.uint16)}, str(tmp_path / "b.safetensors"))
        with native.StFile(str(tmp_path / "b.safetensors")) as f:
            got = f.tensor("t")
            back = np.asarray(jnp.asarray(got).view(jnp.bfloat16), np.float32)
            np.testing.assert_array_equal(back, [1.5, -2.25, 3.0])

    def test_missing_file(self):
        with pytest.raises(OSError):
            native.StFile("/nonexistent/file.safetensors")


class TestNativeNgram:
    def test_matches_python_impl(self):
        from mnn_tpu.runtime.speculative import NgramDraft

        rng = np.random.default_rng(1)
        seq = rng.integers(0, 6, 300).tolist()  # small vocab -> many matches
        py = NgramDraft(draft_len=5)
        nat = native.NativeNgramIndex(max_n=4, draft_len=5)
        matches = 0
        for i in range(0, len(seq), 7):
            chunk = seq[i : i + 7]
            py.extend(chunk)
            nat.extend(chunk)
            a, b = py.propose(), nat.propose()
            assert a == b, (i, a, b)
            matches += a is not None
        assert matches > 5  # the comparison actually exercised proposals
        assert len(nat) == len(py.history)
