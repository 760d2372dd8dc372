"""Sub-4-bit weight modes (W2/W3): packing, kernels, megakernel, ppl.

The reference ships dedicated low-memory W2/W3 GEMV asm
(/root/reference/source/backend/cpu/arm/arm64/low_memory/
MNNGemmInt8AddBiasScale_ARMV82_w2_Unit.S, _w3_Unit.S) and publishes
decode-by-weight-bits numbers (W2/W3/W4 = 409/303/349 tok/s,
skills/metal-optimize/perf-playbook.md:206). The TPU build packs W2 as
four 2-bit lane groups per byte and W3 as a 2-bit plane + 1-bit plane
per quant block (byte-spanning 3-bit codes cannot be unpacked with
lane-aligned TPU ops), with the same per-block affine dequant algebra.
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from mnn_tpu.quant.quantize import (dequantize, matmul_dequant_ref,
                                    pack_int2, pack_int3, quantize,
                                    unpack_bits)


class TestPacking:
    @pytest.mark.parametrize("bits", [2, 3])
    def test_roundtrip_exact(self, bits):
        q = jax.random.randint(
            jax.random.PRNGKey(0), (256, 64), 0, 1 << bits, jnp.int32)
        p = (pack_int2 if bits == 2 else pack_int3)(q, 128)
        assert p.shape[0] == 256 * bits // 8
        back = unpack_bits(p, bits, 128)
        assert (np.asarray(back) == np.asarray(q)).all()

    @pytest.mark.parametrize("bits", [2, 3])
    def test_quant_error_bound(self, bits):
        w = jax.random.normal(jax.random.PRNGKey(1), (512, 96)) * 0.1
        ql = quantize(w, bits=bits, block_size=128)
        err = np.abs(np.asarray(dequantize(ql)) - np.asarray(w))
        smax = np.asarray(ql.scale, np.float32).max()
        # asym per-block: |err| <= scale/2 (+ bf16 plane rounding slack)
        assert err.max() <= smax / 2 * 1.02


class TestKernels:
    @pytest.mark.parametrize("bits", [2, 3])
    @pytest.mark.parametrize("m", [1, 8, 300])
    def test_dequant_matmul_matches_ref(self, bits, m):
        from mnn_tpu.kernels.dequant_matmul import dequant_matmul

        w = jax.random.normal(jax.random.PRNGKey(0), (512, 768)) * 0.05
        ql = quantize(w, bits=bits, block_size=128)
        x = jax.random.normal(
            jax.random.PRNGKey(1), (m, 512)).astype(jnp.bfloat16)
        ref = np.asarray(matmul_dequant_ref(x, ql, dtype=jnp.float32))
        out = np.asarray(dequant_matmul(
            x, ql, out_dtype=jnp.float32, interpret=True))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        # partial-product vs dequantize-then-matmul algebra: bf16-rounding
        # differences scale with the (large) low-bit bias term
        assert rel < 5e-3, (bits, m, rel)


def _run_megakernel_parity(bits: int):
    import tests.test_decode_model as t

    params, cache = t._setup(t.BASE, quantized=True, bits=bits)
    t._compare(t.BASE, params, cache)


class TestMegakernel:
    @pytest.mark.parametrize("bits", [2, 3])
    def test_parity(self, bits):
        """Runs in a FRESH subprocess: XLA:CPU's codegen segfaults
        compiling the W2/W3 unpack graphs when they are first traced late
        in a long test session (reproduced twice at the same suite
        position; standalone runs always pass). Process isolation keeps
        the suite green without touching the kernels' shift lowering,
        which is correct and fast on the real TPU."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                            "--xla_allow_excess_precision=false")
        code = (f"import sys; sys.path.insert(0, {repr(_REPO)});\n"
                "import jax; jax.config.update('jax_platforms', 'cpu')\n"
                f"import tests.test_w23 as m; m._run_megakernel_parity({bits})\n"
                "print('PARITY_OK')")
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           cwd=_REPO, capture_output=True, text=True,
                           timeout=900)
        assert r.returncode == 0 and "PARITY_OK" in r.stdout, \
            (r.returncode, r.stderr[-1500:])


class TestPpl:
    def test_w2_w3_ppl_ordering(self, tmp_path):
        """Perplexity vs the torch FP oracle degrades monotonically with
        fewer weight bits, and W3 stays within a usable band (the
        reference's published W2 numbers likewise trade ppl for speed)."""
        torch = pytest.importorskip("torch")
        from transformers import Qwen2Config, Qwen2ForCausalLM

        from mnn_tpu.convert.checkpoint import load_checkpoint
        from mnn_tpu.convert.hf import convert_hf
        from mnn_tpu.runtime.evaluate import perplexity

        cfg = Qwen2Config(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        model = Qwen2ForCausalLM(cfg).eval()
        src = str(tmp_path / "hf")
        model.save_pretrained(src, safe_serialization=True)

        rng = np.random.default_rng(3)
        ids = rng.integers(0, 256, 192).tolist()
        with torch.no_grad():
            t_ids = torch.tensor([ids])
            lg = model(t_ids).logits.float()
            lp = torch.log_softmax(lg[0, :-1], dim=-1)
            nll = -lp.gather(1, t_ids[0, 1:, None]).sum().item()
        ppl_fp = math.exp(nll / (len(ids) - 1))

        ppl = {}
        for bits in (4, 3, 2):
            out = str(tmp_path / f"conv{bits}")
            convert_hf(src, out, bits=bits, block_size=32, lm_head_bits=8)
            config, params, _ = load_checkpoint(out)
            ppl[bits] = perplexity(params, config, ids, chunk=64)
        d = {b: abs(p - ppl_fp) / ppl_fp for b, p in ppl.items()}
        print(f"ppl fp={ppl_fp:.3f} " + " ".join(
            f"w{b}={ppl[b]:.3f} ({100*d[b]:.1f}%)" for b in (4, 3, 2)))
        # monotone degradation (generous slack for the tiny random model)
        assert ppl[3] >= ppl[4] * 0.98
        assert ppl[2] >= ppl[3] * 0.98
        assert d[4] < 0.06
        assert d[3] < 0.25
        assert d[2] < 2.5
