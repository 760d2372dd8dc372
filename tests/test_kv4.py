"""Int4 (nibble-packed) KV cache — the reference's TQ4 sub-byte KV analog
(/root/reference/source/backend/cpu/CPUKVCacheManager.hpp:20,
compute/TurboQuant.hpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.kernels.flash_attention import attention_xla_ref, decode_attention
from mnn_tpu.models.config import RuntimeConfig
from mnn_tpu.runtime import kvcache
from mnn_tpu.runtime.llm import Llm


class TestQuantizeKV4:
    def test_round_trip_error_bound(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 64), jnp.float32)
        packed, scale = kvcache.quantize_kv4(x)
        assert packed.shape == (2, 4, 8, 32) and packed.dtype == jnp.int8
        deq = kvcache.unpack_kv4(packed) * scale[..., None]
        err = np.abs(np.asarray(deq) - np.asarray(x))
        # per-element error <= scale/2 (round-to-nearest on a 15-level grid)
        assert (err <= np.asarray(scale)[..., None] / 2 + 1e-6).all()

    def test_pairing_layout(self):
        # byte j packs (dim j, dim j + D/2)
        x = jnp.arange(-8, 8, dtype=jnp.float32).reshape(1, 1, 1, 16) / 2.0
        packed, scale = kvcache.quantize_kv4(x)
        deq = np.asarray(kvcache.unpack_kv4(packed) * scale[..., None])
        np.testing.assert_allclose(deq, np.asarray(x), atol=float(scale.max()) / 2)

    def test_create_int4_cache_shapes(self):
        c = kvcache.create(2, 1, 4, 128, 64, quantized=True, kv_bits=4)
        assert c.bits == 4
        assert c.k.shape == (2, 1, 4, 128, 32)
        assert c.k_scale.shape == (2, 1, 4, 128)


class TestDecodeAttentionInt4:
    def _setup(self, b=1, h=8, hkv=4, s=256, d=64, n=100):
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, h, d), jnp.float32).astype(jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
        v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
        kq, ksc = kvcache.quantize_kv4(k)
        vq, vsc = kvcache.quantize_kv4(v)
        kv_len = jnp.asarray(n, jnp.int32)
        # oracle: attention over the DEQUANTIZED int4 values (so we test the
        # kernel path, not the quantization error)
        kd = kvcache.dequant_kv(kq, ksc, 4)
        vd = kvcache.dequant_kv(vq, vsc, 4)
        want = attention_xla_ref(
            q[:, :, None], kd, vd, kv_len=kv_len, causal=False,
            q_offset=jnp.asarray([n - 1]),
        )[:, :, 0]
        return q, kq, vq, ksc, vsc, kv_len, want

    def test_kernel_matches_oracle(self):
        q, kq, vq, ksc, vsc, kv_len, want = self._setup()
        got = decode_attention(
            q, kq, vq, kv_len, k_scale=ksc, v_scale=vsc, block_kv=128,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )

    def test_xla_ref_path_matches_oracle(self):
        q, kq, vq, ksc, vsc, kv_len, want = self._setup()
        got = decode_attention(
            q, kq, vq, kv_len, k_scale=ksc, v_scale=vsc, interpret=False,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )

    def test_stacked_layer_index(self):
        q, kq, vq, ksc, vsc, kv_len, want = self._setup()
        kq2 = jnp.stack([jnp.zeros_like(kq), kq])
        vq2 = jnp.stack([jnp.zeros_like(vq), vq])
        ks2 = jnp.stack([jnp.ones_like(ksc), ksc])
        vs2 = jnp.stack([jnp.ones_like(vsc), vsc])
        got = decode_attention(
            q, kq2, vq2, kv_len, k_scale=ks2, v_scale=vs2,
            layer_index=jnp.asarray(1), block_kv=128, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )


class TestEndToEndKV4:
    def _llm(self, kv_bits):
        rt = RuntimeConfig(
            max_seq_len=256, prefill_chunk=32, decode_block=4,
            sampler="greedy", kv_quant=True, kv_bits=kv_bits,
        )
        return Llm.synthetic("tiny", rt=rt)

    def test_generates_and_logits_track_bf16(self):
        from mnn_tpu.runtime import generate as gen

        prompt = [3, 1, 4, 1, 5, 9, 2, 6] * 3
        out4 = list(self._llm(4).stream(token_ids=prompt, max_new_tokens=16))
        assert len(out4) == 16

        # prefill logits under int4 KV must track the bf16-cache logits
        # closely (argmax equality is a knife-edge with random weights —
        # the top-1 margin is ~0.1 sigma — so test correlation instead)
        logits = {}
        for bits, quant in [(16, False), (4, True)]:
            rt = RuntimeConfig(
                max_seq_len=256, prefill_chunk=32, decode_block=4,
                sampler="greedy", kv_quant=quant, kv_bits=bits if quant else 8,
            )
            llm = Llm.synthetic("tiny", rt=rt)
            lg, _ = gen.run_prefill(
                llm.params, llm.config, llm.rt,
                jnp.asarray([prompt], jnp.int32), llm.cache,
            )
            logits[bits] = np.asarray(lg[0], np.float32)
        corr = np.corrcoef(logits[4], logits[16])[0, 1]
        assert corr > 0.9, corr

    def test_rollback_and_reset(self):
        llm = self._llm(4)
        list(llm.stream(token_ids=[1, 2, 3, 4], max_new_tokens=4))
        n = llm.context_len
        llm.rollback(2)
        assert llm.context_len == n - 2
        llm.reset()
        assert llm.context_len == 0
