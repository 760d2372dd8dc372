"""Flash attention kernel correctness vs a naive softmax-attention oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnn_tpu.kernels.flash_attention import decode_attention, flash_attention


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def naive_attention(q, k, v, kv_len=None, q_offset=None, causal=True):
    """q [B,H,Tq,D], k/v [B,Hkv,S,D] float32; kv_len scalar or [B]."""
    b, h, tq, d = q.shape
    _, hkv, s, _ = k.shape
    group = h // hkv
    kf = jnp.repeat(k, group, axis=1)
    vf = jnp.repeat(v, group, axis=1)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, kf) / (d ** 0.5)
    if kv_len is None:
        kv_len = s
    kv_len = jnp.broadcast_to(jnp.asarray(kv_len), (b,))
    col = jnp.arange(s)  # [S]
    mask = col[None, None, None, :] < kv_len[:, None, None, None]  # [B,1,1,S]
    if causal:
        if q_offset is None:
            q_offset = kv_len - tq
        q_offset = jnp.broadcast_to(jnp.asarray(q_offset), (b,))
        row_pos = q_offset[:, None] + jnp.arange(tq)[None, :]  # [B,Tq]
        causal_mask = col[None, None, None, :] <= row_pos[:, None, :, None]
        mask = jnp.logical_and(mask, causal_mask)
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, vf)


def _rel(got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-6)


class TestFlashAttention:
    @pytest.mark.parametrize("group", [1, 4])
    def test_full_causal(self, group):
        b, hkv, t, d = 1, 2, 64, 64
        h = hkv * group
        q = _rand((b, h, t, d), 0).astype(jnp.bfloat16)
        k = _rand((b, hkv, t, d), 1).astype(jnp.bfloat16)
        v = _rand((b, hkv, t, d), 2).astype(jnp.bfloat16)
        got = flash_attention(q, k, v, block_q=32, block_kv=32, interpret=True)
        want = naive_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        assert _rel(got, want) < 2e-2

    def test_partial_cache(self):
        # queries for positions 16..31 against a 64-slot cache with 32 valid
        b, h, d = 1, 2, 64
        s, tq = 64, 16
        kv_len = jnp.asarray(32, jnp.int32)
        q_offset = jnp.asarray(16, jnp.int32)
        q = _rand((b, h, tq, d), 3).astype(jnp.bfloat16)
        k = _rand((b, h, s, d), 4).astype(jnp.bfloat16)
        v = _rand((b, h, s, d), 5).astype(jnp.bfloat16)
        got = flash_attention(q, k, v, kv_len=kv_len, q_offset=q_offset,
                              block_q=16, block_kv=32, interpret=True)
        want = naive_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
            kv_len=32, q_offset=16,
        )
        assert _rel(got, want) < 2e-2

    def test_non_causal(self):
        b, h, t, d = 1, 1, 32, 64
        q = _rand((b, h, t, d), 6).astype(jnp.bfloat16)
        k = _rand((b, h, t, d), 7).astype(jnp.bfloat16)
        v = _rand((b, h, t, d), 8).astype(jnp.bfloat16)
        got = flash_attention(q, k, v, causal=False, block_q=16, block_kv=16, interpret=True)
        want = naive_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
            causal=False,
        )
        assert _rel(got, want) < 2e-2


class TestDecodeAttention:
    @pytest.mark.parametrize("group", [1, 7])
    def test_bf16_cache(self, group):
        b, hkv, s, d = 2, 2, 256, 64
        h = hkv * group
        kv_len = jnp.asarray([130, 97], jnp.int32)
        q = _rand((b, h, d), 9).astype(jnp.bfloat16)
        k = _rand((b, hkv, s, d), 10).astype(jnp.bfloat16)
        v = _rand((b, hkv, s, d), 11).astype(jnp.bfloat16)
        got = decode_attention(q, k, v, kv_len, block_kv=128, interpret=True)
        want = naive_attention(
            q.astype(jnp.float32)[:, :, None], k.astype(jnp.float32),
            v.astype(jnp.float32), kv_len=kv_len, causal=False,
        )[:, :, 0]
        assert _rel(got, want) < 2e-2

    def test_int8_cache(self):
        b, hkv, s, d = 1, 2, 256, 64
        h = hkv * 4
        kv_len = jnp.asarray([180], jnp.int32)
        q = _rand((b, h, d), 12).astype(jnp.bfloat16)
        kf = _rand((b, hkv, s, d), 13)
        vf = _rand((b, hkv, s, d), 14)
        # per-token symmetric int8 quantization of K and V
        ks = jnp.max(jnp.abs(kf), axis=-1) / 127.0
        vs = jnp.max(jnp.abs(vf), axis=-1) / 127.0
        kq = jnp.round(kf / ks[..., None]).astype(jnp.int8)
        vq = jnp.round(vf / vs[..., None]).astype(jnp.int8)
        got = decode_attention(
            q, kq, vq, kv_len, k_scale=ks, v_scale=vs, block_kv=128, interpret=True
        )
        want = naive_attention(
            q.astype(jnp.float32)[:, :, None], kf, vf,
            kv_len=kv_len, causal=False,
        )[:, :, 0]
        assert _rel(got, want) < 3e-2


class TestSlidingWindow:
    def _naive_window(self, q, k, v, window, sink, q_offset):
        b, h, t, d = q.shape
        s = k.shape[2]
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / (d ** 0.5)
        col = jnp.arange(s)[None, :]
        row = q_offset + jnp.arange(t)[:, None]
        mask = col <= row
        win = col > row - window
        if sink:
            win = win | (col < sink)
        mask = mask & win
        scores = jnp.where(mask[None, None], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", p, v)

    def test_prefill_window_and_sink(self):
        b, h, t, d = 1, 2, 64, 64
        q = _rand((b, h, t, d), 20).astype(jnp.bfloat16)
        k = _rand((b, h, t, d), 21).astype(jnp.bfloat16)
        v = _rand((b, h, t, d), 22).astype(jnp.bfloat16)
        got = flash_attention(q, k, v, kv_len=jnp.asarray(t, jnp.int32),
                              q_offset=jnp.asarray(0, jnp.int32),
                              window=16, sink=4, block_q=32, block_kv=32,
                              interpret=True)
        want = self._naive_window(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), 16, 4, 0)
        assert _rel(got, want) < 2e-2

    def test_decode_window(self):
        b, hkv, s, d = 1, 2, 256, 64
        h = 4
        kv_len = jnp.asarray([200], jnp.int32)
        q = _rand((b, h, d), 23).astype(jnp.bfloat16)
        k = _rand((b, hkv, s, d), 24).astype(jnp.bfloat16)
        v = _rand((b, hkv, s, d), 25).astype(jnp.bfloat16)
        got = decode_attention(q, k, v, kv_len, window=32, sink=2,
                               block_kv=128, interpret=True)
        kf = jnp.repeat(k.astype(jnp.float32), 2, axis=1)
        vf = jnp.repeat(v.astype(jnp.float32), 2, axis=1)
        want = self._naive_window(
            q.astype(jnp.float32)[:, :, None], kf[:, :, :], vf, 32, 2,
            jnp.asarray(199))[:, :, 0]
        # mask out positions >= kv_len in oracle: emulate by slicing
        want_sliced = self._naive_window(
            q.astype(jnp.float32)[:, :, None], kf[:, :, :200], vf[:, :, :200],
            32, 2, jnp.asarray(199))[:, :, 0]
        assert _rel(got, want_sliced) < 2e-2
