"""Whole-model decode megakernel vs the XLA reference forward.

The megakernel (kernels/decode_model.py) must reproduce the reference
decode path (interpret=False -> pure-XLA kernels) within quantization-noise
tolerance: same logits and the same quantized KV rows written to the cache.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mnn_tpu.kernels import decode_model
from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache

BASE = ModelConfig(
    name="mk-test", vocab_size=512, hidden_size=256, intermediate_size=512,
    num_layers=3, num_heads=4, num_kv_heads=2, head_dim=64,
    rope_theta=10000.0, attention_bias=True, tie_word_embeddings=True,
)


def _setup(cfg, batch=1, cap=128, quantized=True, bits=4, prefill_len=9,
           kv_bits=8):
    params = init_random_params(
        cfg, jax.random.PRNGKey(0), quant_bits=bits, scale=0.05
    )
    cache = kvcache.create(
        cfg.num_layers, batch, cfg.num_kv_heads, cap, cfg.head_dim,
        quantized=quantized, kv_bits=kv_bits,
    )
    toks = jax.random.randint(
        jax.random.PRNGKey(1), (batch, prefill_len), 0, cfg.vocab_size,
        jnp.int32,
    )
    _, cache = forward(params, cfg, toks, cache, interpret=False)
    return params, cache


def _perlayer_forward(params, cfg, tok, cache):
    """Trusted per-layer Pallas path (megakernel dispatch disabled).

    Uses the static `megakernel=False` argument — NOT a supports()
    monkeypatch: `forward` is jit-cached, so a patched trace under the
    same signature would poison the cache and silently serve the
    per-layer computation to the megakernel calls (this happened; the
    suite passed vacuously while the kernel itself was broken).
    """
    return forward(params, cfg, tok, cache, interpret=True,
                   megakernel=False)


def _compare(cfg, params, cache, steps=3, batch=1):
    """Per-step parity: at every step, the per-layer and XLA paths run from
    the SAME state the megakernel is about to consume (megakernel evolution
    is canonical). Evolving the caches independently would let ~1e-8 f32
    reassociation noise (different chunk/tile summation orders) flip an
    int8 KV rounding boundary and compound across steps — the contract is
    per-step equivalence, not bit-identical f32 reassociation."""
    tok = jax.random.randint(
        jax.random.PRNGKey(2), (batch, 1), 0, cfg.vocab_size, jnp.int32
    )
    cache_mk = cache
    for _ in range(steps):
        ref, _ = forward(params, cfg, tok, cache_mk, interpret=False)
        pl_, cache_pl = _perlayer_forward(params, cfg, tok, cache_mk)
        mk, cache_mk = forward(params, cfg, tok, cache_mk, interpret=True)
        r = np.asarray(ref, np.float32)
        p = np.asarray(pl_, np.float32)
        m = np.asarray(mk, np.float32)
        assert np.all(np.isfinite(m))
        # cache rows written this step must match the per-layer writes;
        # a 1-level difference is a legitimate round() tie (the two paths'
        # f32 chunk-summation orders differ by ~1e-8, which flips ties)
        assert int(cache_mk.length[0]) == int(cache_pl.length[0])
        n = int(cache_pl.length[0])
        max_level = 0.0
        for name in ("k", "v"):
            a = np.asarray(getattr(cache_mk, name), np.float32)[:, :, :, :n]
            b = np.asarray(getattr(cache_pl, name), np.float32)[:, :, :, :n]
            d = np.abs(a - b).max()
            max_level = max(max_level, float(d))
            lim = 1.0 if cache_mk.quantized else 1e-5
            assert d <= lim, (name, d)
        # vs the per-layer Pallas path: same math -> near-exact, UNLESS a
        # KV round() tie flipped this step (then quantization noise ~1e-2)
        rel_pl = np.linalg.norm(m - p) / max(np.linalg.norm(p), 1e-9)
        lim_pl = 1e-4 if max_level == 0.0 else 2e-2
        assert rel_pl < lim_pl, \
            f"megakernel vs per-layer rel err {rel_pl} (kv tie={max_level})"
        # vs the XLA reference: within quantization-algebra noise
        rel = np.linalg.norm(m - r) / max(np.linalg.norm(r), 1e-9)
        assert rel < 5e-2, f"logits rel err {rel}"
        tok = jnp.argmax(mk, axis=-1).astype(jnp.int32)[:, None]


class TestMegakernel:
    def test_supports(self):
        params, cache = _setup(BASE)
        assert decode_model.supports(BASE, params, cache, 1)

    def test_int4_quantized_kv(self):
        params, cache = _setup(BASE, quantized=True, bits=4)
        _compare(BASE, params, cache)

    def test_int8_weights(self):
        params, cache = _setup(BASE, quantized=True, bits=8)
        _compare(BASE, params, cache)

    def test_bf16_kv(self):
        params, cache = _setup(BASE, quantized=False)
        _compare(BASE, params, cache)

    def test_qk_norm_no_bias(self):
        cfg = dataclasses.replace(BASE, qk_norm=True, attention_bias=False)
        params, cache = _setup(cfg)
        _compare(cfg, params, cache)

    def test_sliding_window_sink(self):
        cfg = dataclasses.replace(BASE, sliding_window=6, attention_sink=2)
        params, cache = _setup(cfg, prefill_len=20, cap=128)
        _compare(cfg, params, cache)

    def test_batch2(self):
        params, cache = _setup(BASE, batch=2)
        _compare(BASE, params, cache, batch=2)

    def test_multi_kv_tiles(self):
        # capacity 1024 -> 2 KV tiles of 512
        params, cache = _setup(BASE, cap=1024, prefill_len=30)
        _compare(BASE, params, cache)

    def test_deep_plan_parity(self):
        """DEEP mode (3-deep shared slot rings, 7B-class code path): force
        it by disabling the manual-MLP crossover, then run the full
        per-step parity harness (logits + KV rows over 3 decode steps)."""
        orig = decode_model.MLP_MANUAL_MAX
        decode_model.MLP_MANUAL_MAX = 0
        try:
            params, cache = _setup(BASE)
            plan = decode_model._plan(
                BASE, params.layers,
                type("CV", (), {"capacity": cache.capacity, "bits": 8})(), 1)
            assert plan is not None and plan.deep, plan
            _compare(BASE, params, cache)
        finally:
            decode_model.MLP_MANUAL_MAX = orig

    def test_deep_multichunk_tail(self):
        """DEEP mode with n_qkv/n_wo/n_mlp all > 1 AND a non-full qkv tail
        chunk (nq = 896 with 2ci = 256 -> 4 chunks, last 128 wide) — the
        exact shape class the 7B plan runs (nq=4608, 2ci=1024, tail 512).
        Checks the fused kernel against the per-layer oracle directly
        (logits tolerance covers the pre-existing ~2.5e-4 multi-chunk
        reassociation wobble, present on the revolving path too)."""
        cfg = dataclasses.replace(BASE, num_heads=10)
        orig_b, orig_m = decode_model.VMEM_BUDGET, decode_model.MLP_MANUAL_MAX
        decode_model.MLP_MANUAL_MAX = 0
        decode_model.VMEM_BUDGET = 1536 << 10
        try:
            params, cache = _setup(cfg)
            plan = decode_model._plan(
                cfg, params.layers,
                type("CV", (), {"capacity": cache.capacity, "bits": 8})(), 1)
            assert plan is not None and plan.deep, plan
            assert plan.n_qkv > 1 and plan.n_wo > 1 and plan.n_mlp > 2, plan
            assert plan.n_qkv * 2 * plan.ci > (
                (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim
            ), "expected a partial tail chunk"
            tok = jax.random.randint(
                jax.random.PRNGKey(2), (1, 1), 0, cfg.vocab_size, jnp.int32)
            ref, cache_pl = _perlayer_forward(params, cfg, tok, cache)
            mk, cache_mk = forward(params, cfg, tok, cache, interpret=True)
            m = np.asarray(mk, np.float32)
            r = np.asarray(ref, np.float32)
            assert np.all(np.isfinite(m))
            rel = np.linalg.norm(m - r) / max(np.linalg.norm(r), 1e-9)
            assert rel < 1e-3, f"deep multichunk logits rel err {rel}"
            for name in ("k", "v"):
                a = np.asarray(getattr(cache_mk, name), np.float32)
                b = np.asarray(getattr(cache_pl, name), np.float32)
                assert np.abs(a - b).max() <= 1.0, name
        finally:
            decode_model.VMEM_BUDGET = orig_b
            decode_model.MLP_MANUAL_MAX = orig_m

    def test_multichunk_plan(self):
        """7B-shaped code path: force the VMEM planner to chunk EVERY
        projection (n_qkv/n_wo/n_mlp > 1) by shrinking the budget, then
        check the chunked kernel against the per-layer path. Calls
        fused_decode_model directly — forward() is jit-cached, so a
        budget monkeypatch would not invalidate an existing trace."""
        cfg = dataclasses.replace(BASE, num_heads=8)
        params, cache = _setup(cfg)
        orig_budget = decode_model.VMEM_BUDGET
        # smallest feasible budget under the padded-tile accounting that
        # still forces every projection to chunk (fixed activation/KV
        # buffers alone occupy ~0.7MB at their physical tile sizes)
        decode_model.VMEM_BUDGET = 896 << 10
        try:
            plan = decode_model._plan(
                cfg, params.layers,
                type("CV", (), {"capacity": cache.capacity, "bits": 8})(), 1)
            assert plan is not None
            assert plan.n_qkv > 1 and plan.n_wo > 1 and plan.n_mlp > 1, plan
            tok = jax.random.randint(
                jax.random.PRNGKey(2), (1, 1), 0, cfg.vocab_size, jnp.int32)
            from mnn_tpu.models.layers import rope_cos_sin

            x = params.embedding[tok[:, 0]]
            cos, sin = rope_cos_sin(
                cache.length[:, None], cfg.head_dim, cfg.rope_theta)
            cos_f = jnp.concatenate([cos[:, 0], cos[:, 0]], axis=-1)
            sin_f = jnp.concatenate([sin[:, 0], sin[:, 0]], axis=-1)
            xh, k_rows, v_rows, k_sc, v_sc = decode_model.fused_decode_model(
                x, params.layers, cache.k, cache.v, cache.k_scale,
                cache.v_scale, cache.length, cos_f, sin_f, config=cfg,
                interpret=True)
        finally:
            decode_model.VMEM_BUDGET = orig_budget
        # reference hidden from the per-layer path
        ph, _ = forward(params, cfg, tok, cache, interpret=True,
                        megakernel=False, return_hidden=True)
        want = np.asarray(ph[:, 0], np.float32)
        got = np.asarray(xh, np.float32)
        rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
        assert rel < 1e-4, f"multichunk rel err {rel} (plan {plan})"

    def test_int4_kv_megakernel(self):
        """kv_bits=4: the megakernel unpacks nibble-packed tiles in place
        and emits packed new-token rows; logits must match the per-layer
        int4-KV path (which uses the XLA fallback attention)."""
        cfg = BASE
        params, cache = _setup(cfg, kv_bits=4, prefill_len=12)
        assert cache.bits == 4
        assert decode_model.supports(cfg, params, cache, 1)
        tok = jax.random.randint(
            jax.random.PRNGKey(2), (1, 1), 0, cfg.vocab_size, jnp.int32)
        for _ in range(3):
            pl_, cache_pl = forward(params, cfg, tok, cache, interpret=True,
                                    megakernel=False)
            mk, cache_mk = forward(params, cfg, tok, cache, interpret=True)
            m = np.asarray(mk, np.float32)
            p = np.asarray(pl_, np.float32)
            assert np.isfinite(m).all()
            # compare the DEQUANTIZED new rows (packed-byte diffs are
            # nonlinear in the quantization error)
            n = int(cache_pl.length[0])
            for name, sc in (("k", "k_scale"), ("v", "v_scale")):
                a = kvcache.dequant_kv(
                    getattr(cache_mk, name), getattr(cache_mk, sc), 4)
                bref = kvcache.dequant_kv(
                    getattr(cache_pl, name), getattr(cache_pl, sc), 4)
                d = np.abs(np.asarray(a - bref, np.float32)[:, :, :, :n]).max()
                # the paths rope in f32 vs bf16: allow one quant level
                # (round-tie flips) on top of the ~0.4% scale difference
                lvl = float(np.asarray(getattr(cache_pl, sc)).max())
                assert d < 1.6 * lvl + 1e-6, (name, d, lvl)
            rel = np.linalg.norm(m - p) / max(np.linalg.norm(p), 1e-9)
            assert rel < 5e-2, rel
            cache = cache_mk
            tok = jnp.argmax(mk, axis=-1).astype(jnp.int32)[:, None]

    def test_fused_head_and_token(self):
        """lm-head fusion: kernel logits must match the per-layer path's
        final-norm + head GEMV, and the in-kernel greedy argmax must equal
        argmax over those logits (first-occurrence tie-break included)."""
        cfg = dataclasses.replace(
            BASE, vocab_size=640, tie_word_embeddings=False)
        params = init_random_params(cfg, jax.random.PRNGKey(0), quant_bits=4,
                                    scale=0.05, lm_head_bits=4)
        assert decode_model.supports_head(cfg, params)
        cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 128,
                               cfg.head_dim, quantized=True)
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 9), 0,
                                  cfg.vocab_size, jnp.int32)
        _, cache = forward(params, cfg, toks, cache, interpret=False)
        tok = jax.random.randint(jax.random.PRNGKey(2), (1, 1), 0,
                                 cfg.vocab_size, jnp.int32)
        for _ in range(3):
            pl_, _ = forward(params, cfg, tok, cache, interpret=True,
                             megakernel=False)
            (mk, mtok), cache = forward(params, cfg, tok, cache,
                                        interpret=True, return_token=True)
            m = np.asarray(mk, np.float32)
            p = np.asarray(pl_, np.float32)
            assert np.isfinite(m).all()
            assert int(mtok[0]) == int(np.argmax(m))
            rel = np.linalg.norm(m - p) / max(np.linalg.norm(p), 1e-9)
            assert rel < 2e-2, rel
            tok = mtok[:, None]

    def test_fused_head_batch2(self):
        cfg = dataclasses.replace(
            BASE, vocab_size=512, tie_word_embeddings=False)
        params = init_random_params(cfg, jax.random.PRNGKey(0), quant_bits=4,
                                    scale=0.05, lm_head_bits=4)
        cache = kvcache.create(cfg.num_layers, 2, cfg.num_kv_heads, 128,
                               cfg.head_dim, quantized=True)
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0,
                                  cfg.vocab_size, jnp.int32)
        _, cache = forward(params, cfg, toks, cache, interpret=False)
        tok = jax.random.randint(jax.random.PRNGKey(2), (2, 1), 0,
                                 cfg.vocab_size, jnp.int32)
        (mk, mtok), _ = forward(params, cfg, tok, cache, interpret=True,
                                return_token=True)
        m = np.asarray(mk, np.float32)
        assert np.isfinite(m).all()
        for bi in range(2):
            assert int(mtok[bi]) == int(np.argmax(m[bi])), bi

    def test_decode_matches_prefill(self):
        # end-to-end: N megakernel decode steps == one fresh prefill
        cfg = BASE
        params, cache = _setup(cfg, quantized=False, prefill_len=6)
        toks = jax.random.randint(
            jax.random.PRNGKey(3), (1, 3), 0, cfg.vocab_size, jnp.int32
        )
        c2 = cache
        logits = None
        for i in range(3):
            logits, c2 = forward(
                params, cfg, toks[:, i:i + 1], c2, interpret=True
            )
        prefix = jax.random.randint(
            jax.random.PRNGKey(1), (1, 6), 0, cfg.vocab_size, jnp.int32
        )
        full = jnp.concatenate([prefix, toks], axis=1)
        fresh = kvcache.create(
            cfg.num_layers, 1, cfg.num_kv_heads, 128, cfg.head_dim,
            quantized=False,
        )
        want, _ = forward(params, cfg, full, fresh, interpret=False)
        r = np.asarray(want, np.float32)
        m = np.asarray(logits, np.float32)
        rel = np.linalg.norm(m - r) / max(np.linalg.norm(r), 1e-9)
        assert rel < 2e-2, rel
