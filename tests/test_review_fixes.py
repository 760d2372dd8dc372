"""Regression tests for the serving/runtime review findings: cancel slot
leaks, decode-priority admission, EOS-tail cache hygiene, lookahead budget,
audio-length truncation, prefix-cache path round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import PRESETS, RuntimeConfig
from mnn_tpu.models.decoder import init_random_params
from mnn_tpu.runtime.batch_engine import BatchEngine, Status
from mnn_tpu.runtime.llm import Llm

CFG = PRESETS["tiny"]


@pytest.fixture(scope="module")
def params():
    return init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)


def _rt(**kw):
    base = dict(max_batch=1, max_seq_len=64, prefill_chunk=16,
                decode_block=4, sampler="greedy", kv_quant=False,
                max_new_tokens=8)
    base.update(kw)
    return RuntimeConfig(**base)


class TestEngineScheduling:
    def test_cancel_frees_slot(self, params):
        eng = BatchEngine(CFG, params, _rt(max_batch=1))
        a = eng.submit([1, 2, 3], 50)       # long-running, occupies the slot
        b = eng.submit([4, 5, 6], 4)        # waits for the slot
        eng.step()                          # a admitted + decoding
        assert a.slot >= 0
        eng.cancel(a.rid)
        eng.run_until_idle()                # must not spin forever
        assert a.status == Status.CANCELLED and a.slot == -1
        assert b.status == Status.DONE and len(b.generated) == 4

    def test_decode_priority_still_admits(self, params):
        eng = BatchEngine(CFG, params, _rt(max_batch=2))
        eng.prefill_priority = False
        reqs = [eng.submit([i + 1, i + 2], 4) for i in range(3)]
        eng.run_until_idle()
        for r in reqs:
            assert r.status == Status.DONE
            assert len(r.generated) == 4

    def test_first_token_matches_llm_greedy(self, params):
        """Sampled-first-token path must still equal Llm.stream under
        greedy (regression: admission used raw argmax before)."""
        llm = Llm(CFG, params, _rt())
        want = list(llm.stream(token_ids=[3, 7, 11], max_new_tokens=6))
        eng = BatchEngine(CFG, params, _rt(max_batch=2))
        got = eng.generate([3, 7, 11], 6)
        assert got == want


class TestEosCacheHygiene:
    def test_stream_rolls_back_unconsumed_block_tail(self, params):
        llm = Llm(CFG, params, _rt(decode_block=4))
        first_run = list(llm.stream(token_ids=[3, 1, 4], max_new_tokens=8))
        llm.reset()
        # make the 2nd generated token the EOS: stop mid-block
        import types
        llm.tokenizer = types.SimpleNamespace(eos_ids={first_run[1]})
        out = list(llm.stream(token_ids=[3, 1, 4], max_new_tokens=8))
        assert out[-1] == first_run[1] and len(out) == 2
        # cache must contain prompt + consumed tokens only
        assert llm.context_len == 3 + len(out)


class TestLookaheadBudget:
    def test_never_exceeds_max_new(self, params):
        rt = _rt(speculative="lookahead", max_new_tokens=7, decode_block=4)
        llm = Llm(CFG, params, rt)
        out = list(llm.stream(token_ids=[5, 6, 7, 8], max_new_tokens=7))
        assert len(out) <= 7


class TestAudioTruncation:
    def test_long_audio_truncates_not_crashes(self):
        from mnn_tpu.models import audio_encoder as ae
        cfg = ae.AudioEncoderConfig(n_mels=8, hidden_size=16, num_layers=1,
                                    num_heads=2, ffn_size=32,
                                    max_positions=10)
        p = ae.init_audio_encoder_params(cfg, jax.random.PRNGKey(0))
        mel = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64))  # > 2*10
        out = ae.audio_encoder_forward(p, cfg, mel)
        assert out.shape == (1, 10, 16)


class TestPrefixCachePath:
    def test_extensionless_path_roundtrips(self, params, tmp_path):
        from mnn_tpu.runtime import kvcache
        from mnn_tpu.runtime.prefix_cache import load_prefix, save_prefix
        import os
        cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 32,
                               CFG.head_dim, quantized=False)
        llm = Llm(CFG, params, _rt())
        list(llm.stream(token_ids=[1, 2, 3], max_new_tokens=2))
        path = str(tmp_path / "prefix.kv")   # no .npz suffix
        n = save_prefix(path, llm.cache, [1, 2, 3, 0, 0])
        assert os.path.exists(path)
        _, toks = load_prefix(path, cache)
        assert len(toks) == n


class TestDeadlines:
    """Round-3 advisor findings: queued requests must expire at their
    deadline without paying prefill, and deadlines must survive
    snapshot/resume as a remaining-time budget."""

    def test_waiting_queue_deadline_expires_on_admission(self, params):
        eng = BatchEngine(CFG, params, _rt(max_batch=1))
        blocker = eng.submit([1, 2, 3], max_new_tokens=8)
        eng.step()                       # blocker occupies the only slot
        stale = eng.submit([4, 5], max_new_tokens=8, timeout_s=0.01)
        import time

        time.sleep(0.05)
        # drain the blocker so a slot frees and admission drains the queue
        for _ in range(8):
            eng.step()
        assert stale.status == Status.TIMEOUT
        assert stale.out.get_nowait() is None   # client sentinel delivered
        assert stale.slot == -1                 # never admitted

    def test_deadline_survives_resume(self, params, tmp_path):
        import json

        eng = BatchEngine(CFG, params, _rt(max_batch=1))
        req = eng.submit([1, 2, 3], max_new_tokens=8, timeout_s=120.0)
        eng.step()
        path = str(tmp_path / "snap.npz")
        eng.snapshot(path)
        z = np.load(path, allow_pickle=False)
        meta = json.loads(str(z["meta"]))
        slot_meta = [m for m in meta["slots"] if m is not None][0]
        assert 0 < slot_meta["remaining_s"] <= 120.0
        eng2 = BatchEngine.resume(path, CFG, params, _rt(max_batch=1))
        live = [r for r in eng2.slots if r is not None][0]
        assert live.deadline is not None


class TestCompactTailLength:
    def test_only_row0_length_touched(self):
        from mnn_tpu.runtime import kvcache

        cache = kvcache.create(2, 2, 2, 16, 8, quantized=False)
        import dataclasses

        cache = dataclasses.replace(
            cache, length=jnp.asarray([6, 11], jnp.int32))
        out = kvcache.compact_tail(cache, 4, jnp.asarray([0, 2, 3]), 2)
        assert int(out.length[0]) == 6          # 4 + m
        assert int(out.length[1]) == 11         # other row untouched


class TestGemma3LayerTypes:
    def test_bidirectional_validation(self):
        from mnn_tpu.models.config import ModelConfig

        base = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=12, num_attention_heads=2,
                    num_key_value_heads=1, head_dim=16,
                    architectures=["Gemma3ForCausalLM"])
        ok = dict(base, layer_types=[
            "sliding_attention" if (i + 1) % 3 else "full_attention"
            for i in range(12)])
        assert ModelConfig.from_hf_config(ok).swa_pattern == 3
        # fulls at 2,5,11 -> inferred pattern 3 but position 8 is sliding
        lt = ["sliding_attention"] * 12
        for i in (2, 5, 11):
            lt[i] = "full_attention"
        with pytest.raises(NotImplementedError):
            ModelConfig.from_hf_config(dict(base, layer_types=lt))


class TestVisionTemporal:
    def test_temporal_param_respected(self):
        from mnn_tpu.runtime.vision_preprocess import qwen2_preprocess

        img = np.zeros((28, 28, 3), np.uint8)
        for t in (1, 2, 3):
            out = qwen2_preprocess(img, temporal=t)
            assert out.pixels.shape[1] == t * 14 * 14 * 3, t
