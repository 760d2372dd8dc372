"""Speculative decoding: losslessness vs plain greedy + eval correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import RuntimeConfig
from mnn_tpu.runtime.llm import Llm
from mnn_tpu.runtime.speculative import NgramDraft


def _llm(**kw):
    rt = RuntimeConfig(
        max_seq_len=256, prefill_chunk=32, decode_block=4, sampler="greedy",
        kv_quant=False, **kw
    )
    return Llm.synthetic("tiny", rt=rt)


class TestNgramDraft:
    def test_propose_from_history(self):
        d = NgramDraft(draft_len=4)
        d.extend([1, 2, 3, 4, 5, 1, 2, 3])
        # last trigram (1,2,3) seen before at pos 3 -> draft [4, 5, 1, 2]
        assert d.propose() == [4, 5, 1, 2]

    def test_no_match(self):
        d = NgramDraft()
        d.extend([1, 2, 3])
        # the only occurrence of each suffix is itself (pos == n) -> no draft
        assert d.propose() is None

    def test_longest_ngram_preferred(self):
        d = NgramDraft(draft_len=2, max_n=4)
        d.extend([7, 1, 2, 3, 9, 0, 1, 2, 3])
        # 4-gram (0,1,2,3)? only at end. 3-gram (1,2,3) matched at pos 4 -> [9, 0]
        assert d.propose() == [9, 0]


class TestLookaheadLossless:
    def test_matches_plain_greedy(self):
        # repetitive prompt gives the draft table something to hit
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
        plain = _llm()
        want = list(plain.stream(token_ids=prompt, max_new_tokens=24))

        spec = _llm(speculative="lookahead", draft_len=4)
        got = list(spec.stream(token_ids=prompt, max_new_tokens=24))
        # lossless: greedy lookahead must emit the same tokens (may overshoot
        # by ending a verify block, so compare the common prefix length)
        n = min(len(want), len(got), 24)
        assert got[:n] == want[:n], (got, want)
        assert spec.spec_stats["drafted"] >= 0

    def test_speculative_context_consistent(self):
        prompt = [1, 2, 3, 1, 2, 3, 1, 2]
        spec = _llm(speculative="lookahead", draft_len=4)
        out = list(spec.stream(token_ids=prompt, max_new_tokens=10))
        # the newest emitted token is not yet forwarded into the cache
        total = len(prompt) + len(out)
        assert total - 1 <= spec.context_len <= total


class TestPerplexity:
    def test_vs_torch_oracle(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import Qwen2Config, Qwen2ForCausalLM
        from mnn_tpu.convert.checkpoint import load_checkpoint
        from mnn_tpu.convert.hf import convert_hf
        from mnn_tpu.runtime.evaluate import perplexity, sequence_nll

        cfg = Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        torch.manual_seed(1)
        model = Qwen2ForCausalLM(cfg).eval()
        src = str(tmp_path / "hf")
        model.save_pretrained(src, safe_serialization=True)
        out = str(tmp_path / "conv")
        convert_hf(src, out, bits=8, block_size=32)
        config, params, _ = load_checkpoint(out)

        rng = np.random.default_rng(0)
        ids = rng.integers(0, 128, 40).tolist()
        with torch.no_grad():
            t_ids = torch.tensor([ids])
            logits = model(t_ids).logits.float()
            logp = torch.log_softmax(logits[0, :-1], dim=-1)
            want_nll = -logp.gather(1, t_ids[0, 1:, None]).sum().item()

        nll, count = sequence_nll(params, config, ids, chunk=16)
        assert count == len(ids) - 1
        assert abs(nll - want_nll) / want_nll < 0.05, (nll, want_nll)
        ppl = perplexity(params, config, ids, chunk=16)
        assert ppl > 1.0
