"""Draft-model speculative decoding (EAGLE / MTP heads): losslessness.

Mirrors the reference's Mtp/EagleGeneration strategies
(/root/reference/transformers/llm/engine/src/speculative_decoding/
generate.hpp:29-105): a draft proposes tokens, one target forward verifies,
and greedy output must be bit-identical to plain autoregressive decode no
matter how good or bad the draft is.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import PRESETS, RuntimeConfig
from mnn_tpu.runtime.llm import Llm


def _llm(**kw):
    rt = RuntimeConfig(
        max_seq_len=256, prefill_chunk=32, decode_block=4, sampler="greedy",
        kv_quant=False, **kw
    )
    return Llm.synthetic("tiny", rt=rt)


PROMPT = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]


class TestDraftModelLossless:
    @pytest.mark.parametrize("mode", ["eagle", "eagle-tree", "mtp"])
    def test_matches_plain_greedy(self, mode):
        plain = _llm()
        want = list(plain.stream(token_ids=PROMPT, max_new_tokens=20))

        spec = _llm(speculative=mode, draft_len=3)
        got = list(spec.stream(token_ids=PROMPT, max_new_tokens=20))
        n = min(len(want), len(got), 20)
        assert got[:n] == want[:n], (mode, got, want)
        assert spec.spec_stats["drafted"] > 0

    def test_oracle_draft_full_acceptance(self):
        """A drafter that cheats by running the target itself must be fully
        accepted — validates the accept/rollback bookkeeping end to end."""
        from mnn_tpu.runtime import kvcache
        from mnn_tpu.runtime.speculative import _verify_fwd, draft_generate

        plain = _llm()
        want = list(plain.stream(token_ids=PROMPT, max_new_tokens=16))

        llm = _llm()

        class OracleDraft:
            draft_len = 3

            def start(self, params, config, prompt_ids, feats):
                self.params, self.config = params, config

            def propose(self, last_token, last_feat):
                # run the target on a throwaway copy of the engine cache
                cache = llm.cache
                tok = last_token
                out = []
                for _ in range(self.draft_len):
                    targets, _, cache = _verify_fwd(
                        self.params, self.config,
                        jnp.asarray([[tok]], jnp.int32), cache,
                    )
                    tok = int(np.asarray(targets[0, 0]))
                    out.append(tok)
                return out

            def commit(self, *a, **kw):
                pass

            def rollback(self, n):
                pass

        got = []
        for block in draft_generate(llm, PROMPT, 16, drafter=OracleDraft()):
            got.extend(block)
        n = min(len(want), len(got), 16)
        assert got[:n] == want[:n], (got, want)
        assert llm.spec_stats["accept_rate"] == 1.0

    def test_eagle_cache_consistency_across_rounds(self):
        """Eagle's draft KV length must track the verified sequence length."""
        llm = _llm(speculative="eagle", draft_len=3)
        out = list(llm.stream(token_ids=PROMPT, max_new_tokens=12))
        assert len(out) >= 12
        # eagle holds pairs (s_1..s_q): every token except the very last
        # emitted one (never fed back) has been consumed -> q = total - 2
        total = len(PROMPT) + len(out)
        assert int(llm.drafter.cache.length[0]) == total - 2


class TestMtpHeads:
    def test_propose_shape(self):
        from mnn_tpu.models import eagle as em

        c = PRESETS["tiny"]
        llm = _llm()
        heads = em.init_random_mtp(c, jax.random.PRNGKey(0), num_heads=4)
        feat = jnp.ones((1, c.hidden_size), jnp.bfloat16)
        toks = em.mtp_propose(heads, llm.params, feat)
        assert toks.shape == (1, 4)
        assert (np.asarray(toks) >= 0).all() and (np.asarray(toks) < c.vocab_size).all()
