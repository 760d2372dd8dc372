"""DFlash block-diffusion speculative decoding (reference parity:
transformers/llm/engine/src/speculative_decoding/dflash.cpp — a
non-causal draft net emits a whole block per forward; the target's verify
loop keeps the output lossless vs plain greedy decode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import RuntimeConfig
from mnn_tpu.runtime.llm import Llm

PROMPT = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]


def _llm(**kw):
    rt = RuntimeConfig(
        max_seq_len=256, prefill_chunk=32, decode_block=4, sampler="greedy",
        kv_quant=False, **kw
    )
    return Llm.synthetic("tiny", rt=rt)


class TestDFlash:
    def test_matches_plain_greedy(self):
        """Random draft net, low acceptance — output must still equal the
        plain AR greedy stream (verification is lossless)."""
        plain = _llm()
        want = list(plain.stream(token_ids=PROMPT, max_new_tokens=20))

        spec = _llm(speculative="dflash", draft_len=4)
        got = list(spec.stream(token_ids=PROMPT, max_new_tokens=20))
        n = min(len(want), len(got), 20)
        assert got[:n] == want[:n], (got, want)
        assert spec.spec_stats["drafted"] > 0

    def test_block_logits_shape_and_context_window(self):
        from mnn_tpu.models.dflash import (dflash_block_logits,
                                           fc_forward, init_random_dflash)
        from mnn_tpu.runtime.speculative import DFlashDraft

        llm = _llm()
        dp = init_random_dflash(llm.config, jax.random.PRNGKey(0),
                                block_size=4)
        d = DFlashDraft(dp, capacity=16)
        feats = jnp.ones((1, 24, llm.config.hidden_size), jnp.bfloat16)
        d.start(llm.params, llm.config, list(range(24)), feats)
        # 24 prompt rows into a 16-capacity window: slid, positions kept
        assert d.n == 16 and d.start_pos == 8
        out = dflash_block_logits(
            dp, llm.params, llm.config, d.ctx,
            jnp.asarray(d.n, jnp.int32), jnp.asarray(d.start_pos, jnp.int32))
        assert out.shape == (1, 4, llm.config.vocab_size)
        assert np.isfinite(np.asarray(out)).all()
        toks = d.propose(3, feats[:, -1])
        assert len(toks) == 4
        # commit 2 accepted (+1 corrected) rows, then roll one back
        d.commit(3, feats[:, -1], [1, 2, 3], fc_forward(dp, feats[:, :8]), 2)
        assert d.n == 16  # window full: slid by 3
        d.rollback(1)
        assert d.n == 15
