"""Speculative decoding: n-gram lookahead draft + single-pass verification.

Port of the reference's generation-strategy hierarchy
(/root/reference/transformers/llm/engine/src/speculative_decoding/generate.hpp:29-105):
`ArGeneration` is the plain autoregressive loop (runtime/generate.py);
`LookaheadGeneration` (ngram.hpp) drafts the continuation of the most recent
n-gram from the prompt+generation history and verifies all draft tokens in
ONE forward — on TPU the verify pass is a tiny prefill (T = draft+1) whose
cost is barely above a single-token step, so every accepted draft token is
nearly free. Rejected suffixes roll the KV cache back (kvcache.rollback —
the reference does the same through KVMeta remove, tokentree.hpp).

Draft lookup runs on host between device steps: it is O(history) python on
a few thousand ints, overlapped with nothing but ~µs of work, and keeps the
device graph static (verify shape = draft_len + 1 always).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.models.decoder import forward
from mnn_tpu.runtime import kvcache


class NgramDraft:
    """Suffix n-gram table over prompt + generated tokens (ngram.hpp)."""

    def __init__(self, ngram: int = 3, draft_len: int = 7, max_n: int = 4):
        self.ngram = ngram
        self.draft_len = draft_len
        self.history: List[int] = []
        self.index = {}  # tuple -> position after match
        self.max_n = max_n

    def extend(self, tokens: List[int]):
        for t in tokens:
            self.history.append(int(t))
            n = len(self.history)
            for k in range(2, self.max_n + 1):
                if n >= k:
                    key = tuple(self.history[n - k :])
                    # keep the first occurrence: the current suffix is always
                    # the latest, and would otherwise shadow every match
                    self.index.setdefault(key, n)  # position AFTER the ngram

    def propose(self) -> Optional[List[int]]:
        """Longest-ngram match wins; returns up to draft_len draft tokens."""
        n = len(self.history)
        for k in range(self.max_n, 1, -1):
            if n < k:
                continue
            key = tuple(self.history[n - k :])
            pos = self.index.get(key)
            if pos is not None and pos < n:
                draft = self.history[pos : pos + self.draft_len]
                if draft:
                    return draft
        return None


def verify_step(params, config, cache, tokens: List[int], interpret=None):
    """Forward [last_emitted + draft...] (T tokens), greedy targets per pos.

    Returns (targets [T] np.ndarray, cache_with_T_appended).
    """
    arr = jnp.asarray([tokens], jnp.int32)
    logits, cache = forward(
        params, config, arr, cache, all_logits=True, interpret=interpret
    )
    targets = np.asarray(jnp.argmax(logits[0], axis=-1), np.int64)
    return targets, cache


def lookahead_generate(
    llm,
    token_ids: List[int],
    max_new_tokens: int,
    *,
    ngram: int = 3,
    draft_len: int = 7,
):
    """Greedy lookahead decoding. Yields accepted tokens (lists per step).

    llm: mnn_tpu.runtime.llm.Llm (uses its params/config/cache).
    """
    from mnn_tpu.runtime import generate as gen
    from mnn_tpu.utils import native

    if native.available():
        draft_tab = native.NativeNgramIndex(max_n=4, draft_len=draft_len)
    else:
        draft_tab = NgramDraft(ngram=ngram, draft_len=draft_len)
    draft_tab.extend(token_ids)

    logits, cache = gen.run_prefill(
        llm.params, llm.config, llm.rt, jnp.asarray([token_ids], jnp.int32),
        llm.cache,
    )
    llm.cache = cache
    last = int(np.asarray(jnp.argmax(logits[0])))
    draft_tab.extend([last])
    produced = [last]
    yield [last]
    accepted_total = 0
    drafted_total = 0

    while len(produced) < max_new_tokens:
        draft = draft_tab.propose() or []
        budget = max_new_tokens - len(produced)
        draft = draft[: max(min(len(draft), budget), 0)]
        # pad to a fixed shape so the verify forward never recompiles
        pad = draft_len - len(draft)
        step_tokens = [last] + draft + [last] * pad
        targets, cache = verify_step(
            llm.params, llm.config, cache, step_tokens
        )
        # accept the longest prefix of draft matching the greedy targets
        n_accept = 0
        for i, d in enumerate(draft):
            if targets[i] == d:
                n_accept += 1
            else:
                break
        emitted = list(draft[:n_accept]) + [int(targets[n_accept])]
        drafted_total += len(draft)
        accepted_total += n_accept
        # cache now holds len(step_tokens) appended; keep only accepted+1
        extra = len(step_tokens) - (n_accept + 1)
        if extra > 0:
            cache = kvcache.rollback(cache, extra)
        produced.extend(emitted)
        draft_tab.extend(emitted)
        last = emitted[-1]
        # keep the engine's cache current even if the consumer stops early
        llm.cache = cache
        llm.spec_stats = {
            "drafted": drafted_total,
            "accepted": accepted_total,
            "accept_rate": accepted_total / drafted_total if drafted_total else 0.0,
        }
        yield emitted

    llm.cache = cache
    llm.spec_stats = {
        "drafted": drafted_total,
        "accepted": accepted_total,
        "accept_rate": accepted_total / drafted_total if drafted_total else 0.0,
    }
