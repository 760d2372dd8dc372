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

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.models.decoder import forward, head_logits
from mnn_tpu.models.layers import rms_norm
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
        # the verify bonus token can overshoot the budget by one: trim the
        # emission and its cache entry so exactly max_new_tokens come out
        budget_now = max_new_tokens - len(produced)
        if len(emitted) > budget_now:
            trim = len(emitted) - budget_now
            emitted = emitted[:budget_now]
            cache = kvcache.rollback(cache, trim)
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

# ---------------------------------------------------------------------------
# Draft-MODEL speculative decoding (EAGLE / MTP heads)
#
# Reference: MtpGeneration / EagleGeneration
# (/root/reference/transformers/llm/engine/src/speculative_decoding/
# generate.hpp:29-105, tokentree.hpp). TPU re-design: fixed-length CHAIN
# drafts and a fixed-shape verify forward (see mnn_tpu/models/eagle.py
# docstring for why trees buy little here), greedy-lossless acceptance.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def _verify_fwd(params, config, arr, cache):
    """Target forward returning (greedy targets [B,T], features [B,T,H], cache).

    `features` are the post-final-norm hidden states — what EAGLE consumes
    as the previous-position feature input."""
    hidden, cache = forward(params, config, arr, cache, return_hidden=True)
    feats = rms_norm(hidden, params.final_norm, config.rms_norm_eps)
    logits = head_logits(params, feats)
    return jnp.argmax(logits, axis=-1), feats, cache


@functools.partial(jax.jit, static_argnames=("config", "valid"))
def _prefill_chunk_feats(params, config, tokens, cache, valid):
    """prefill_chunk variant that also returns the chunk's features."""
    import dataclasses as _dc

    targets, feats, cache = _verify_fwd(params, config, tokens, cache)
    pad = tokens.shape[1] - valid
    if pad:
        cache = _dc.replace(cache, length=cache.length - pad)
    return feats, cache


def prefill_with_features(params, config, rt, tokens, cache):
    """Chunked/bucketed prefill that keeps every position's feature.

    Returns (last_logits [B,V], features [B,T,H] jax, cache)."""
    from mnn_tpu.runtime.generate import pad_tokens, prefill_buckets

    t = tokens.shape[1]
    feats = []
    off = 0
    for bucket in prefill_buckets(t, rt.prefill_chunk):
        valid = min(bucket, t - off)
        chunk = pad_tokens(tokens[:, off : off + valid], bucket)
        f, cache = _prefill_chunk_feats(params, config, chunk, cache, valid)
        feats.append(f[:, :valid])
        off += valid
    features = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=1)
    logits = head_logits(params, features[:, -1])
    return logits, features, cache


class EagleDraft:
    """Chain-mode EAGLE drafter: 1-layer draft net with its own KV cache.

    Cache invariant: position j holds the pair (token s_{j+1}, feature f_j),
    features always the TARGET's (speculative appends from propose() are
    discarded; commit() re-appends verified pairs)."""

    kind = "eagle"

    def __init__(self, eparams, draft_len: int = 4, capacity: int = 2048):
        self.ep = eparams
        self.draft_len = draft_len
        self.capacity = capacity
        self.cache = None

    def start(self, params, config, prompt_ids: List[int], feats):
        """feats: [1, T, H] target features for the prompt."""
        from mnn_tpu.models.eagle import create_draft_cache, eagle_forward

        self.params, self.config = params, config
        self.cache = create_draft_cache(config, self.capacity)
        n = len(prompt_ids)
        if n < 2:
            return
        # pairs (s_1..s_{n-1}, f_0..f_{n-2}), padded to a multiple of 32 so
        # prompt-length compiles stay bounded (pad rolled back afterwards)
        t = n - 1
        bucket = max(32, -(-t // 32) * 32)
        toks = jnp.zeros((1, bucket), jnp.int32)
        toks = toks.at[0, :t].set(jnp.asarray(prompt_ids[1:], jnp.int32))
        f = jnp.zeros((1, bucket, feats.shape[-1]), feats.dtype)
        f = f.at[:, :t].set(feats[:, : n - 1])
        _, cache = eagle_forward(
            self.ep, params, self.config, toks, f, self.cache
        )
        self.cache = kvcache.rollback(cache, bucket - t)

    def propose(self, last_token: int, last_feat) -> List[int]:
        """Draft `draft_len` tokens by chaining the draft net (speculative
        appends land on a local copy; self.cache is untouched)."""
        from mnn_tpu.models.eagle import eagle_next_token

        cache = self.cache
        tok = jnp.asarray([[last_token]], jnp.int32)
        feat = last_feat[:, None]  # [1, 1, H]
        out = []
        for _ in range(self.draft_len):
            nxt, h, cache = eagle_next_token(
                self.ep, self.params, self.config, tok, feat, cache
            )
            out.append(int(nxt[0]))
            tok = nxt[:, None].astype(jnp.int32)
            feat = h[:, -1:]
        return out

    def commit(self, prev_token: int, prev_feat, emitted: List[int], vfeats,
               n_accept: int):
        """Append the verified pairs: tokens [prev]+emitted[:-1] with features
        [prev_feat]+vfeats[:, :n_accept]; padded to draft_len+1 (static)."""
        from mnn_tpu.models.eagle import eagle_forward

        width = self.draft_len + 1
        m = n_accept + 1  # number of true pairs
        toks = np.zeros((1, width), np.int32)
        toks[0, 0] = prev_token
        toks[0, 1:m] = emitted[: m - 1]
        f = jnp.concatenate([prev_feat[:, None], vfeats[:, : width - 1]], axis=1)
        _, cache = eagle_forward(
            self.ep, self.params, self.config, jnp.asarray(toks), f, self.cache
        )
        self.cache = kvcache.rollback(cache, width - m)

    def rollback(self, n: int):
        if self.cache is not None:
            self.cache = kvcache.rollback(self.cache, n)


class MtpDraft:
    """MTP/Medusa-style drafter: K residual heads off the last feature.

    Stateless (no draft KV), so commit/start are no-ops."""

    kind = "mtp"

    def __init__(self, heads, draft_len: Optional[int] = None):
        self.heads = heads
        self.draft_len = min(draft_len or heads.num_heads, heads.num_heads)

    def start(self, params, config, prompt_ids, feats):
        self.params, self.config = params, config

    def propose(self, last_token: int, last_feat) -> List[int]:
        from mnn_tpu.models.eagle import mtp_propose

        toks = mtp_propose(self.heads, self.params, last_feat)
        return np.asarray(toks[0, : self.draft_len]).tolist()

    def commit(self, *a, **kw):
        pass

    def rollback(self, n: int):
        pass


def draft_generate(llm, token_ids: List[int], max_new_tokens: int, *, drafter):
    """Greedy draft-model speculative decoding; lossless vs plain AR decode.

    Yields lists of accepted tokens per verify step (like lookahead_generate).
    """
    k = drafter.draft_len

    logits, feats, cache = prefill_with_features(
        llm.params, llm.config, llm.rt,
        jnp.asarray([token_ids], jnp.int32), llm.cache,
    )
    llm.cache = cache
    drafter.start(llm.params, llm.config, token_ids, feats)

    last = int(np.asarray(jnp.argmax(logits[0])))
    prev_feat = feats[:, -1]  # [1, H] feature of the last prompt position
    produced = [last]
    yield [last]
    accepted_total = drafted_total = 0

    while len(produced) < max_new_tokens:
        draft = drafter.propose(last, prev_feat)
        step_tokens = [last] + draft  # fixed T = k+1
        targets, vfeats, cache = _verify_fwd(
            llm.params, llm.config,
            jnp.asarray([step_tokens], jnp.int32), cache,
        )
        tg = np.asarray(targets[0])
        n_accept = 0
        for i, d in enumerate(draft):
            if tg[i] == d:
                n_accept += 1
            else:
                break
        emitted = list(draft[:n_accept]) + [int(tg[n_accept])]
        drafted_total += len(draft)
        accepted_total += n_accept
        # target cache holds k+1 appended; keep accepted+1
        extra = len(step_tokens) - (n_accept + 1)
        if extra > 0:
            cache = kvcache.rollback(cache, extra)
        drafter.commit(last, prev_feat, emitted, vfeats, n_accept)
        budget = max_new_tokens - len(produced)
        if len(emitted) > budget:
            over = len(emitted) - budget
            emitted = emitted[:budget]
            cache = kvcache.rollback(cache, over)
            drafter.rollback(over)
        prev_feat = vfeats[:, n_accept]
        produced.extend(emitted)
        last = emitted[-1]
        llm.cache = cache
        llm.spec_stats = {
            "drafted": drafted_total,
            "accepted": accepted_total,
            "accept_rate": accepted_total / drafted_total if drafted_total else 0.0,
        }
        yield emitted

    llm.cache = cache
