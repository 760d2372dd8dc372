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


class DFlashDraft:
    """Block-diffusion drafter (the reference's fourth speculative mode,
    speculative_decoding/dflash.cpp): a small NON-CAUSAL draft net emits a
    whole `block_size`-token draft in ONE forward over
    [fc(target hiddens) | mask-token block] — no draft KV cache, no
    per-token chaining. Context rows live in a fixed-capacity buffer
    (static shapes under jit); verification is the standard lossless loop
    in draft_generate()."""

    kind = "dflash"

    def __init__(self, dparams, capacity: int = 512):
        self.dp = dparams
        self.draft_len = dparams.block_size
        self.capacity = capacity
        self.ctx = None            # [1, cap, H] f32
        self.n = 0                 # valid rows
        self.start_pos = 0         # rope position of ctx row 0

    def _push(self, rows):
        """Append fc-projected rows [1, m, H]; slide the window when full
        (the draft attends to the most recent `capacity` positions)."""
        m = rows.shape[1]
        if self.n + m > self.capacity:
            shift = self.n + m - self.capacity
            self.ctx = jnp.concatenate(
                [self.ctx[:, shift:], jnp.zeros_like(self.ctx[:, :shift])],
                axis=1)
            self.n -= shift
            self.start_pos += shift
        self.ctx = jax.lax.dynamic_update_slice(
            self.ctx, rows.astype(jnp.float32), (0, self.n, 0))
        self.n += m

    def start(self, params, config, prompt_ids: List[int], feats):
        from mnn_tpu.models.dflash import fc_forward

        self.params, self.config = params, config
        h = config.hidden_size
        self.ctx = jnp.zeros((1, self.capacity, h), jnp.float32)
        self.n = 0
        self.start_pos = 0
        rows = fc_forward(self.dp, feats)
        if rows.shape[1] > self.capacity:
            self.start_pos = rows.shape[1] - self.capacity
            rows = rows[:, -self.capacity:]
        self._push(rows)

    def propose(self, last_token: int, last_feat) -> List[int]:
        import numpy as np

        from mnn_tpu.models.dflash import dflash_block_logits

        logits = dflash_block_logits(
            self.dp, self.params, self.config, self.ctx,
            jnp.asarray(self.n, jnp.int32),
            jnp.asarray(self.start_pos, jnp.int32))
        return [int(t) for t in np.asarray(jnp.argmax(logits[0], axis=-1))]

    def commit(self, prev_token: int, prev_feat, emitted: List[int], vfeats,
               n_accept: int):
        # context rows track PRODUCED positions 1:1 (start() pushed every
        # prompt position, including prev_feat's); the verify step keeps
        # n_accept+1 new positions, so push exactly their features
        from mnn_tpu.models.dflash import fc_forward

        self._push(fc_forward(self.dp, vfeats[:, :n_accept + 1]))

    def rollback(self, n: int):
        self.n = max(0, self.n - n)


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


@functools.partial(jax.jit, static_argnames=("config",))
def _tree_verify_fwd(params, config, arr, depths, tmask, cache):
    """Target forward over a token tree (depth-positions + ancestor mask).

    Returns (greedy targets [B,T], features [B,T,H], cache with the T tree
    rows appended at the tail — compact with kvcache.compact_tail after
    retrieval)."""
    hidden, cache = forward(params, config, arr, cache, return_hidden=True,
                            tree=(depths, tmask))
    feats = rms_norm(hidden, params.final_norm, config.rms_norm_eps)
    logits = head_logits(params, feats)
    return jnp.argmax(logits, axis=-1), feats, cache


class TreeEagleDraft(EagleDraft):
    """Static K x depth token-TREE drafter: K sibling chains off the top-K
    first-draft candidates, each continued greedily to `depth`.

    Reference parity: EagleGeneration's draft tree with retrieve/accept
    (/root/reference/transformers/llm/engine/src/speculative_decoding/
    tokentree.hpp:24, eagle.cpp). TPU re-design: the tree SHAPE is static
    (K chains x depth nodes, one fixed verify shape -> one compile), the
    mask/positions are data — where the reference builds a dynamic tree
    per step. The win over chain mode is first-token uncertainty: when the
    draft's argmax misses, one of the K-1 siblings often hits, converting
    a 0-accept round into >=1."""

    kind = "eagle-tree"

    def __init__(self, eparams, draft_len: int = 4, capacity: int = 2048,
                 fanout: int = 3):
        super().__init__(eparams, draft_len=draft_len, capacity=capacity)
        self.fanout = fanout

    @property
    def n_nodes(self) -> int:
        return 1 + self.fanout * self.draft_len

    def tree_layout(self):
        """(depths [N] i32, mask [N, N] bool) for root + K chains."""
        k, d = self.fanout, self.draft_len
        n = self.n_nodes
        depths = np.zeros((n,), np.int32)
        mask = np.zeros((n, n), bool)
        mask[0, 0] = True
        for c in range(k):
            for j in range(d):
                i = 1 + c * d + j
                depths[i] = 1 + j
                mask[i, 0] = True                 # root
                for a in range(j + 1):            # own chain ancestors + self
                    mask[i, 1 + c * d + a] = True
        return jnp.asarray(depths), jnp.asarray(mask)

    def propose_tree(self, last_token: int, last_feat) -> np.ndarray:
        """[K, depth] candidate chains (row c starts at the c-th top-K
        first-step draft candidate). self.cache untouched (speculative
        appends land on local copies, like chain propose)."""
        from mnn_tpu.models.eagle import eagle_forward, eagle_next_token
        from mnn_tpu.models.layers import rms_norm as _rms  # noqa: F401
        from mnn_tpu.models.decoder import head_logits as _hl

        tok = jnp.asarray([[last_token]], jnp.int32)
        feat = last_feat[:, None]
        h, cache1 = eagle_forward(
            self.ep, self.params, self.config, tok, feat, self.cache)
        logits = _hl(self.params, h[:, -1])
        _, idx = jax.lax.top_k(logits[0], self.fanout)
        idx = np.asarray(idx)
        chains = np.zeros((self.fanout, self.draft_len), np.int64)
        for c in range(self.fanout):
            chains[c, 0] = int(idx[c])
            tok_c = jnp.asarray([[int(idx[c])]], jnp.int32)
            feat_c = h[:, -1:]
            cache_c = cache1
            for j in range(1, self.draft_len):
                nxt, hh, cache_c = eagle_next_token(
                    self.ep, self.params, self.config, tok_c, feat_c, cache_c)
                chains[c, j] = int(nxt[0])
                tok_c = nxt[:, None].astype(jnp.int32)
                feat_c = hh[:, -1:]
        return chains


def tree_draft_generate(llm, token_ids: List[int], max_new_tokens: int, *,
                        drafter: TreeEagleDraft):
    """Greedy token-TREE speculative decoding; lossless vs plain AR decode.

    Per round: one K x depth tree proposal, ONE tree-masked target forward
    over all 1 + K*depth nodes, retrieve the accepted root-to-leaf path,
    compact its KV rows in place (kvcache.compact_tail) and commit the
    path to the drafter. Yields accepted-token lists per round.
    """
    from mnn_tpu.runtime import kvcache as kvc

    d = drafter.draft_len
    kf = drafter.fanout
    depths, tmask = drafter.tree_layout()

    logits, feats, cache = prefill_with_features(
        llm.params, llm.config, llm.rt,
        jnp.asarray([token_ids], jnp.int32), llm.cache,
    )
    llm.cache = cache
    drafter.start(llm.params, llm.config, token_ids, feats)

    last = int(np.asarray(jnp.argmax(logits[0])))
    prev_feat = feats[:, -1]
    produced = [last]
    yield [last]
    accepted_total = drafted_total = rounds = 0

    while len(produced) < max_new_tokens:
        chains = drafter.propose_tree(last, prev_feat)     # [K, d]
        nodes = [last] + chains.reshape(-1).tolist()       # [1 + K*d]
        start = int(cache.length[0])
        targets, vfeats, cache = _tree_verify_fwd(
            llm.params, llm.config, jnp.asarray([nodes], jnp.int32),
            depths, tmask, cache,
        )
        tg = np.asarray(targets[0])
        # retrieve: walk the accepted chain
        best_c, n_accept = 0, 0
        t0 = int(tg[0])
        for c in range(kf):
            if chains[c, 0] == t0:
                best_c = c
                n_accept = 1
                while n_accept < d:
                    node_i = 1 + c * d + (n_accept - 1)
                    if chains[c, n_accept] == int(tg[node_i]):
                        n_accept += 1
                    else:
                        break
                break
        path_nodes = [0] + [1 + best_c * d + j for j in range(d)]
        tail_i = path_nodes[n_accept]
        emitted = chains[best_c, :n_accept].tolist() + [int(tg[tail_i])]
        drafted_total += d
        accepted_total += n_accept
        rounds += 1

        # compact the tree tail: keep root + accepted path rows
        sel = np.asarray(path_nodes[: d + 1], np.int32)
        cache = kvc.compact_tail(cache, start, jnp.asarray(sel),
                                 1 + n_accept)
        # features along the accepted path, linearized for the drafter:
        # index 0 = root (same convention as chain-mode _verify_fwd)
        vf_lin = vfeats[:, jnp.asarray(path_nodes, jnp.int32)]
        drafter.commit(last, prev_feat, emitted, vf_lin, n_accept)
        budget = max_new_tokens - len(produced)
        if len(emitted) > budget:
            over = len(emitted) - budget
            emitted = emitted[:budget]
            cache = kvc.rollback(cache, over)
            drafter.rollback(over)
        prev_feat = vf_lin[:, n_accept]
        produced.extend(emitted)
        last = emitted[-1]
        llm.cache = cache
        llm.spec_stats = {
            "drafted": drafted_total,
            "accepted": accepted_total,
            "accept_rate": accepted_total / drafted_total
            if drafted_total else 0.0,
            "tokens_per_round": len(produced) / rounds if rounds else 0.0,
        }
        yield emitted

    llm.cache = cache


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
