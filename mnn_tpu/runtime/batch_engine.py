"""Continuous batching engine: slot-based scheduler over one shared KV cache.

This component is NEW DESIGN — the reference is single-stream batch-1
(SURVEY.md §2.8 note: "no continuous batching / paged attention in MNN";
concurrency there = clone modules). TPU-shaped decisions:

* fixed SLOTS (batch rows of one [L, B, Hkv, S, D] cache) instead of paged
  blocks: every jitted shape is static, so admission/eviction never
  recompiles — the TPU analog of vLLM's paged KV is "slot = page of size
  max_seq_len", trading HBM slack for zero-recompile scheduling;
* decode runs the whole batch every step; each slot reads/writes at its own
  context length (per-slot scatter append + per-slot kv_len masking in the
  decode kernel). Idle slots compute garbage that is never read — wasted
  FLOPs are cheaper than a shape change;
* prefill admits one request at a time into a free slot via
  `prefill_into_slot` (dynamic-slice the slot's cache row, run chunked
  prefill, write back) — decode-priority vs prefill-priority is a host-side
  policy knob (`prefill_priority`);
* per-request state machine mirrors the reference's LlmStatus
  (llm.hpp:95-103): WAITING -> PREFILL -> DECODE -> DONE/CANCELLED.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import queue
import threading
import time
from enum import Enum
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.models.config import ModelConfig, RuntimeConfig
from mnn_tpu.models.decoder import Params, forward
from mnn_tpu.runtime import kvcache, sampler
from mnn_tpu.runtime.kvcache import KVCache
from mnn_tpu.runtime.sampler import SamplerState


class Status(Enum):
    WAITING = "waiting"
    PREFILL = "prefill"
    DECODE = "decode"
    DONE = "done"
    CANCELLED = "cancelled"
    TIMEOUT = "timeout"   # deadline expired (reference llm.hpp:95-103)


@dataclasses.dataclass
class Request:
    rid: int
    token_ids: List[int]
    max_new_tokens: int
    status: Status = Status.WAITING
    slot: int = -1
    out: "queue.SimpleQueue[Optional[int]]" = dataclasses.field(
        default_factory=queue.SimpleQueue
    )
    generated: List[int] = dataclasses.field(default_factory=list)
    submitted_at: float = dataclasses.field(default_factory=time.perf_counter)
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None
    # absolute wall-clock deadline (perf_counter timebase); None = unlimited
    deadline: Optional[float] = None
    # per-request (token_id, bias) pairs (OpenAI logit_bias semantics)
    logit_bias: Optional[tuple] = None
    # OpenAI logprobs: -1 = off; 0 = chosen-token logprob only; k > 0 =
    # chosen + top-k alternatives. When on, out-queue items are
    # (token, logprob, [(alt_id, alt_logprob), ...]) tuples instead of ints.
    logprobs: int = -1


@functools.partial(
    jax.jit, static_argnames=("config", "need_logits"), donate_argnums=(2,)
)
def _prefill_into_slot(
    params: Params,
    config: ModelConfig,
    cache: KVCache,
    tokens: jax.Array,   # [1, T] (right-padded to the bucket size)
    slot: jax.Array,     # [] int32
    valid: jax.Array,    # [] int32 real token count in this chunk
    need_logits: bool,
):
    """Run one prefill chunk inside slot `slot` of the batched cache.

    Returns (logits-of-last-valid-position [1, V] (zeros when not needed),
    cache with `valid` positions appended to the slot).
    """
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)
    sub = KVCache(
        k=sl(cache.k), v=sl(cache.v),
        k_scale=None if cache.k_scale is None else sl(cache.k_scale),
        v_scale=None if cache.v_scale is None else sl(cache.v_scale),
        length=jax.lax.dynamic_slice_in_dim(cache.length, slot, 1),
        bits=cache.bits, codebook=cache.codebook,
    )
    logits, sub = forward(params, config, tokens, sub, all_logits=need_logits)
    if need_logits:
        logits = jax.lax.dynamic_slice_in_dim(logits, valid - 1, 1, axis=1)[:, 0]
    else:
        logits = jnp.zeros((1, logits.shape[-1]), logits.dtype)
    # roll back the padded tail
    sub = dataclasses.replace(sub, length=sub.length - (tokens.shape[1] - valid))
    up = lambda a, s: jax.lax.dynamic_update_slice_in_dim(a, s, slot, axis=1)
    new = KVCache(
        k=up(cache.k, sub.k), v=up(cache.v, sub.v),
        k_scale=None if cache.k_scale is None else up(cache.k_scale, sub.k_scale),
        v_scale=None if cache.v_scale is None else up(cache.v_scale, sub.v_scale),
        length=jax.lax.dynamic_update_slice(cache.length, sub.length, (slot,)),
        bits=cache.bits, codebook=cache.codebook,
    )
    return logits, new


@functools.partial(jax.jit, donate_argnums=(0,))
def _reset_slot(cache: KVCache, slot: jax.Array) -> KVCache:
    return dataclasses.replace(
        cache,
        length=cache.length.at[slot].set(0),
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "steps", "sampler_name", "temperature",
                     "top_k", "top_p", "min_p", "penalty", "n_top_lp"),
    donate_argnums=(2,),
)
def _decode_block(
    params: Params,
    config: ModelConfig,
    cache: KVCache,
    last_tokens: jax.Array,   # [B] the newest token per slot (not yet forwarded)
    state: SamplerState,
    key: jax.Array,
    *,
    steps: int,
    sampler_name: str,
    temperature: float,
    top_k: int,
    top_p: float,
    min_p: float,
    penalty: float,
    logit_bias=None,   # [V] additive bias (traced) or None
    n_top_lp: int = -1,  # -1 off; 0 chosen logprob; k>0 chosen + top-k
):
    """Forward+sample `steps` times for the whole batch in one dispatch.

    Unlike generate.decode_steps (which samples first from given logits),
    this forwards the provided last_tokens first — every slot always has a
    well-defined newest token (from prefill or the previous block).
    Returns (tokens [B, steps], cache, state, key[, lp [B, steps],
    top_ids/top_lps [B, steps, k]]) — logprobs are of the raw model
    distribution (log-softmax of the unbiased logits), matching OpenAI's
    reported values rather than the sampler's modified distribution.
    """

    def body(carry, _):
        cache, tok, st, key = carry
        logits, cache = forward(params, config, tok[:, None], cache)
        key, sub = jax.random.split(key)
        nxt, st = sampler.sample(
            logits, sub, st, sampler=sampler_name, temperature=temperature,
            top_k=top_k, top_p=top_p, min_p=min_p, penalty=penalty,
            logit_bias=logit_bias,
        )
        if n_top_lp < 0:
            return (cache, nxt, st, key), nxt
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lp = jnp.take_along_axis(lsm, nxt[:, None], axis=-1)[:, 0]
        kk = max(n_top_lp, 1)
        tvals, tids = jax.lax.top_k(lsm, kk)
        return (cache, nxt, st, key), (nxt, lp, tids, tvals)

    (cache, _, state, key), out = jax.lax.scan(
        body, (cache, last_tokens, state, key), None, length=steps
    )
    if n_top_lp < 0:
        return jnp.transpose(out), cache, state, key
    toks, lp, tids, tvals = out
    return (jnp.transpose(toks), cache, state, key, jnp.transpose(lp),
            jnp.transpose(tids, (1, 0, 2)), jnp.transpose(tvals, (1, 0, 2)))


class BatchEngine:
    """Multi-request serving engine over one model instance."""

    def __init__(
        self,
        config: ModelConfig,
        params: Params,
        rt: RuntimeConfig,
        tokenizer=None,
        eos_ids=frozenset(),
        mesh=None,
        dp_axis: str = "dp",
    ):
        """mesh + dp_axis: shard the BATCH dimension of the shared KV cache
        and sampler state across data-parallel devices/hosts — continuous
        batching placed across a pod slice (BASELINE config 5's cross-host
        serving; the scheduler stays host-side, decode runs GSPMD-sharded).
        rt.max_batch must divide evenly across the dp axis."""
        self.config = config
        self.params = params
        self.rt = rt
        self.tokenizer = tokenizer
        self.eos_ids = set(eos_ids)
        b = rt.max_batch
        self.cache = kvcache.create(
            config.num_layers, b, config.num_kv_heads, rt.max_seq_len,
            config.head_dim, quantized=rt.kv_quant, kv_bits=rt.kv_bits,
        )
        self.state = sampler.make_state(b)
        self.mesh = mesh
        self.dp_axis = dp_axis
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ndp = mesh.shape[dp_axis]
            if b % ndp:
                raise ValueError(f"max_batch {b} not divisible by dp={ndp}")

            self.cache = self._shard_batch(self.cache)
            self.state = dataclasses.replace(
                self.state, recent=self._shard(self.state.recent, 0))
            # replicate weights across the dp axis explicitly
            rep = NamedSharding(mesh, P())
            self.params = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, rep) if hasattr(a, "shape")
                else a, params)
        self.key = jax.random.PRNGKey(rt.seed)
        self.last_tokens = jnp.zeros((b,), jnp.int32)
        # dense [V] additive logit bias from rt.logit_bias (id, bias) pairs
        if rt.logit_bias:
            lb = np.zeros((config.vocab_size,), np.float32)
            for tid, bias in rt.logit_bias:
                if 0 <= int(tid) < lb.shape[0]:
                    lb[int(tid)] = float(bias)
            self._logit_bias = jnp.asarray(lb)
        else:
            self._logit_bias = None
        # lazily-materialized [B, V] per-slot bias (global + per-request)
        self._bias_rows = None
        # cross-host batch placement: this process only admits requests into
        # the batch rows whose dp shards live on its own devices, so
        # prefill/decode never pull KV over DCN (multihost.local_batch_rows;
        # single-process/meshless: every row is local)
        if mesh is not None and jax.process_count() > 1:
            from mnn_tpu.parallel.multihost import local_batch_rows

            self.local_rows = set(
                int(r) for r in local_batch_rows(mesh, b, dp_axis))
        else:
            self.local_rows = set(range(b))
        self.slots: List[Optional[Request]] = [None] * b
        self.waiting: "queue.SimpleQueue[Request]" = queue.SimpleQueue()
        self.requests: Dict[int, Request] = {}
        self._rid = itertools.count()
        self._lock = threading.Lock()
        self.prefill_priority = True
        self.steps_per_block = max(rt.decode_block, 1)

    def _shard(self, x, batch_axis: int):
        """Place `x` with its batch axis split over the dp mesh axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = [None] * x.ndim
        spec[batch_axis] = self.dp_axis
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def _shard_batch(self, cache: KVCache) -> KVCache:
        return dataclasses.replace(
            cache,
            k=self._shard(cache.k, 1), v=self._shard(cache.v, 1),
            k_scale=(self._shard(cache.k_scale, 1)
                     if cache.k_scale is not None else None),
            v_scale=(self._shard(cache.v_scale, 1)
                     if cache.v_scale is not None else None),
            length=self._shard(cache.length, 0),
        )

    # -- submission --------------------------------------------------------

    def submit(self, token_ids: List[int], max_new_tokens: Optional[int] = None,
               timeout_s: Optional[float] = None,
               logit_bias=None, logprobs: int = -1) -> Request:
        """timeout_s (default rt.timeout_s, 0 = unlimited): wall-clock
        deadline; expired requests finish with Status.TIMEOUT between
        decode blocks (the reference's decode-loop timeout check,
        generate.cpp:52-56). logprobs: -1 off, 0 chosen-token logprob,
        k>0 chosen + top-k alternatives per token (out-queue items become
        (token, logprob, [(alt, lp)...]) tuples)."""
        t = timeout_s if timeout_s is not None else self.rt.timeout_s
        req = Request(
            rid=next(self._rid),
            token_ids=list(token_ids) or [0],
            max_new_tokens=max_new_tokens or self.rt.max_new_tokens,
            deadline=(time.perf_counter() + t) if t else None,
            logit_bias=tuple(logit_bias) if logit_bias else None,
            logprobs=max(-1, min(int(logprobs), 20)),
        )
        with self._lock:
            self.requests[req.rid] = req
        self.waiting.put(req)
        return req

    def cancel(self, rid: int):
        req = self.requests.get(rid)
        if req and req.status not in (Status.DONE, Status.CANCELLED):
            req.status = Status.CANCELLED
            req.out.put(None)

    # -- scheduling --------------------------------------------------------

    def _set_bias_row(self, slot: int, pairs: Optional[tuple]):
        """Write slot `slot`'s [V] bias row = global rt bias + request
        pairs (None = reset to global). Materializes the [B, V] rows on
        first use — meshless/global-only serving never pays for it."""
        v = self.config.vocab_size
        if self._bias_rows is None:
            base = (np.asarray(self._logit_bias) if self._logit_bias
                    is not None else np.zeros((v,), np.float32))
            self._bias_rows = jnp.broadcast_to(
                jnp.asarray(base), (self.rt.max_batch, v)).copy()
        row = (np.asarray(self._logit_bias, np.float32).copy()
               if self._logit_bias is not None
               else np.zeros((v,), np.float32))
        for tid, bias in (pairs or ()):
            if 0 <= int(tid) < v:
                row[int(tid)] += float(bias)
        self._bias_rows = self._bias_rows.at[slot].set(jnp.asarray(row))

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self.slots)
                if r is None and i in self.local_rows]

    def _admit_one(self) -> bool:
        free = self._free_slots()
        if not free:
            return False
        try:
            req = self.waiting.get_nowait()
        except queue.Empty:
            return False
        if req.status == Status.CANCELLED:
            return True
        if req.deadline is not None and time.perf_counter() > req.deadline:
            # expired while queued: do not pay prefill + a decode block
            # just to time it out on the next step
            req.status = Status.TIMEOUT
            req.finished_at = time.perf_counter()
            req.out.put(None)
            return True
        slot = free[0]
        req.slot = slot
        req.status = Status.PREFILL
        self.slots[slot] = req

        self.cache = _reset_slot(self.cache, jnp.asarray(slot, jnp.int32))
        self.state = dataclasses.replace(
            self.state, recent=self.state.recent.at[slot].set(-1)
        )
        if req.logit_bias or self._bias_rows is not None:
            self._set_bias_row(slot, req.logit_bias)
        # truncate over-long prompts to leave decode room
        limit = self.rt.max_seq_len - req.max_new_tokens - 1
        ids = req.token_ids[-max(limit, 1):]
        from mnn_tpu.runtime.generate import pad_tokens, prefill_buckets

        logits = None
        buckets = prefill_buckets(len(ids), self.rt.prefill_chunk)
        off = 0
        for bi, bucket in enumerate(buckets):
            valid = min(bucket, len(ids) - off)
            chunk = jnp.asarray([ids[off : off + valid]], jnp.int32)
            chunk = pad_tokens(chunk, bucket)
            logits, self.cache = _prefill_into_slot(
                self.params, self.config, self.cache, chunk,
                jnp.asarray(slot, jnp.int32), jnp.asarray(valid, jnp.int32),
                need_logits=(bi == len(buckets) - 1),
            )
            off += valid
        if req.status == Status.CANCELLED:  # cancelled mid-prefill
            self._free_slot(req)
            return True
        # first token: sampled through the configured chain on this slot's
        # logits row (Llm.stream parity; was greedy argmax). The token is
        # recorded at ring position pos-1 so the repetition penalty sees it
        # without advancing the batch-shared ring pointer.
        self.key, sub = jax.random.split(self.key)
        row_state = SamplerState(recent=self.state.recent[slot: slot + 1],
                                 pos=self.state.pos)
        if self._bias_rows is not None:
            row_bias = self._bias_rows[slot]
        else:
            row_bias = self._logit_bias
        tok1, row2 = sampler.sample(
            logits, sub, row_state, sampler=self.rt.sampler,
            temperature=self.rt.temperature, top_k=self.rt.top_k,
            top_p=self.rt.top_p, min_p=self.rt.min_p, penalty=self.rt.penalty,
            logit_bias=row_bias)
        first = int(np.asarray(tok1[0]))
        w = self.state.recent.shape[1]
        prev_pos = (int(np.asarray(self.state.pos)) - 1) % w
        self.state = dataclasses.replace(
            self.state,
            recent=self.state.recent.at[slot, prev_pos].set(first))
        self.last_tokens = self.last_tokens.at[slot].set(first)
        req.generated.append(first)
        req.first_token_at = time.perf_counter()
        if req.logprobs >= 0:
            # host-side log-softmax for the single prefill-sampled token
            row = np.asarray(logits[0], np.float32)
            mx = float(row.max())
            lse = mx + float(np.log(np.exp(row - mx).sum()))
            tops = []
            if req.logprobs > 0:
                top_idx = np.argpartition(-row, req.logprobs)[:req.logprobs]
                top_idx = top_idx[np.argsort(-row[top_idx])]
                tops = [(int(i), float(row[i] - lse)) for i in top_idx]
            req.out.put((first, float(row[first] - lse), tops))
        else:
            req.out.put(first)
        req.status = Status.DECODE
        self._maybe_finish(req, first, ctx=len(ids))
        return True

    def _free_slot(self, req: Request):
        if req.slot >= 0:
            if self._bias_rows is not None and req.logit_bias:
                self._set_bias_row(req.slot, None)
            self.slots[req.slot] = None
            req.slot = -1

    def _maybe_finish(self, req: Request, tok: int, ctx: int):
        if req.status == Status.CANCELLED:
            self._free_slot(req)
            return
        if req.status == Status.DONE:
            return
        if (
            tok in self.eos_ids
            or len(req.generated) >= req.max_new_tokens
            or ctx >= self.rt.max_seq_len - 1
        ):
            req.status = Status.DONE
            req.finished_at = time.perf_counter()
            req.out.put(None)
            self._free_slot(req)

    def step(self) -> bool:
        """One scheduling iteration. Returns True if any work was done.

        prefill_priority decides WHEN waiting requests are admitted (before
        or after the decode block), never WHETHER — decode-priority mode
        still admits once the in-flight block has been stepped."""
        with self._lock:
            return self._step_locked()

    def _step_locked(self) -> bool:
        admitted = False
        # expire deadlines (checked once per block, like the reference's
        # per-iteration timeout in the decode loop)
        now = time.perf_counter()
        for req in list(self.slots):
            if (req is not None and req.deadline is not None
                    and now > req.deadline
                    and req.status in (Status.PREFILL, Status.DECODE)):
                req.status = Status.TIMEOUT
                req.finished_at = now
                req.out.put(None)
        # reap cancellations/timeouts so their slots free up
        for req in list(self.slots):
            if req is not None and req.status in (Status.CANCELLED,
                                                  Status.TIMEOUT):
                self._free_slot(req)
        if self.prefill_priority:
            while self._admit_one():
                admitted = True
        active = [r for r in self.slots if r is not None]
        if not active:
            if not self.prefill_priority:
                while self._admit_one():
                    admitted = True
            return admitted

        steps = self.steps_per_block
        base_lens = {r.rid: int(n) for r, n in
                     zip(self.slots, np.asarray(self.cache.length))
                     if r is not None}
        # logprobs are computed for the whole block when ANY active
        # request asked (one extra compiled variant per top-k width)
        n_top_lp = max((r.logprobs for r in active), default=-1)
        outs = _decode_block(
            self.params, self.config, self.cache, self.last_tokens,
            self.state, self.key,
            steps=steps, sampler_name=self.rt.sampler,
            temperature=self.rt.temperature, top_k=self.rt.top_k,
            top_p=self.rt.top_p, min_p=self.rt.min_p, penalty=self.rt.penalty,
            logit_bias=(self._bias_rows if self._bias_rows is not None
                        else self._logit_bias),
            n_top_lp=n_top_lp,
        )
        toks, self.cache, self.state, self.key = outs[:4]
        lp_np = tid_np = tval_np = None
        if n_top_lp >= 0:
            lp_np = np.asarray(outs[4])
            tid_np = np.asarray(outs[5])
            tval_np = np.asarray(outs[6])
        toks_np = np.asarray(toks)
        self.last_tokens = toks[:, -1]
        for req in list(self.slots):
            if req is None:
                continue
            for j in range(steps):
                tok = int(toks_np[req.slot, j])
                req.generated.append(tok)
                if req.logprobs >= 0 and lp_np is not None:
                    tops = [(int(tid_np[req.slot, j, t]),
                             float(tval_np[req.slot, j, t]))
                            for t in range(req.logprobs)]
                    req.out.put((tok, float(lp_np[req.slot, j]), tops))
                else:
                    req.out.put(tok)
                # context length derived host-side: one device read per
                # block (base_lens), not one per token
                self._maybe_finish(req, tok,
                                   ctx=base_lens[req.rid] + j + 1)
                if req.status != Status.DECODE:
                    break
        if not self.prefill_priority:  # decode-priority: admit after
            while self._admit_one():
                pass
        return True

    def run_until_idle(self):
        while True:
            busy = self.step()
            if not busy and self.waiting.empty() and not any(self.slots):
                break

    def run_forever(self, stop_event: threading.Event, idle_sleep: float = 0.002):
        """Background scheduler loop (server mode)."""
        while not stop_event.is_set():
            if not self.step():
                time.sleep(idle_sleep)

    # -- serving checkpoint / resume ----------------------------------------
    # SURVEY.md §5.3/§5.4 TPU equivalents: "restartable serving loop from
    # prefix/KV checkpoints". The whole engine state — KV cache, sampler
    # ring, RNG, per-slot request bookkeeping, waiting queue — round-trips
    # through one .npz, so a killed server resumes mid-decode without
    # re-prefilling any in-flight request.

    def snapshot(self, path: str) -> None:
        import json as _json

        from mnn_tpu.runtime.prefix_cache import _to_np

        with self._lock:
            data = {}
            for name in ("k", "v"):
                arr, dt = _to_np(getattr(self.cache, name))
                data[name] = arr
                data[name + "_dtype"] = np.asarray(dt)
            if self.cache.quantized:
                data["k_scale"] = np.asarray(self.cache.k_scale)
                data["v_scale"] = np.asarray(self.cache.v_scale)
            data["length"] = np.asarray(self.cache.length)
            data["bits"] = np.asarray(self.cache.bits)
            data["quantized"] = np.asarray(self.cache.quantized)
            data["last_tokens"] = np.asarray(self.last_tokens)
            typed_key = jnp.issubdtype(self.key.dtype, jax.dtypes.prng_key)
            data["rng"] = np.asarray(jax.random.key_data(self.key)
                                     if typed_key else self.key)
            data["rng_typed"] = np.asarray(bool(typed_key))
            data["sampler_recent"] = np.asarray(self.state.recent)
            data["sampler_pos"] = np.asarray(self.state.pos)

            snap_now = time.perf_counter()

            def req_meta(r: Request):
                return {"rid": r.rid, "token_ids": r.token_ids,
                        "generated": r.generated,
                        "max_new_tokens": r.max_new_tokens,
                        "status": r.status.value, "slot": r.slot,
                        # deadlines are wall-clock in THIS process's
                        # timebase: persist the remaining budget, restored
                        # relative to resume time
                        "remaining_s": (max(r.deadline - snap_now, 0.0)
                                        if r.deadline is not None else None),
                        "logit_bias": (list(map(list, r.logit_bias))
                                       if r.logit_bias else None)}

            # drain + restore the waiting queue to serialize it
            waiting = []
            while not self.waiting.empty():
                waiting.append(self.waiting.get_nowait())
            for r in waiting:
                self.waiting.put(r)
            meta = {
                "slots": [req_meta(r) if r is not None else None
                          for r in self.slots],
                "waiting": [req_meta(r) for r in waiting
                            if r.status == Status.WAITING],
                "next_rid": max([r.rid for r in self.requests.values()],
                                default=-1) + 1,
                "model": self.config.name,
            }
            data["meta"] = np.asarray(_json.dumps(meta))
            # write through a file handle: np.savez(str) appends ".npz",
            # which would break resume()'s exact-path lookup
            with open(path, "wb") as fh:
                np.savez(fh, **data)

    @classmethod
    def resume(cls, path: str, config: ModelConfig, params: Params,
               rt: RuntimeConfig, tokenizer=None, eos_ids=frozenset(),
               mesh=None, dp_axis: str = "dp") -> "BatchEngine":
        """Rebuild a snapshotted engine; in-flight requests continue
        decoding from their exact KV/sampler state (fresh output queues —
        reconnecting clients re-subscribe via `requests[rid].out`).
        Pass the same mesh/dp_axis the snapshotted engine ran with to
        restore the data-parallel KV placement (the snapshot itself is
        host-gathered, so resuming on a different dp degree also works)."""
        import json as _json

        eng = cls(config, params, rt, tokenizer=tokenizer, eos_ids=eos_ids,
                  mesh=mesh, dp_axis=dp_axis)
        z = np.load(path, allow_pickle=False)
        if bool(z["quantized"]) != eng.cache.quantized or \
                int(z["bits"]) != eng.cache.bits:
            raise ValueError("snapshot KV quantization mode mismatch")
        k, v = z["k"], z["v"]
        if str(z["k_dtype"]) == "bfloat16":
            k = jnp.asarray(k).view(jnp.bfloat16)
            v = jnp.asarray(v).view(jnp.bfloat16)
        if k.shape != eng.cache.k.shape:
            raise ValueError(
                f"snapshot cache shape {k.shape} != engine {eng.cache.k.shape}")
        eng.cache = KVCache(
            k=jnp.asarray(k), v=jnp.asarray(v),
            k_scale=jnp.asarray(z["k_scale"]) if eng.cache.quantized else None,
            v_scale=jnp.asarray(z["v_scale"]) if eng.cache.quantized else None,
            length=jnp.asarray(z["length"]), bits=int(z["bits"]),
            codebook=eng.cache.codebook,
        )
        if mesh is not None:
            eng.cache = eng._shard_batch(eng.cache)
        eng.last_tokens = jnp.asarray(z["last_tokens"])
        typed = "rng_typed" in z.files and bool(z["rng_typed"])
        eng.key = (jax.random.wrap_key_data(jnp.asarray(z["rng"]))
                   if typed else jnp.asarray(z["rng"]))
        eng.state = SamplerState(recent=jnp.asarray(z["sampler_recent"]),
                                 pos=jnp.asarray(z["sampler_pos"]))
        if mesh is not None:
            eng.state = dataclasses.replace(
                eng.state, recent=eng._shard(eng.state.recent, 0))
        meta = _json.loads(str(z["meta"]))

        resume_now = time.perf_counter()

        def mk_req(m) -> Request:
            lb = m.get("logit_bias")
            rem = m.get("remaining_s")
            r = Request(rid=m["rid"], token_ids=list(m["token_ids"]),
                        max_new_tokens=m["max_new_tokens"],
                        status=Status(m["status"]), slot=m["slot"],
                        deadline=(resume_now + rem) if rem is not None
                        else None,
                        logit_bias=tuple(
                            (int(t), float(b)) for t, b in lb) if lb
                        else None)
            r.generated = list(m["generated"])
            eng.requests[r.rid] = r
            return r

        for i, m in enumerate(meta["slots"]):
            eng.slots[i] = mk_req(m) if m is not None else None
            # re-materialize per-slot bias rows for in-flight requests
            if eng.slots[i] is not None and eng.slots[i].logit_bias:
                eng._set_bias_row(i, eng.slots[i].logit_bias)
        for m in meta["waiting"]:
            eng.waiting.put(mk_req(m))
        eng._rid = itertools.count(meta["next_rid"])
        return eng

    # -- blocking helper ---------------------------------------------------

    def generate(self, token_ids: List[int], max_new_tokens: int) -> List[int]:
        req = self.submit(token_ids, max_new_tokens)
        out = []
        while True:
            if req.status in (Status.DONE, Status.CANCELLED) and req.out.empty():
                break
            self.step()
            while not req.out.empty():
                t = req.out.get()
                if t is None:
                    return out
                out.append(t)
        return out
