"""High-level LLM engine: load -> prefill -> streamed decode.

TPU re-design of the reference's `Llm` class
(/root/reference/transformers/llm/engine/include/llm/llm.hpp:140-200,
src/llm.cpp): same lifecycle (create from config -> load -> response/generate
with streaming + perf counters -> KV-cache control), rebuilt around jitted
prefill/decode functions and a fixed-capacity device KV cache.

Capability map vs the reference:
  Llm::createLLM(config)   -> Llm.load(...) / Llm.from_pretrained(...)
  Llm::response/generate   -> Llm.generate / Llm.stream
  chunked prefill          -> generate.run_prefill (bucketed chunks)
  KVMeta add/remove/reserve-> Llm.reset / Llm.rollback (length bookkeeping)
  LlmContext perf counters -> Llm.perf (prefill_s, decode_s, tok/s)
  module pool per shape    -> jit cache keyed on bucketed shapes
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.models.config import PRESETS, ModelConfig, RuntimeConfig
from mnn_tpu.models.decoder import Params, forward, init_random_params
from mnn_tpu.runtime import generate as gen
from mnn_tpu.runtime import kvcache, sampler
from mnn_tpu.runtime.tokenizer import load_tokenizer


@dataclasses.dataclass
class PerfContext:
    """≈ reference LlmContext counters (llm.hpp:108-126)."""

    prompt_len: int = 0
    gen_len: int = 0
    prefill_s: float = 0.0
    decode_s: float = 0.0
    sample_s: float = 0.0
    # ≈ reference LlmStatus (llm.hpp:95-103): OK | TIMEOUT
    status: str = "ok"

    @property
    def prefill_tok_s(self) -> float:
        return self.prompt_len / self.prefill_s if self.prefill_s else 0.0

    @property
    def decode_tok_s(self) -> float:
        return self.gen_len / self.decode_s if self.decode_s else 0.0


class Llm:
    def __init__(
        self,
        config: ModelConfig,
        params: Params,
        rt: Optional[RuntimeConfig] = None,
        tokenizer=None,
    ):
        self.rt = rt or RuntimeConfig()
        if self.rt.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if self.rt.kv_rotate and not config.kv_rotate:
            config = dataclasses.replace(config, kv_rotate=True)
        self.config = config
        self.params = params
        self.tokenizer = tokenizer or load_tokenizer(None)
        self.cache = self._new_cache()
        self.perf = PerfContext()
        self._key = jax.random.PRNGKey(self.rt.seed)

    # -- construction ------------------------------------------------------

    @classmethod
    def synthetic(
        cls, preset: str = "qwen2-0.5b", rt: Optional[RuntimeConfig] = None,
        seed: int = 0,
    ) -> "Llm":
        """Random-weight model (benchmarks / smoke tests; no files needed)."""
        rt = rt or RuntimeConfig()
        config = PRESETS[preset]
        params = init_random_params(
            config, jax.random.PRNGKey(seed),
            quant_bits=rt.quant_bits, quant_block=rt.quant_block,
            sym=rt.quant_sym, fast=True, act_bits=rt.act_bits,
            lm_head_bits=rt.lm_head_bits,
        )
        return cls(config, params, rt)

    @classmethod
    def from_pretrained(cls, model_dir: str, rt: Optional[RuntimeConfig] = None) -> "Llm":
        """Load a converted checkpoint directory (see mnn_tpu.convert)."""
        from mnn_tpu.convert.checkpoint import load_checkpoint

        config, params, saved_rt = load_checkpoint(model_dir)
        rt = rt or saved_rt
        return cls(config, params, rt, tokenizer=load_tokenizer(model_dir))

    def _new_cache(self):
        return kvcache.create(
            self.config.num_layers, self.rt.max_batch, self.config.num_kv_heads,
            self.rt.max_seq_len, self.config.head_dim,
            quantized=self.rt.kv_quant, kv_bits=self.rt.kv_bits,
            kv_codebook=self.rt.kv_codebook,
        )

    # -- runtime introspection (reference: Interpreter::getSessionInfo
    # MEMORY / FLOPS / BACKENDS, include/MNN/Interpreter.hpp:447-476) ------

    def info(self) -> dict:
        """Live session facts: memory (params/KV/HBM), per-token FLOPs,
        backend. ≈ `getSessionInfo` — the reference reports session MB,
        flops, and resolved backends; here memory is exact buffer
        accounting plus the device allocator's view when it exposes one."""
        import jax

        def tree_bytes(t):
            return int(sum(
                a.nbytes for a in jax.tree_util.tree_leaves(t)
                if hasattr(a, "nbytes")))

        c = self.config
        flops_tok = 2 * c.num_layers * (
            c.hidden_size * (c.num_heads + 2 * c.num_kv_heads) * c.head_dim
            + c.q_dim * c.hidden_size)
        if c.is_moe:
            mi = c.moe_intermediate_size
            flops_tok += 2 * c.num_layers * c.num_experts_per_tok \
                * 3 * c.hidden_size * mi
            if c.shared_expert_intermediate_size:
                flops_tok += 2 * c.num_layers * 3 * c.hidden_size \
                    * c.shared_expert_intermediate_size
        else:
            flops_tok += 2 * c.num_layers * 3 * c.hidden_size \
                * c.intermediate_size
        flops_tok += 2 * c.hidden_size * c.vocab_size
        dev = jax.devices()[0]
        hbm = None
        try:
            st = dev.memory_stats()
            if st:
                hbm = {"bytes_in_use": st.get("bytes_in_use"),
                       "peak_bytes_in_use": st.get("peak_bytes_in_use"),
                       "bytes_limit": st.get("bytes_limit")}
        except Exception:
            pass
        return {
            "model": c.name,
            "backend": jax.default_backend(),
            "device": dev.device_kind,
            "param_bytes": tree_bytes(self.params),
            "kv_cache_bytes": tree_bytes(self.cache),
            "kv_bits": self.cache.bits,
            "kv_capacity": self.cache.capacity,
            "context_len": self.context_len,
            "flops_per_token": int(flops_tok),
            "hbm": hbm,
        }

    # -- KV-cache control (reference: setKVCacheInfo / eraseHistory) -------

    def reset(self):
        self.cache = kvcache.reset(self.cache)

    def rollback(self, n: int):
        self.cache = kvcache.rollback(self.cache, n)

    @property
    def context_len(self) -> int:
        return int(self.cache.length[0])

    # -- KV host offload (reference: KVCacheManager size-limited spill,
    # KVCacheManager.hpp:35-56) --------------------------------------------

    def shelve_context(self, key: str, pool, token_ids=None) -> int:
        """Move the current context's KV to the host pool and reset the
        device cache; returns the shelved token count. Lets one Llm serve
        many long-lived sessions with only one HBM cache slot."""
        n = pool.shelve(key, self.cache, token_ids or [0] * self.context_len)
        self.reset()
        return n

    def restore_context(self, key: str, pool) -> bool:
        """Bring a shelved context back into the device cache (no
        re-prefill). Returns False if the pool has no such key."""
        got = pool.restore(key, self.cache)
        if got is None:
            return False
        self.cache, _ = got
        return True

    # -- generation --------------------------------------------------------

    def _logit_bias_array(self):
        """rt.logit_bias (id, bias) pairs -> dense [V] f32 array or None."""
        lb = self.rt.logit_bias
        if not lb:
            return None
        import numpy as np

        v = np.zeros((self.config.vocab_size,), np.float32)
        for tid, b in lb:
            if 0 <= int(tid) < v.shape[0]:
                v[int(tid)] = float(b)
        return jnp.asarray(v)

    def stream(
        self,
        prompt: Optional[str] = None,
        *,
        token_ids: Optional[List[int]] = None,
        max_new_tokens: Optional[int] = None,
        use_template: bool = False,
        timeout_s: Optional[float] = None,
    ) -> Iterator[int]:
        """Yield generated token ids as decode blocks complete.

        timeout_s (default rt.timeout_s; 0 = unlimited): wall-clock
        deadline measured from prefill start, checked between decode
        blocks — the reference enforces its `timeout_ms` the same way in
        the decode loop (generate.cpp:52-56); on expiry generation stops
        cleanly and perf.status == "timeout"."""
        rt = self.rt
        if token_ids is None:
            text = prompt or ""
            if use_template:
                text = self.tokenizer.apply_chat_template(
                    [{"role": "user", "content": prompt}]
                )
            token_ids = self.tokenizer.encode(text)
        if not token_ids:
            token_ids = [0]
        max_new = max_new_tokens or rt.max_new_tokens
        eos = getattr(self.tokenizer, "eos_ids", set())
        deadline = timeout_s if timeout_s is not None else rt.timeout_s
        t_start = time.perf_counter()

        tokens = jnp.asarray([token_ids] * rt.max_batch, jnp.int32)
        self.perf = PerfContext(prompt_len=len(token_ids))

        if rt.speculative == "lookahead" and rt.sampler == "greedy":
            yield from self._stream_lookahead(token_ids, max_new, eos)
            return
        if rt.speculative in ("eagle", "eagle-tree", "mtp", "dflash") \
                and rt.sampler == "greedy":
            yield from self._stream_draft(token_ids, max_new, eos)
            return

        t0 = time.perf_counter()
        logits, cache = gen.run_prefill(
            self.params, self.config, rt, tokens, self.cache
        )
        jax.block_until_ready(logits)
        self.perf.prefill_s = time.perf_counter() - t0

        state = sampler.make_state(rt.max_batch)
        t0 = time.perf_counter()

        bias = self._logit_bias_array()

        def dispatch(cache, logits, state, key, steps):
            return gen.decode_steps(
                self.params, self.config, cache, logits, state, key,
                steps=steps, sampler=rt.sampler, temperature=rt.temperature,
                top_k=rt.top_k, top_p=rt.top_p, min_p=rt.min_p,
                penalty=rt.penalty, logit_bias=bias,
            )

        # Double-buffered decode: block k+1 is dispatched (async) BEFORE
        # block k's tokens are pulled to the host, hiding the tunnel/host
        # round-trip (~tens of ms) behind device compute. The host transfer
        # itself is one np.asarray per block (per-token int() would cost one
        # round-trip each — observed 30 ms/token).
        steps = min(rt.decode_block, max_new)
        pending = dispatch(cache, logits, state, self._key, steps)
        pending_steps = steps
        dispatched = steps
        produced = 0
        while True:
            toks, logits, cache, state, key = pending
            nxt = nxt_steps = None
            if dispatched < max_new:
                nxt_steps = min(rt.decode_block, max_new - dispatched)
                nxt = dispatch(cache, logits, state, key, nxt_steps)
                dispatched += nxt_steps
            block = np.asarray(toks[0]).tolist()
            produced += pending_steps
            self._key = key
            stop = produced >= max_new
            if deadline and time.perf_counter() - t_start > deadline:
                self.perf.status = "timeout"
                stop = True
            consumed = 0
            for t in block:
                consumed += 1
                self.perf.gen_len += 1
                yield t
                if t in eos:
                    stop = True
                    break
            self.perf.decode_s = time.perf_counter() - t0
            if stop or nxt is None:
                # EOS mid-block: the block's unconsumed tail was appended to
                # the cache — roll it back so multi-turn context stays clean
                extra = pending_steps - consumed
                if extra:
                    cache = kvcache.rollback(cache, extra)
                break
            pending, pending_steps = nxt, nxt_steps
        self.cache = cache

    def _stream_lookahead(self, token_ids, max_new, eos):
        from mnn_tpu.runtime.speculative import lookahead_generate

        t0 = time.perf_counter()
        first = True
        for block in lookahead_generate(
            self, token_ids, max_new,
            ngram=self.rt.ngram, draft_len=self.rt.draft_len,
        ):
            if first:
                self.perf.prefill_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                first = False
            for t in block:
                self.perf.gen_len += 1
                yield t
                if t in eos:
                    self.perf.decode_s = time.perf_counter() - t0
                    return
            self.perf.decode_s = time.perf_counter() - t0

    def _make_drafter(self):
        """Build the draft model for rt.speculative (reference: Mtp/Eagle
        generation load extra draft modules, generate.hpp:29-105). With no
        draft checkpoint configured, heads are random-init — still LOSSLESS
        (verification guarantees AR-identical output), just low acceptance."""
        from mnn_tpu.models import eagle as eagle_mod
        from mnn_tpu.runtime.speculative import (EagleDraft, MtpDraft,
                                                 TreeEagleDraft)

        key = jax.random.PRNGKey(self.rt.seed + 1)
        if self.rt.speculative in ("eagle", "eagle-tree"):
            ep = eagle_mod.init_random_eagle(
                self.config, key, bits=self.rt.quant_bits,
                block_size=self.rt.quant_block,
            )
            if self.rt.speculative == "eagle-tree":
                return TreeEagleDraft(ep, draft_len=self.rt.draft_len,
                                      capacity=self.rt.max_seq_len,
                                      fanout=self.rt.tree_fanout)
            return EagleDraft(ep, draft_len=self.rt.draft_len,
                              capacity=self.rt.max_seq_len)
        if self.rt.speculative == "dflash":
            from mnn_tpu.models.dflash import init_random_dflash
            from mnn_tpu.runtime.speculative import DFlashDraft

            dp = init_random_dflash(
                self.config, key, block_size=self.rt.draft_len)
            return DFlashDraft(dp, capacity=self.rt.max_seq_len)
        heads = eagle_mod.init_random_mtp(
            self.config, key, num_heads=self.rt.draft_len
        )
        return MtpDraft(heads)

    def _stream_draft(self, token_ids, max_new, eos):
        from mnn_tpu.runtime.speculative import (draft_generate,
                                                 tree_draft_generate)

        if getattr(self, "drafter", None) is None:
            self.drafter = self._make_drafter()
        gen_fn = (tree_draft_generate
                  if self.drafter.kind == "eagle-tree" else draft_generate)
        t0 = time.perf_counter()
        first = True
        for block in gen_fn(
            self, token_ids, max_new, drafter=self.drafter
        ):
            if first:
                self.perf.prefill_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                first = False
            for t in block:
                self.perf.gen_len += 1
                yield t
                if t in eos:
                    self.perf.decode_s = time.perf_counter() - t0
                    return
            self.perf.decode_s = time.perf_counter() - t0

    def generate(self, prompt: Optional[str] = None, **kw) -> str:
        ids = list(self.stream(prompt, **kw))
        eos = getattr(self.tokenizer, "eos_ids", set())
        if ids and ids[-1] in eos:
            ids = ids[:-1]
        return self.tokenizer.decode(ids)

    def response(self, prompt: str, **kw) -> str:
        """Chat-style single-turn response (reference Llm::response)."""
        return self.generate(prompt, use_template=True, **kw)

    # -- embedding / reranking (reference: embedding_demo / reranker_demo,
    # transformers/llm/engine/demo/) --------------------------------------

    def embed(self, text: Optional[str] = None, *,
              token_ids: Optional[List[int]] = None,
              pooling: str = "last") -> np.ndarray:
        """Sentence embedding from the decoder's final hidden states.

        pooling: "last" (last token, the LLM-embedder convention) or
        "mean" (masked mean). L2-normalized. Runs on a throwaway cache —
        the chat KV state is untouched.
        """
        from mnn_tpu.models.decoder import forward
        from mnn_tpu.models.layers import rms_norm

        if token_ids is None:
            token_ids = self.tokenizer.encode(text or "")
        if not token_ids:
            token_ids = [0]
        cache = kvcache.create(
            self.config.num_layers, 1, self.config.num_kv_heads,
            max(64, 1 << (len(token_ids) - 1).bit_length()),
            self.config.head_dim, quantized=False,
        )
        tokens = jnp.asarray([token_ids], jnp.int32)
        hidden, _ = forward(self.params, self.config, tokens, cache,
                            return_hidden=True)
        hidden = rms_norm(hidden, self.params.final_norm,
                          self.config.rms_norm_eps)
        if pooling == "mean":
            v = hidden[0].astype(jnp.float32).mean(0)
        else:
            v = hidden[0, -1].astype(jnp.float32)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-9)
        return np.asarray(v)

    def rerank(self, query: str, documents: List[str], *,
               yes_token_id: Optional[int] = None,
               template: str = "Query: {q}\nDocument: {d}\nRelevant:"
               ) -> List[float]:
        """Relevance scores for (query, doc) pairs.

        With `yes_token_id`: the score is that token's log-probability
        after the filled template (the qwen-reranker style the reference's
        reranker_demo drives). Otherwise: cosine similarity of embeddings.
        """
        if yes_token_id is None:
            qv = self.embed(query)
            return [float(np.dot(qv, self.embed(d))) for d in documents]
        from mnn_tpu.models.decoder import forward

        scores = []
        for d in documents:
            ids = self.tokenizer.encode(template.format(q=query, d=d)) or [0]
            cache = kvcache.create(
                self.config.num_layers, 1, self.config.num_kv_heads,
                max(64, 1 << (len(ids) - 1).bit_length()),
                self.config.head_dim, quantized=False)
            logits, _ = forward(self.params, self.config,
                                jnp.asarray([ids], jnp.int32), cache)
            logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
            scores.append(float(logp[yes_token_id]))
        return scores
