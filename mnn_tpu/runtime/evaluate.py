"""Perplexity / logprob evaluation.

Equivalent of the reference's eval harness
(/root/reference/transformers/llm/eval/: perplexity + dataset eval): chunked
teacher-forced forward with all_logits, cross-entropy summed on device.
Used to measure the INT4-vs-FP16 accuracy delta (BASELINE.json target:
perplexity within MNN's stated INT4 delta at matching bit-width).
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.models.decoder import forward
from mnn_tpu.runtime import kvcache


def sequence_nll(params, config, token_ids: List[int], *,
                 chunk: int = 512, cache_capacity: Optional[int] = None,
                 interpret=None):
    """Sum of -log p(token | prefix) over positions 1..n-1, in nats.

    Returns (total_nll, token_count).
    """
    n = len(token_ids)
    if n < 2:
        raise ValueError("need at least 2 tokens")
    cap = cache_capacity or ((n + chunk - 1) // chunk) * chunk
    cache = kvcache.create(
        config.num_layers, 1, config.num_kv_heads, cap, config.head_dim,
        quantized=False,
    )
    total = 0.0
    count = 0
    for off in range(0, n - 1, chunk):
        toks = token_ids[off : off + chunk]
        pad = chunk - len(toks)
        arr = jnp.asarray([toks + [0] * pad], jnp.int32)
        logits, cache = forward(
            params, config, arr, cache, all_logits=True, interpret=interpret
        )
        if pad:
            import dataclasses

            cache = dataclasses.replace(cache, length=cache.length - pad)
        # targets for positions off..off+len(toks)-1 are token_ids[off+1...]
        tgt = token_ids[off + 1 : off + len(toks) + 1]
        valid = len(tgt)
        logp = jax.nn.log_softmax(logits[0, :valid].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.asarray(tgt, jnp.int32)[:, None], axis=-1
        ).sum()
        total += float(nll)
        count += valid
    return total, count


def perplexity(params, config, token_ids: List[int], **kw) -> float:
    nll, count = sequence_nll(params, config, token_ids, **kw)
    return math.exp(nll / count)
