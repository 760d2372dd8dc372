"""Prefix-cache persistence: save/restore KV state for prompt reuse.

Equivalent of the reference's prefix-cache files + prompt-cache sync
(/root/reference/transformers/llm/engine: Llm::setPrefixCacheFile,
prompt_cache_utils.hpp; KV disk spill KVCacheManager.hpp:35-56): the valid
prefix of the device KV cache (+ the token ids that produced it) is saved
to one .npz; on load the cache is restored and generation continues from
the cached context, skipping prefill of the shared prompt prefix.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mnn_tpu.runtime.kvcache import KVCache


def _to_np(a):
    """np view safe for savez (numpy can't serialize bf16)."""
    a = np.asarray(a)
    if a.dtype == np.asarray(jnp.zeros(0, jnp.bfloat16)).dtype:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def save_prefix(path: str, cache: KVCache, token_ids: List[int],
                slot: int = 0) -> int:
    """Persist slot `slot`'s valid prefix. Returns saved token count."""
    n = int(cache.length[slot])
    k, k_dt = _to_np(cache.k[:, slot, :, :n])
    v, v_dt = _to_np(cache.v[:, slot, :, :n])
    data = {
        "tokens": np.asarray(token_ids[:n], np.int32),
        "k": k, "v": v,
        "kv_dtype": np.asarray(k_dt),
        "quantized": np.asarray(cache.quantized),
        "bits": np.asarray(cache.bits),
    }
    if cache.quantized:
        data["k_scale"] = np.asarray(cache.k_scale[:, slot, :, :n])
        data["v_scale"] = np.asarray(cache.v_scale[:, slot, :, :n])
    # file handle: np.savez(str) appends ".npz" to extensionless paths,
    # which would break load_prefix(same_path)
    with open(path, "wb") as fh:
        np.savez(fh, **data)
    return n


def load_prefix(path: str, cache: KVCache, slot: int = 0
                ) -> Tuple[KVCache, List[int]]:
    """Restore a saved prefix into slot `slot`. Returns (cache, token_ids).

    The target cache must have matching layer/head/dim shapes and capacity
    >= the saved length, and matching quantization mode.
    """
    z = np.load(path)
    n = int(z["tokens"].shape[0])
    if n > cache.capacity:
        raise ValueError(f"prefix length {n} exceeds capacity {cache.capacity}")
    if bool(z["quantized"]) != cache.quantized:
        raise ValueError("prefix cache quantization mode mismatch")
    saved_bits = int(z["bits"]) if "bits" in z else (8 if cache.quantized else 16)
    if saved_bits != cache.bits:
        raise ValueError(
            f"prefix cache kv bits mismatch: saved {saved_bits}, cache {cache.bits}")
    kv_np_k, kv_np_v = z["k"], z["v"]
    if str(z.get("kv_dtype", "")) == "bfloat16":
        kv_np_k = jnp.asarray(kv_np_k).view(jnp.bfloat16)
        kv_np_v = jnp.asarray(kv_np_v).view(jnp.bfloat16)
    k = cache.k.at[:, slot, :, :n].set(jnp.asarray(kv_np_k))
    v = cache.v.at[:, slot, :, :n].set(jnp.asarray(kv_np_v))
    ks, vs = cache.k_scale, cache.v_scale
    if cache.quantized:
        ks = ks.at[:, slot, :, :n].set(jnp.asarray(z["k_scale"]))
        vs = vs.at[:, slot, :, :n].set(jnp.asarray(z["v_scale"]))
    length = cache.length.at[slot].set(n)
    new = KVCache(k=k, v=v, k_scale=ks, v_scale=vs, length=length,
                  bits=cache.bits, codebook=cache.codebook)
    return new, [int(t) for t in z["tokens"]]
