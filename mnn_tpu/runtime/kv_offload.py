"""KV-cache host offload: shelve per-sequence KV out of HBM.

Equivalent of the reference's size-limited KV spill
(/root/reference/source/core/KVCacheManager.hpp:35-56: past
`kvcacheSizeLimit` per layer, KV moves to mmap-backed files; Interpreter
hints KVCACHE_SIZE_LIMIT / EXTERNAL_PATH_KVCACHE_DIR). TPU-native design:
HBM is the scarce tier, host RAM the big one, disk the cold one —

    HBM slot  --shelve-->  host RAM (np arrays)  --LRU spill-->  .npz disk
              <--restore--                       <--reload--

* `shelve` copies one slot's valid KV prefix device->host (one
  device_get) and frees the slot for another sequence;
* `restore` writes it back into any free slot (device_put + two
  dynamic-update-slices) — generation continues with zero re-prefill,
  the same "reuse past context" contract as the reference's prefix
  cache + rollback demo;
* the pool enforces `max_bytes` with LRU eviction; evictees move to
  `spill_dir` (one .npz each, via runtime/prefix_cache) instead of being
  dropped, and transparently reload on restore.

This is the serving-level spill; within one sequence, long contexts are
handled by quantized KV + windows (SURVEY.md §5.7), not by paging rows.
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.runtime.kvcache import KVCache


@dataclasses.dataclass
class HostKV:
    """One sequence's KV prefix in host memory."""
    tokens: List[int]
    k: np.ndarray          # [L, Hkv, n, D] (uint16 view when bf16)
    v: np.ndarray
    k_scale: Optional[np.ndarray]
    v_scale: Optional[np.ndarray]
    kv_dtype: str
    bits: int
    last_used: float = dataclasses.field(default_factory=time.monotonic)

    @property
    def nbytes(self) -> int:
        n = self.k.nbytes + self.v.nbytes
        if self.k_scale is not None:
            n += self.k_scale.nbytes + self.v_scale.nbytes
        return n


def _np_view(a):
    a = np.asarray(a)
    if a.dtype == np.asarray(jnp.zeros(0, jnp.bfloat16)).dtype:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


class KVOffloadPool:
    """LRU host pool of shelved KV contexts with a byte budget + disk tier."""

    def __init__(self, max_bytes: int = 4 << 30,
                 spill_dir: Optional[str] = None):
        self.max_bytes = max_bytes
        self.spill_dir = spill_dir
        self._pool: "OrderedDict[str, HostKV]" = OrderedDict()
        self._spilled: Dict[str, str] = {}   # key -> path
        self.bytes = 0

    # -- device -> host -----------------------------------------------------

    def shelve(self, key: str, cache: KVCache, token_ids: List[int],
               slot: int = 0) -> int:
        """Copy slot `slot`'s valid prefix to host; returns token count."""
        n = int(cache.length[slot])
        k, dt = _np_view(cache.k[:, slot, :, :n])
        v, _ = _np_view(cache.v[:, slot, :, :n])
        entry = HostKV(
            tokens=list(token_ids[:n]),
            k=np.ascontiguousarray(k), v=np.ascontiguousarray(v),
            k_scale=(np.asarray(cache.k_scale[:, slot, :, :n])
                     if cache.quantized else None),
            v_scale=(np.asarray(cache.v_scale[:, slot, :, :n])
                     if cache.quantized else None),
            kv_dtype=dt, bits=cache.bits,
        )
        old = self._pool.pop(key, None)
        if old is not None:
            self.bytes -= old.nbytes
        self._pool[key] = entry
        self.bytes += entry.nbytes
        self._enforce_budget()
        return n

    # -- host -> device -----------------------------------------------------

    def restore(self, key: str, cache: KVCache, slot: int = 0
                ) -> Optional[Tuple[KVCache, List[int]]]:
        """Write `key`'s KV back into slot `slot`. None if unknown."""
        entry = self._pool.get(key)
        if entry is None and key in self._spilled:
            entry = self._reload(key)
        if entry is None:
            return None
        entry.last_used = time.monotonic()
        self._pool.move_to_end(key)
        n = len(entry.tokens)
        k = entry.k
        if entry.kv_dtype == "bfloat16":
            k = k.view(np.asarray(jnp.zeros(0, jnp.bfloat16)).dtype)
            vv = entry.v.view(k.dtype)
        else:
            vv = entry.v
        zero = 0
        new_k = jax.lax.dynamic_update_slice(
            cache.k, jnp.asarray(k)[:, None].astype(cache.k.dtype),
            (zero, slot, zero, zero, zero))
        new_v = jax.lax.dynamic_update_slice(
            cache.v, jnp.asarray(vv)[:, None].astype(cache.v.dtype),
            (zero, slot, zero, zero, zero))
        upd = dict(k=new_k, v=new_v,
                   length=cache.length.at[slot].set(n))
        if cache.quantized:
            upd["k_scale"] = jax.lax.dynamic_update_slice(
                cache.k_scale, jnp.asarray(entry.k_scale)[:, None],
                (zero, slot, zero, zero))
            upd["v_scale"] = jax.lax.dynamic_update_slice(
                cache.v_scale, jnp.asarray(entry.v_scale)[:, None],
                (zero, slot, zero, zero))
        return dataclasses.replace(cache, **upd), list(entry.tokens)

    def drop(self, key: str) -> bool:
        e = self._pool.pop(key, None)
        if e is not None:
            self.bytes -= e.nbytes
        p = self._spilled.pop(key, None)
        if p and os.path.exists(p):
            os.unlink(p)
        return e is not None or p is not None

    def __contains__(self, key: str) -> bool:
        return key in self._pool or key in self._spilled

    def stats(self) -> dict:
        return {"entries": len(self._pool), "bytes": self.bytes,
                "spilled": len(self._spilled)}

    # -- LRU + disk tier ----------------------------------------------------

    def _enforce_budget(self):
        while self.bytes > self.max_bytes and len(self._pool) > 1:
            key, entry = self._pool.popitem(last=False)   # LRU
            self.bytes -= entry.nbytes
            if self.spill_dir:
                self._spill(key, entry)

    def _spill(self, key: str, entry: HostKV):
        os.makedirs(self.spill_dir, exist_ok=True)
        path = os.path.join(self.spill_dir, f"kv_{abs(hash(key)):x}.npz")
        data = dict(tokens=np.asarray(entry.tokens, np.int32),
                    k=entry.k, v=entry.v,
                    kv_dtype=np.asarray(entry.kv_dtype),
                    bits=np.asarray(entry.bits))
        if entry.k_scale is not None:
            data["k_scale"] = entry.k_scale
            data["v_scale"] = entry.v_scale
        with open(path, "wb") as fh:
            np.savez(fh, **data)
        self._spilled[key] = path

    def _reload(self, key: str) -> Optional[HostKV]:
        path = self._spilled.pop(key, None)
        if path is None or not os.path.exists(path):
            return None
        with np.load(path) as z:
            entry = HostKV(
                tokens=z["tokens"].tolist(),
                k=z["k"], v=z["v"],
                k_scale=z["k_scale"] if "k_scale" in z else None,
                v_scale=z["v_scale"] if "v_scale" in z else None,
                kv_dtype=str(z["kv_dtype"]), bits=int(z["bits"]),
            )
        os.unlink(path)
        self._pool[key] = entry
        self.bytes += entry.nbytes
        self._enforce_budget()
        return entry
