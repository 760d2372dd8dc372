"""Measured block-size selection for the dequant-matmul kernel.

TPU-native analog of the reference's GPU GEMM auto-tuning with a persistent
cache (OpenCL GemmTune + CLRuntime::onSetCache/onGetCache —
/root/reference/source/backend/opencl/core/OpenCLBackend.cpp:191,211, tune
levels Interpreter::setCacheFile): candidate (bm, bn, bk) tilings are timed
on the real chip once, and the winners are persisted per device kind in a
JSON table that `dequant_matmul` consults before falling back to the
`choose_blocks` heuristic.

Timing uses the tunnel-safe two-depth slope (see utils/benchit): each
candidate runs chained on-device at two iteration counts and the marginal
per-call time is the difference quotient, so the fixed dispatch+sync cost
cancels.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

_TABLE: Optional[Dict[str, list]] = None
_PATH: Optional[str] = None


def _cache_path() -> str:
    global _PATH
    if _PATH is None:
        import jax

        base = os.environ.get(
            "MNN_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "mnn_tpu"),
        )
        os.makedirs(base, exist_ok=True)
        kind = "cpu"
        try:
            if jax.default_backend() == "tpu":
                kind = jax.devices()[0].device_kind.replace(" ", "_")
        except Exception:
            pass
        _PATH = os.path.join(base, f"gemm_tune_{kind}.json")
    return _PATH


def _key(m: int, k: int, n: int, bs: int, bits: int, act_bits: int) -> str:
    return f"{m},{k},{n},{bs},{bits},{act_bits}"


def _load() -> Dict[str, list]:
    global _TABLE
    if _TABLE is None:
        try:
            with open(_cache_path()) as f:
                _TABLE = json.load(f)
        except Exception:
            _TABLE = {}
    return _TABLE


def lookup(m: int, k: int, n: int, bs: int, bits: int, act_bits: int
           ) -> Optional[Tuple[int, int, int]]:
    """Tuned (bm, bn, bk) for this problem, or None if never tuned."""
    hit = _load().get(_key(m, k, n, bs, bits, act_bits))
    return None if hit is None else tuple(hit)


def store(m, k, n, bs, bits, act_bits, blocks: Tuple[int, int, int]) -> None:
    table = _load()
    table[_key(m, k, n, bs, bits, act_bits)] = list(blocks)
    with open(_cache_path(), "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)


def candidates(m: int, k: int, n: int, bs: int):
    """Candidate (bm, bn, bk) tilings around the heuristic default."""
    from mnn_tpu.kernels.common import largest_divisor_leq, round_up
    from mnn_tpu.kernels.dequant_matmul import choose_blocks

    default = choose_blocks(m, k, n, bs)
    bm = default[0]
    out = {default}
    for bn in (1024, 2048, 4096, 8192):
        if bn > round_up(n, 128):
            continue
        for bk_cap in (bs, 512, 1024, 2048, 4096):
            bk = largest_divisor_leq(k, bk_cap, bs)
            cand = (bm, bn, bk)
            # reuse the heuristic's VMEM guard by rejecting absurd tiles
            if bk // 2 * bn * 2 + bm * bn * 8 > (12 << 20):
                continue
            out.add(cand)
    return sorted(out)


def measure(ql, m: int, blocks: Tuple[int, int, int], iters: int = 400
            ) -> float:
    """Marginal seconds/call of dequant_matmul(x[m, K], ql) at `blocks`."""
    import jax
    import jax.numpy as jnp

    from mnn_tpu.kernels.dequant_matmul import dequant_matmul
    from mnn_tpu.utils.benchit import chain

    k = ql.shape[0]
    x0 = jnp.ones((m, k), jnp.bfloat16)
    bm, bn, bk = blocks

    def f(x):
        return dequant_matmul(
            x, ql, out_dtype=jnp.float32, block_m=bm, block_n=bn, block_k=bk
        )

    hi, lo = iters, max(iters // 5, 10)
    t_hi = chain(f, x0, iters=hi, warmup=3)
    t_lo = chain(f, x0, iters=lo, warmup=3)
    return (t_hi * hi - t_lo * lo) / (hi - lo)


def tune_ql(ql, m: int, verbose: bool = True) -> Tuple[int, int, int]:
    """Measure all candidates for one QuantizedLinear at batch rows m,
    persist and return the winner."""
    k, n = ql.shape
    best = None
    best_t = float("inf")
    for cand in candidates(m, k, n, ql.block_size):
        try:
            t = measure(ql, m, cand)
        except Exception as e:  # tiling rejected by Mosaic
            if verbose:
                print(f"  {cand}: skipped ({str(e)[:60]})")
            continue
        if verbose:
            print(f"  {cand}: {t * 1e6:.1f} us")
        if t < best_t:
            best, best_t = cand, t
    if best is None:
        raise RuntimeError("no candidate compiled")
    store(m, k, n, ql.block_size, ql.bits, ql.act_bits, best)
    if verbose:
        print(f"  -> {best} ({best_t * 1e6:.1f} us) saved to {_cache_path()}")
    return best


def tune_model(params, m_values=(1, 8, 128, 512), verbose: bool = True):
    """Tune every distinct projection shape of a Params pytree.

    Mirrors the reference's llm-shaped GEMM tuning matrix
    (test/speed/GemmSpeed.cpp M=8/32/128/512). Layer-stacked projections are
    tuned on layer 0 (all layers share a shape).
    """
    from mnn_tpu.kernels.dequant_matmul import _slice_layer
    from mnn_tpu.quant.quantize import QuantizedLinear

    seen = set()
    lay = params.layers
    quants = [q for q in (lay.wqkv, lay.wo, lay.wgu, lay.wdown) if q is not None]
    if isinstance(params.lm_head, QuantizedLinear):
        quants.append(params.lm_head)
    for ql in quants:
        if ql.packed.ndim == 3:   # [L, K/pack, N] stacked
            import jax.numpy as jnp

            ql = _slice_layer(ql, jnp.int32(0))
        key = (*ql.shape, ql.block_size, ql.bits, ql.act_bits)
        if key in seen:
            continue
        seen.add(key)
        for m in m_values:
            if verbose:
                print(f"tuning K={ql.shape[0]} N={ql.shape[1]} m={m}")
            tune_ql(ql, m, verbose=verbose)


def invalidate_cache() -> None:
    """Drop the in-memory table (tests)."""
    global _TABLE
    _TABLE = None
