"""Driver benchmark: pp512 + tg128 on one chip, INT4 + int8 KV.

Measures TWO configs per run:
  * qwen2-0.5b — the round-1/2-comparable headline (vs the reference's
    published Qwen2-0.5B INT4 iPhone 15 Pro numbers);
  * qwen2-7b  — the BASELINE.json north-star config (INT4 7B, int8 KV),
    with a stated HBM-roofline fraction.

Mirrors the reference's llm_bench pp/tg methodology
(/root/reference/transformers/llm/engine/app/llm_benchmark.cpp, results at
docs/transformers/llm.md:690-745). Baseline for vs_baseline is the
reference's published Qwen2-0.5B-instruct INT4 decode on iPhone 15 Pro
(51.36 tok/s, transformers/llm/engine/ios/README.md:52-53) — same model,
same bit-width, their flagship published number for this config.

Methodology (device throughput): this environment reaches the TPU through a
development tunnel that adds a fixed ~26 ms roundtrip to every
dispatch+sync, which is an artifact of the harness, not of the engine or
the chip (the reference's on-device numbers likewise contain no RPC hop).
Each measurement therefore differences two queue depths — K and 1 runs of
the same compiled step queued back-to-back with ONE final sync — so the
fixed roundtrip cancels and the slope is pure device time:

    device_time = (T(K runs) - T(1 run)) / (K - 1)

Decode roofline: batch-1 decode is weight-streaming-bound; the upper bound
is sustained HBM bandwidth / bytes-read-per-token (packed weights + scale
planes + KV rows), the reference's own gemv methodology
(/root/reference/docs/perf/gemv_bw_benchmark.md). HBM_GBS below is the
sustained (not peak) bandwidth measured on this chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import argparse
import json
import time

import numpy as np

PP, TG, REPS = 512, 128, 5
BASELINE_DECODE = 51.36   # tok/s, reference published (see module docstring)
BASELINE_PREFILL = 234.51
HBM_GBS = 819.0           # sustained HBM GB/s on this chip (measured r1)


def _decode_bytes_per_token(c, rt, kv_len):
    """HBM bytes streamed per decode token: packed weights, scale/bias
    planes (bf16), embedding row + lm head, KV rows read. MoE: only the
    routed top-k experts (+ shared expert) stream per token."""
    h, L = c.hidden_size, c.num_layers
    nq = (c.num_heads + 2 * c.num_kv_heads) * c.head_dim
    dq = c.q_dim
    bs = rt.quant_block

    def lin(k_dim, n_dim):  # packed + bf16 scale/bias planes
        return (k_dim * n_dim * rt.quant_bits // 8
                + (k_dim // bs) * n_dim * 2 * 2)

    per_layer = lin(h, nq) + lin(dq, h)
    if c.is_moe:
        mi = c.moe_intermediate_size
        per_layer += c.num_experts_per_tok * (lin(h, 2 * mi) + lin(mi, h))
        if c.shared_expert_intermediate_size:
            si = c.shared_expert_intermediate_size
            per_layer += lin(h, 2 * si) + lin(si, h)
    else:
        i_dim = c.intermediate_size
        per_layer += lin(h, 2 * i_dim) + lin(i_dim, h)
    kvb = {8: 1.0, 4: 0.5, 3: 0.375}.get(rt.kv_bits, 2.0)
    kv = int(L * 2 * c.num_kv_heads * kv_len * (c.head_dim * kvb + 4))
    head = h * c.vocab_size * rt.lm_head_bits // 8
    return L * per_layer + kv + head


def bench_preset(preset: str, pp: int = PP, tg: int = TG,
                 num_layers: int = 0, kv_bits: int = 8, w_bits: int = 4,
                 q_block: int = 128):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mnn_tpu.models.config import PRESETS, RuntimeConfig
    from mnn_tpu.models.decoder import init_random_params
    from mnn_tpu.runtime import generate as gen
    from mnn_tpu.runtime import kvcache, sampler

    c = PRESETS[preset]
    if num_layers:  # depth-truncated variant (fit HBM; per-layer cost is
        c = dataclasses.replace(c, num_layers=num_layers)  # depth-uniform)
    cap = 1024
    while cap < pp + tg:
        cap *= 2
    rt = RuntimeConfig(
        max_seq_len=cap, prefill_chunk=min(pp, 512), decode_block=tg,
        sampler="greedy", kv_quant=True, kv_bits=kv_bits, quant_bits=w_bits,
        quant_block=q_block, lm_head_bits=min(w_bits, 4), prefill_act_bits=8,
    )
    params = init_random_params(
        c, jax.random.PRNGKey(0), quant_bits=rt.quant_bits,
        quant_block=rt.quant_block, lm_head_bits=rt.lm_head_bits, fast=True,
    )
    cache0 = kvcache.create(
        c.num_layers, 1, c.num_kv_heads, rt.max_seq_len, c.head_dim,
        quantized=rt.kv_quant, kv_bits=rt.kv_bits,
    )
    tokens = jnp.zeros((1, pp), jnp.int32)

    # --- prefill: pp512, queue-depth differencing --------------------------
    def queue_prefill(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = gen.run_prefill(params, c, rt, tokens, cache0)
        _ = np.asarray(out[0][0, :1])   # single sync (tunnel-safe)
        return time.perf_counter() - t0

    queue_prefill(1)  # compile
    # deeper queues: per-run tunnel jitter is comparable to one prefill,
    # so difference depths 2 and 12 (slope over 10 runs) and min over reps
    t_lo = min(queue_prefill(2) for _ in range(REPS))
    t_hi = min(queue_prefill(12) for _ in range(REPS))
    prefill_s = (t_hi - t_lo) / 10
    prefill_tok_s = pp / prefill_s
    # prefill MFU: 2 flops/MAC of USEFUL work at bf16 peak ~197 TF/s.
    # MoE: intermediate_size covers the shared expert (qwen1.5-moe keys
    # them equal); the routed top-k experts' flops are useful work too
    # and must be counted (the round-4 formula omitted them, deflating
    # MoE MFU by the active/shared ratio).
    mlp_flops = 3 * c.hidden_size * c.intermediate_size
    if c.is_moe:
        mlp_flops = (3 * c.hidden_size * c.moe_intermediate_size
                     * c.num_experts_per_tok
                     + 3 * c.hidden_size
                     * c.shared_expert_intermediate_size)
    flops_tok = 2 * c.num_layers * (
        c.hidden_size * (c.num_heads + 2 * c.num_kv_heads) * c.head_dim
        + c.q_dim * c.hidden_size + mlp_flops)
    mfu = prefill_tok_s * flops_tok / 197e12

    # --- decode: tg128 after pp512, step-count differencing ----------------
    logits, cache = gen.run_prefill(params, c, rt, tokens, cache0)
    state = sampler.make_state(1)
    key = jax.random.PRNGKey(0)

    def run_decode(steps):
        out = gen.decode_steps(
            params, c, cache, logits, state, key, steps=steps,
            sampler=rt.sampler,
        )
        _ = np.asarray(out[0])
        return out

    def time_decode(steps):
        run_decode(steps)  # compile
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            run_decode(steps)
            best = min(best, time.perf_counter() - t0)
        return best

    t32 = time_decode(tg // 4)
    t128 = time_decode(tg)
    decode_s_tok = (t128 - t32) / (tg - tg // 4)
    decode_tok_s = 1.0 / decode_s_tok
    roofline = HBM_GBS * 1e9 / _decode_bytes_per_token(c, rt, pp + tg // 2)
    return {
        "decode_tok_s": round(decode_tok_s, 2),
        "prefill_tok_s": round(prefill_tok_s, 2),
        "decode_roofline_pct": round(100 * decode_tok_s / roofline, 1),
        "decode_roofline_tok_s": round(roofline, 1),
        "prefill_mfu_pct": round(100 * mfu, 1),
    }


def _run_subprocess(preset: str, extra=()):
    """Bench one preset in a fresh process: each model gets the WHOLE
    HBM (running them in one process left qwen1.5-moe only 12 of its 24
    layers of room beside the 0.5B/7B pools) and a compile-cache-warm,
    allocation-clean chip."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, __file__, "--preset", preset, *extra],
        capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            r = json.loads(line)
            r.pop("metric", None)
            r.pop("unit", None)
            r.pop("model", None)
            r.pop("value", None)
            return r
    # surface the REAL exception: JAX appends a traceback-filtering notice
    # as the last stderr line, so scan for the last line that looks like an
    # error (exception type or OOM/Error text), falling back to the tail
    err_lines = [ln.strip() for ln in (proc.stderr or "").splitlines()
                 if ln.strip()]
    import re
    msg = None
    for ln in reversed(err_lines):
        if re.match(r"[A-Za-z_.]*(Error|Exception|Interrupt)\b", ln) or \
                re.search(r"RESOURCE_EXHAUSTED|Ran out of memory|OOM", ln):
            msg = ln
            break
    if msg is None:
        msg = err_lines[-1] if err_lines else f"exit {proc.returncode}"
    return {"error": msg[:300]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default=None,
                    help="bench only this preset (default: 0.5b + 7b + moe)")
    ap.add_argument("--pp", type=int, default=PP)
    ap.add_argument("--tg", type=int, default=TG)
    ap.add_argument("--kv-bits", type=int, default=8, dest="kv_bits")
    ap.add_argument("--w-bits", type=int, default=4, dest="w_bits")
    ap.add_argument("--q-block", type=int, default=128, dest="q_block")
    args = ap.parse_args()

    from mnn_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    if args.preset:
        r = bench_preset(args.preset, pp=args.pp, tg=args.tg,
                         kv_bits=args.kv_bits, w_bits=args.w_bits,
                         q_block=args.q_block)
        print(json.dumps({
            "metric": "decode_tok_s", "value": r["decode_tok_s"],
            "unit": "tok/s", "vs_baseline": round(
                r["decode_tok_s"] / BASELINE_DECODE, 2),
            "model": f"{args.preset} INT4 block128 asym, int8 KV, synthetic",
            **r,
        }))
        return

    small = _run_subprocess("qwen2-0.5b")
    big = _run_subprocess("qwen2-7b")
    moe = _run_subprocess("qwen1.5-moe-a2.7b")
    gemma = _run_subprocess("gemma2-2b")
    gemma3 = _run_subprocess("gemma3-4b")
    # long-context row: int4 KV halves decode KV traffic vs int8 at
    # pp2048 (reference TQ4-class sub-byte KV, CPUKVCacheManager.hpp:20)
    long8 = _run_subprocess("qwen2-0.5b", ("--pp", "2048"))
    long4 = _run_subprocess("qwen2-0.5b", ("--pp", "2048", "--kv-bits", "4"))
    # decode by weight bits (reference W2/W3/W4 table,
    # skills/metal-optimize/perf-playbook.md:206): fewer bits = fewer
    # bytes/token = faster decode at lower ppl fidelity
    w3 = _run_subprocess("qwen2-0.5b", ("--w-bits", "3"))
    w2 = _run_subprocess("qwen2-0.5b", ("--w-bits", "2"))
    # 7B at quant_block=256: the per-128-block dot/unpack granularity is
    # the measured 7B decode bottleneck (docs/perf_decode.md); this row
    # documents the coarser-block speed point next to the strict block128
    # headline
    b256 = _run_subprocess("qwen2-7b", ("--q-block", "256"))
    print(json.dumps({
        "metric": "decode_tok_s",
        "value": small.get("decode_tok_s"),
        "unit": "tok/s",
        "vs_baseline": round(
            small.get("decode_tok_s", 0) / BASELINE_DECODE, 2),
        "model": "qwen2-0.5b INT4 block128 asym, int8 KV, synthetic weights",
        "bench": f"pp{PP}+tg{TG}, greedy, batch 1, device-time differencing,"
                 f" best of {REPS}, one subprocess per preset",
        "prefill_tok_s": small.get("prefill_tok_s"),
        "prefill_vs_baseline": round(
            small.get("prefill_tok_s", 0) / BASELINE_PREFILL, 2),
        "decode_roofline_pct": small.get("decode_roofline_pct"),
        "prefill_mfu_pct": small.get("prefill_mfu_pct"),
        "qwen2_7b": big,
        "qwen1.5_moe_a2.7b": moe,
        "gemma2_2b": gemma,
        "gemma3_4b": gemma3,
        "longctx_pp2048_kv8": long8,
        "longctx_pp2048_kv4": long4,
        "w3_qwen2_0.5b": w3,
        "w2_qwen2_0.5b": w2,
        "w4_block256_qwen2_7b": b256,
        "baseline": "MNN Qwen2-0.5B INT4 iPhone 15 Pro"
                    " (51.36 decode / 234.51 prefill tok/s)",
    }))


if __name__ == "__main__":
    main()
