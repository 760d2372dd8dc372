"""Driver benchmark: Qwen2-0.5B INT4 + int8 KV, pp512 + tg128 on one chip.

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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np

PP, TG, REPS = 512, 128, 5
BASELINE_DECODE = 51.36   # tok/s, reference published (see module docstring)
BASELINE_PREFILL = 234.51


def main():
    from mnn_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mnn_tpu.models.config import PRESETS, RuntimeConfig
    from mnn_tpu.models.decoder import init_random_params
    from mnn_tpu.runtime import generate as gen
    from mnn_tpu.runtime import kvcache, sampler

    c = PRESETS["qwen2-0.5b"]
    rt = RuntimeConfig(
        max_seq_len=1024, prefill_chunk=PP, decode_block=TG,
        sampler="greedy", kv_quant=True, quant_bits=4, quant_block=128,
        lm_head_bits=4,
    )
    params = init_random_params(
        c, jax.random.PRNGKey(0), quant_bits=rt.quant_bits,
        quant_block=rt.quant_block, lm_head_bits=rt.lm_head_bits, fast=True,
    )
    cache0 = kvcache.create(
        c.num_layers, 1, c.num_kv_heads, rt.max_seq_len, c.head_dim,
        quantized=rt.kv_quant,
    )
    tokens = jnp.zeros((1, PP), jnp.int32)

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
    prefill_tok_s = PP / prefill_s

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

    t32 = time_decode(TG // 4)
    t128 = time_decode(TG)
    decode_s_tok = (t128 - t32) / (TG - TG // 4)
    decode_tok_s = 1.0 / decode_s_tok

    print(json.dumps({
        "metric": "decode_tok_s",
        "value": round(decode_tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(decode_tok_s / BASELINE_DECODE, 2),
        "model": "qwen2-0.5b INT4 block128 asym, int8 KV, synthetic weights",
        "bench": f"pp{PP}+tg{TG}, greedy, batch 1, device-time differencing,"
                 f" best of {REPS}",
        "prefill_tok_s": round(prefill_tok_s, 2),
        "prefill_vs_baseline": round(prefill_tok_s / BASELINE_PREFILL, 2),
        "baseline": "MNN Qwen2-0.5B INT4 iPhone 15 Pro"
                    " (51.36 decode / 234.51 prefill tok/s)",
    }))


if __name__ == "__main__":
    main()
