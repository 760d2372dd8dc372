"""Driver benchmark: Qwen2-0.5B INT4 + int8 KV, pp512 + tg128 on one chip.

Mirrors the reference's llm_bench pp/tg methodology
(/root/reference/transformers/llm/engine/app/llm_benchmark.cpp, results at
docs/transformers/llm.md:690-745). Baseline for vs_baseline is the
reference's published Qwen2-0.5B-instruct INT4 decode on iPhone 15 Pro
(51.36 tok/s, transformers/llm/engine/ios/README.md:52-53) — same model,
same bit-width, their flagship published number for this config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

PP, TG, RUNS = 512, 128, 3
BASELINE_DECODE = 51.36   # tok/s, reference published (see module docstring)
BASELINE_PREFILL = 234.51


def main():
    from mnn_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from mnn_tpu.models.config import RuntimeConfig
    from mnn_tpu.runtime.llm import Llm

    rt = RuntimeConfig(
        max_seq_len=1024, prefill_chunk=512, decode_block=32,
        sampler="greedy", kv_quant=True, quant_bits=4, quant_block=128,
        lm_head_bits=4,
    )
    llm = Llm.synthetic("qwen2-0.5b", rt=rt)
    ids = list(range(PP))

    best_prefill = best_decode = 0.0
    for _ in range(RUNS + 1):  # first run includes compile; keep best
        llm.reset()
        for _tok in llm.stream(token_ids=ids, max_new_tokens=TG):
            pass
        best_prefill = max(best_prefill, llm.perf.prefill_tok_s)
        best_decode = max(best_decode, llm.perf.decode_tok_s)

    print(json.dumps({
        "metric": "decode_tok_s",
        "value": round(best_decode, 2),
        "unit": "tok/s",
        "vs_baseline": round(best_decode / BASELINE_DECODE, 2),
        "model": "qwen2-0.5b INT4 block128 asym, int8 KV, synthetic weights",
        "bench": f"pp{PP}+tg{TG}, greedy, batch 1, best of {RUNS}",
        "prefill_tok_s": round(best_prefill, 2),
        "prefill_vs_baseline": round(best_prefill / BASELINE_PREFILL, 2),
        "baseline": "MNN Qwen2-0.5B INT4 iPhone 15 Pro (51.36 decode / 234.51 prefill tok/s)",
    }))


if __name__ == "__main__":
    main()
