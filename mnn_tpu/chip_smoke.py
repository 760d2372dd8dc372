"""Real-chip smoke gate for megakernel VMEM plans at long-context shapes.

Round 4 shipped a deterministic scoped-VMEM OOM (16.01M/16.00M) in the
fused decode kernel at cache capacity 4096 with int4 KV: the CPU test
suite runs the Pallas interpreter, which enforces no VMEM limit, so
nothing gated the regression. This stage compiles AND executes one real
decode step for each (capacity, kv_bits) corner on the actual TPU, where
Mosaic's scoped-vmem check is live. Run via `./test.sh tpu-longctx`
(default-off: needs a chip; the driver can run it before benching).

Reference analog: MNN's on-device test stages in test.sh/test_stages.json
exercise the real backends precisely because the CPU oracle cannot see
backend-only resource limits.
"""

from __future__ import annotations

import sys


def smoke(preset: str = "qwen2-0.5b", caps=(1024, 4096), kv_bits=(8, 4),
          pp: int = 16, steps: int = 3) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mnn_tpu.models.config import PRESETS, RuntimeConfig
    from mnn_tpu.models.decoder import init_random_params
    from mnn_tpu.runtime import generate as gen
    from mnn_tpu.runtime import kvcache, sampler

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"chip_smoke: default backend is {jax.default_backend()!r}, "
              "not a TPU — refusing to pass vacuously", file=sys.stderr)
        return 2

    c = PRESETS[preset]
    rt0 = RuntimeConfig(quant_bits=4, quant_block=128, lm_head_bits=4)
    params = init_random_params(
        c, jax.random.PRNGKey(0), quant_bits=rt0.quant_bits,
        quant_block=rt0.quant_block, lm_head_bits=rt0.lm_head_bits,
        fast=True)
    tokens = jnp.zeros((1, pp), jnp.int32)
    failures = 0
    for cap in caps:
        for kvb in kv_bits:
            tag = f"{preset} cap={cap} kv{kvb}"
            try:
                rt = RuntimeConfig(
                    max_seq_len=cap, prefill_chunk=pp, decode_block=steps,
                    sampler="greedy", kv_quant=True, kv_bits=kvb,
                    quant_bits=4, quant_block=128, lm_head_bits=4)
                cache0 = kvcache.create(
                    c.num_layers, 1, c.num_kv_heads, cap, c.head_dim,
                    quantized=True, kv_bits=kvb)
                logits, cache = gen.run_prefill(params, c, rt, tokens, cache0)
                state = sampler.make_state(1)
                out = gen.decode_steps(
                    params, c, cache, logits, state, jax.random.PRNGKey(0),
                    steps=steps, sampler="greedy")
                toks = np.asarray(out[0])
                assert toks.shape[-1] == steps and np.all(toks >= 0), toks
                print(f"ok   {tag}: tokens {toks.ravel().tolist()}")
            except Exception as e:  # noqa: BLE001 — report every corner
                failures += 1
                msg = str(e).split("\n")[0][:200]
                print(f"FAIL {tag}: {type(e).__name__}: {msg}",
                      file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    preset = sys.argv[1] if len(sys.argv) > 1 else "qwen2-0.5b"
    sys.exit(smoke(preset))
