"""Perplexity delta of W4A8 (prefill dynamic int8 activations) vs W4A16.

The reference measures its quantization modes by perplexity delta against
FP16 (transformers/llm/eval/); this is the in-env analog with the torch
oracle as FP ground truth (no pretrained checkpoints in this environment,
so the model is a seeded random HF Qwen2 — the delta between activation
precisions is the quantity of interest, reference: MergeDynamicQuant /
DYNAMIC_QUANT_OPTIONS, Interpreter.hpp:219-222).
"""

import dataclasses
import math

import numpy as np
import pytest

import jax


class TestActQuantPpl:
    def test_w4a8_ppl_close_to_w4a16(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import Qwen2Config, Qwen2ForCausalLM

        from mnn_tpu.convert.checkpoint import load_checkpoint
        from mnn_tpu.convert.hf import convert_hf
        from mnn_tpu.runtime.evaluate import perplexity
        from mnn_tpu.runtime.generate import prefill_params_view
        from mnn_tpu.models.config import RuntimeConfig

        cfg = Qwen2Config(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        model = Qwen2ForCausalLM(cfg).eval()
        src = str(tmp_path / "hf")
        model.save_pretrained(src, safe_serialization=True)
        out = str(tmp_path / "conv")
        convert_hf(src, out, bits=4, block_size=32)
        config, params, _ = load_checkpoint(out)

        rng = np.random.default_rng(3)
        ids = rng.integers(0, 256, 192).tolist()

        # FP ground truth from the torch oracle
        with torch.no_grad():
            t_ids = torch.tensor([ids])
            lg = model(t_ids).logits.float()
            lp = torch.log_softmax(lg[0, :-1], dim=-1)
            nll = -lp.gather(1, t_ids[0, 1:, None]).sum().item()
        ppl_fp = math.exp(nll / (len(ids) - 1))

        ppl_a16 = perplexity(params, config, ids, chunk=64)
        params8 = prefill_params_view(
            params, RuntimeConfig(prefill_act_bits=8))
        ppl_a8 = perplexity(params8, config, ids, chunk=64)

        d16 = abs(ppl_a16 - ppl_fp) / ppl_fp
        d8 = abs(ppl_a8 - ppl_fp) / ppl_fp
        print(f"ppl fp={ppl_fp:.4f} w4a16={ppl_a16:.4f} ({100*d16:.2f}%) "
              f"w4a8={ppl_a8:.4f} ({100*d8:.2f}%)")
        # activation quantization must not add more than ~2x the weight
        # quantization's own delta (both are small on this model)
        assert d16 < 0.05, d16
        assert d8 < 0.08, d8
        assert abs(ppl_a8 - ppl_a16) / ppl_a16 < 0.05, (ppl_a16, ppl_a8)
