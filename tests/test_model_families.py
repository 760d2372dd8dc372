"""Model-family converter coverage: Mistral and Phi-3 logits parity vs HF.

Extends the qwen2/llama round-trip gate (tests/test_convert.py) to the
other families the reference's llmexport.py model_mapper covers: Mistral
(llama keys + sliding window) and Phi-3 (fused qkv_proj / gate_up_proj).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mnn_tpu.runtime import kvcache
from mnn_tpu.models.decoder import forward

torch = pytest.importorskip("torch")


def _roundtrip(model, src_dir, tmp_path, ids, rel_tol=0.06):
    from mnn_tpu.convert.checkpoint import load_checkpoint
    from mnn_tpu.convert.hf import convert_hf

    out = str(tmp_path / "converted")
    convert_hf(src_dir, out, bits=8, block_size=32)
    config, params, rt = load_checkpoint(out)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.float().numpy()
    cache = kvcache.create(config.num_layers, 1, config.num_kv_heads, 64,
                           config.head_dim, quantized=False)
    got, _ = forward(params, config, jnp.asarray(ids, jnp.int32), cache,
                     all_logits=True)
    got = np.asarray(got, np.float32)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < rel_tol, rel
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.75, agree
    return config


class TestMistral:
    def test_logits_match(self, tmp_path):
        from transformers import MistralConfig, MistralForCausalLM
        cfg = MistralConfig(
            vocab_size=96, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, sliding_window=None,
            tie_word_embeddings=False, rope_theta=10000.0)
        torch.manual_seed(0)
        model = MistralForCausalLM(cfg).eval()
        d = tmp_path / "mistral"
        model.save_pretrained(d, safe_serialization=True)
        ids = np.array([[3, 9, 27, 81, 1, 5, 25, 93]], np.int64)
        out_cfg = _roundtrip(model, str(d), tmp_path, ids)
        assert out_cfg.attention_bias is False

    def test_sliding_window_config_parsed(self, tmp_path):
        from mnn_tpu.models.config import ModelConfig
        c = ModelConfig.from_hf_config({
            "architectures": ["MistralForCausalLM"], "vocab_size": 64,
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 1, "num_attention_heads": 2,
            "sliding_window": 1024})
        assert c.sliding_window == 1024


class TestGemma2:
    def test_logits_match(self, tmp_path):
        """Gemma2: sandwich norms, (1+w) RMSNorm, gelu-tanh MLP, embedding
        scaling, attn/final softcaps, query_pre_attn_scalar, alternating
        sliding window."""
        from transformers import Gemma2Config, Gemma2ForCausalLM
        cfg = Gemma2Config(
            vocab_size=96, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128,
            query_pre_attn_scalar=16, sliding_window=4,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            tie_word_embeddings=True, rope_theta=10000.0,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        cfg._attn_implementation = "eager"
        torch.manual_seed(2)
        model = Gemma2ForCausalLM(cfg).eval()
        d = tmp_path / "gemma2"
        model.save_pretrained(d, safe_serialization=True)
        # seq len 8 > sliding_window 4 so the alternating window matters
        ids = np.array([[2, 8, 32, 64, 90, 11, 45, 7]], np.int64)
        out_cfg = _roundtrip(model, str(d), tmp_path, ids)
        assert out_cfg.sandwich_norm and out_cfg.swa_every_other
        assert out_cfg.mlp_act == "gelu_tanh" and out_cfg.embed_scale
        assert out_cfg.attn_softcap == 50.0 and out_cfg.final_softcap == 30.0
        assert out_cfg.sliding_window == 4


class TestGemma3:
    def test_logits_match(self, tmp_path):
        """Gemma3: dual rope theta (local 10k on sliding layers, global 1M
        on every pattern-th layer), N:1 sliding/full pattern, qk-norm,
        sandwich norms, no softcaps."""
        from transformers import Gemma3TextConfig, Gemma3ForCausalLM
        cfg = Gemma3TextConfig(
            vocab_size=96, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128,
            query_pre_attn_scalar=16, sliding_window=4,
            sliding_window_pattern=2, layer_types=None,
            rope_theta=1000000.0, rope_local_base_freq=10000.0,
            tie_word_embeddings=True,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        cfg._attn_implementation = "eager"
        torch.manual_seed(3)
        model = Gemma3ForCausalLM(cfg).eval()
        d = tmp_path / "gemma3"
        model.save_pretrained(d, safe_serialization=True)
        # seq len 8 > sliding_window 4 so local windows + pattern matter
        ids = np.array([[2, 8, 32, 64, 90, 11, 45, 7]], np.int64)
        out_cfg = _roundtrip(model, str(d), tmp_path, ids)
        assert out_cfg.swa_pattern == 2
        assert out_cfg.rope_local_theta == 10000.0
        assert out_cfg.qk_norm and out_cfg.sandwich_norm
        assert out_cfg.sliding_window == 4

    def test_incremental_decode_matches_prefill(self, tmp_path):
        """gemma3 scan path: decode continuation == all-at-once prefill."""
        import jax
        from mnn_tpu.models.config import ModelConfig
        from mnn_tpu.models.decoder import init_random_params

        c = ModelConfig(
            name="g3", vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
            tie_word_embeddings=True, attention_bias=False, qk_norm=True,
            sandwich_norm=True, mlp_act="gelu_tanh", embed_scale=True,
            sliding_window=4, swa_pattern=2, rope_local_theta=10000.0,
            rope_theta=1000000.0)
        params = init_random_params(c, jax.random.PRNGKey(0), scale=0.05)
        toks = jnp.asarray([[5, 9, 2, 7, 11, 3, 8, 1]], jnp.int32)
        cache = kvcache.create(c.num_layers, 1, c.num_kv_heads, 32,
                               c.head_dim, quantized=False)
        want, _ = forward(params, c, toks, cache)
        cache2 = kvcache.create(c.num_layers, 1, c.num_kv_heads, 32,
                                c.head_dim, quantized=False)
        _, cache2 = forward(params, c, toks[:, :7], cache2)
        got, _ = forward(params, c, toks[:, 7:8], cache2)
        rel = np.linalg.norm(np.asarray(got - want, np.float32)) / \
            np.linalg.norm(np.asarray(want, np.float32))
        assert rel < 5e-3, rel


class TestGemma2Decode:
    def test_incremental_decode_matches_prefill(self):
        """Gemma's scan path with traced alternating windows must give the
        same logits token-by-token (decode, t=1) as one full prefill —
        the reference's TransformerTest property, on the gemma config."""
        import dataclasses
        import jax
        from mnn_tpu.models.config import PRESETS
        from mnn_tpu.models.decoder import forward, init_random_params
        from mnn_tpu.runtime import kvcache

        cfg = dataclasses.replace(
            PRESETS["tiny"], mlp_act="gelu_tanh", embed_scale=True,
            sandwich_norm=True, attn_softcap=30.0, final_softcap=20.0,
            query_scale=0.2, swa_every_other=True, sliding_window=4,
            attention_bias=False)
        params = init_random_params(cfg, jax.random.PRNGKey(0), quant_bits=8,
                                    scale=0.05)
        ids = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]

        def mkc():
            return kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 16,
                                  cfg.head_dim, quantized=False)

        full, _ = forward(params, cfg, jnp.asarray([ids], jnp.int32), mkc(),
                          all_logits=True)
        cache = mkc()
        step_logits = []
        for t in ids:
            lg, cache = forward(params, cfg, jnp.asarray([[t]], jnp.int32),
                                cache)
            step_logits.append(np.asarray(lg[0], np.float32))
        full = np.asarray(full[0], np.float32)
        np.testing.assert_allclose(np.stack(step_logits), full,
                                   atol=2e-2, rtol=2e-2)


class TestGemmaRaggedBatch:
    def test_per_slot_lengths_in_xla_attention(self):
        """Continuous batching: two gemma-path slots at DIFFERENT lengths
        must each decode as if alone (regression: the XLA attention used
        slot 0's length for every row)."""
        import dataclasses
        import jax
        from mnn_tpu.models.config import PRESETS
        from mnn_tpu.models.decoder import forward, init_random_params
        from mnn_tpu.runtime import kvcache

        cfg = dataclasses.replace(PRESETS["tiny"], attn_softcap=30.0)
        params = init_random_params(cfg, jax.random.PRNGKey(0), quant_bits=8,
                                    scale=0.05)

        def solo(prompt):
            cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 16,
                                   cfg.head_dim, quantized=False)
            lg, cache = forward(params, cfg,
                                jnp.asarray([prompt], jnp.int32), cache)
            lg, _ = forward(params, cfg, jnp.asarray(
                [[int(np.argmax(np.asarray(lg[0])))]], jnp.int32), cache)
            return np.asarray(lg[0], np.float32)

        a_prompt, b_prompt = [3, 1, 4, 1, 5, 9], [7, 7]
        want_a, want_b = solo(a_prompt), solo(b_prompt)

        # batched cache with ragged lengths: prefill each row separately
        cache = kvcache.create(cfg.num_layers, 2, cfg.num_kv_heads, 16,
                               cfg.head_dim, quantized=False)
        import mnn_tpu.runtime.kvcache as kvc
        c_a = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 16,
                             cfg.head_dim, quantized=False)
        la, c_a = forward(params, cfg, jnp.asarray([a_prompt], jnp.int32),
                          c_a)
        c_b = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 16,
                             cfg.head_dim, quantized=False)
        lb, c_b = forward(params, cfg, jnp.asarray([b_prompt], jnp.int32),
                          c_b)
        cache = dataclasses.replace(
            cache,
            k=cache.k.at[:, 0].set(c_a.k[:, 0]).at[:, 1].set(c_b.k[:, 0]),
            v=cache.v.at[:, 0].set(c_a.v[:, 0]).at[:, 1].set(c_b.v[:, 0]),
            length=jnp.asarray([len(a_prompt), len(b_prompt)], jnp.int32))
        toks = jnp.asarray([[int(np.argmax(np.asarray(la[0])))],
                            [int(np.argmax(np.asarray(lb[0])))]], jnp.int32)
        lg, _ = forward(params, cfg, toks, cache)
        got = np.asarray(lg, np.float32)
        np.testing.assert_allclose(got[0], want_a, atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(got[1], want_b, atol=2e-2, rtol=2e-2)


class TestQwen3Moe:
    def test_logits_match(self, tmp_path):
        """Qwen3-MoE (BASELINE config 5): routed experts without a shared
        expert, qk-norm, top-k prob normalization."""
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
        cfg = Qwen3MoeConfig(
            vocab_size=96, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=32, decoder_sparse_step=1,
            norm_topk_prob=True, tie_word_embeddings=False,
            max_position_embeddings=64, rope_theta=10000.0)
        torch.manual_seed(3)
        model = Qwen3MoeForCausalLM(cfg).eval()
        d = tmp_path / "q3moe"
        model.save_pretrained(d, safe_serialization=True)
        ids = np.array([[2, 8, 32, 64, 90, 11]], np.int64)
        out_cfg = _roundtrip(model, str(d), tmp_path, ids, rel_tol=0.08)
        assert out_cfg.is_moe and out_cfg.qk_norm
        assert out_cfg.shared_expert_intermediate_size == 0


class TestPhi3:
    def test_logits_match_fused_projections(self, tmp_path):
        from transformers import Phi3Config, Phi3ForCausalLM
        cfg = Phi3Config(
            vocab_size=96, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, sliding_window=None,
            tie_word_embeddings=False, rope_theta=10000.0,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        torch.manual_seed(1)
        model = Phi3ForCausalLM(cfg).eval()
        # confirm the checkpoint really uses fused keys (the converter must
        # slice them; regression guard against HF renaming)
        keys = model.state_dict().keys()
        assert any("qkv_proj" in k for k in keys)
        assert any("gate_up_proj" in k for k in keys)
        d = tmp_path / "phi3"
        model.save_pretrained(d, safe_serialization=True)
        ids = np.array([[2, 8, 32, 64, 90, 11, 45, 7]], np.int64)
        _roundtrip(model, str(d), tmp_path, ids)
