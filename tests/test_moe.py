"""MoE: logits vs HF Qwen2-MoE torch oracle; expert-parallel sharding."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache


class TestMoeVsTorch:
    def test_logits_match_qwen2_moe(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
        from mnn_tpu.convert.checkpoint import load_checkpoint
        from mnn_tpu.convert.hf import convert_hf

        cfg = Qwen2MoeConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=48, shared_expert_intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
            decoder_sparse_step=1, mlp_only_layers=[],
            max_position_embeddings=128, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        model = Qwen2MoeForCausalLM(cfg).eval()
        src = str(tmp_path / "hf")
        model.save_pretrained(src, safe_serialization=True)
        out = str(tmp_path / "conv")
        convert_hf(src, out, bits=8, block_size=16)
        config, params, _ = load_checkpoint(out)
        assert config.is_moe and config.num_experts == 4
        assert params.layers.wgu_e.packed.shape[:2] == (2, 4)

        ids = np.array([[5, 17, 99, 3, 42, 7, 64, 28]], np.int64)
        with torch.no_grad():
            want = model(torch.from_numpy(ids)).logits.float().numpy()
        cache = kvcache.create(config.num_layers, 1, config.num_kv_heads, 16,
                               config.head_dim, quantized=False)
        got, _ = forward(params, config, jnp.asarray(ids, jnp.int32), cache,
                         all_logits=True)
        got = np.asarray(got, np.float32)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.08, rel
        agree = (got.argmax(-1) == want.argmax(-1)).mean()
        assert agree >= 0.7, agree


class TestQwen3MoeVsTorch:
    def test_logits_match_qwen3_moe(self, tmp_path):
        """Driver config 5's family: qk-norm + routed experts, no shared
        expert, norm_topk_prob."""
        torch = pytest.importorskip("torch")
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
        from mnn_tpu.convert.checkpoint import load_checkpoint
        from mnn_tpu.convert.hf import convert_hf

        cfg = Qwen3MoeConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
            decoder_sparse_step=1, mlp_only_layers=[],
            max_position_embeddings=128, tie_word_embeddings=False,
        )
        torch.manual_seed(1)
        model = Qwen3MoeForCausalLM(cfg).eval()
        src = str(tmp_path / "hf")
        model.save_pretrained(src, safe_serialization=True)
        out = str(tmp_path / "conv")
        convert_hf(src, out, bits=8, block_size=16)
        config, params, _ = load_checkpoint(out)
        assert config.is_moe and config.qk_norm and config.norm_topk_prob
        assert params.layers.wgu_shared is None

        ids = np.array([[5, 17, 99, 3, 42, 7, 64, 28]], np.int64)
        with torch.no_grad():
            want = model(torch.from_numpy(ids)).logits.float().numpy()
        cache = kvcache.create(config.num_layers, 1, config.num_kv_heads, 16,
                               config.head_dim, quantized=False)
        got, _ = forward(params, config, jnp.asarray(ids, jnp.int32), cache,
                         all_logits=True)
        got = np.asarray(got, np.float32)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.08, rel
        agree = (got.argmax(-1) == want.argmax(-1)).mean()
        assert agree >= 0.7, agree


MOE_CFG = ModelConfig(
    name="tiny-moe", vocab_size=256, hidden_size=128, intermediate_size=256,
    num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
    tie_word_embeddings=True, attention_bias=True,
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
)


class TestMoeSharding:
    def test_expert_parallel_matches_single(self):
        from mnn_tpu.parallel import tp

        params = init_random_params(MOE_CFG, jax.random.PRNGKey(0),
                                    scale=0.05, tp_shards=4)
        toks = jnp.asarray(
            np.random.default_rng(1).integers(0, 200, (2, 8)), jnp.int32)
        cache = kvcache.create(MOE_CFG.num_layers, 2, MOE_CFG.num_kv_heads,
                               16, MOE_CFG.head_dim, quantized=False)
        want, _ = forward(params, MOE_CFG, toks, cache)

        mesh = tp.make_mesh(dp=1, tp=4)
        fwd = tp.make_sharded_forward(MOE_CFG, mesh, quantized_kv=False,
                                      params=params)
        got, _ = fwd(tp.shard_params(params, MOE_CFG, mesh), toks,
                     tp.shard_cache(cache, mesh))
        rel = np.linalg.norm(np.asarray(got - want, np.float32)) / \
            np.linalg.norm(np.asarray(want, np.float32))
        assert rel < 2e-2, rel

    def test_moe_decode_runs(self):
        params = init_random_params(MOE_CFG, jax.random.PRNGKey(0), scale=0.05)
        cache = kvcache.create(MOE_CFG.num_layers, 1, MOE_CFG.num_kv_heads,
                               16, MOE_CFG.head_dim, quantized=False)
        _, cache = forward(params, MOE_CFG,
                           jnp.asarray([[1, 2, 3]], jnp.int32), cache)
        logits, cache = forward(params, MOE_CFG,
                                jnp.asarray([[4]], jnp.int32), cache)
        assert logits.shape == (1, 256)
        assert np.isfinite(np.asarray(logits)).all()


class TestRoutedDecodePath:
    """The gathered top-k decode path (models/decoder.py _moe_mlp n<=8
    branch) must match the dense-dispatch formulation — same experts, same
    gate weights, different summation order only."""

    def test_routed_matches_dense(self):
        from mnn_tpu.models.decoder import _moe_mlp

        params = init_random_params(MOE_CFG, jax.random.PRNGKey(0),
                                    scale=0.05)
        lp = jax.tree_util.tree_map(lambda a: a[0], params.layers)
        for n in (1, 4):
            h2 = jax.random.normal(jax.random.PRNGKey(7), (n, 1, 128),
                                   jnp.float32) * 0.1
            routed = _moe_mlp(MOE_CFG, h2, lp, None, False)   # n <= 8
            # force dense-dispatch by padding above the n<=8 threshold
            h2_big = jnp.concatenate(
                [h2.reshape(n, 128)] + [jnp.zeros((9 - n, 128))]
            ).reshape(9, 1, 128)
            dense_big = _moe_mlp(MOE_CFG, h2_big, lp, None, False)
            want = np.asarray(dense_big[:n, 0], np.float32)
            got = np.asarray(routed[:, 0], np.float32)
            rel = np.linalg.norm(got - want) / max(
                np.linalg.norm(want), 1e-9)
            assert rel < 1e-5, (n, rel)

    def test_moe_prefill_then_routed_decode_consistent(self):
        """Decode continuation of a prefill agrees with an all-at-once
        prefill at the decode position (routed path vs dense path)."""
        params = init_random_params(MOE_CFG, jax.random.PRNGKey(0),
                                    scale=0.05)
        toks = jnp.asarray([[5, 3, 9, 2, 7]], jnp.int32)
        cache = kvcache.create(MOE_CFG.num_layers, 1, MOE_CFG.num_kv_heads,
                               16, MOE_CFG.head_dim, quantized=False)
        want, _ = forward(params, MOE_CFG, toks, cache)
        cache2 = kvcache.create(MOE_CFG.num_layers, 1, MOE_CFG.num_kv_heads,
                                16, MOE_CFG.head_dim, quantized=False)
        _, cache2 = forward(params, MOE_CFG, toks[:, :4], cache2)
        got, _ = forward(params, MOE_CFG, toks[:, 4:5], cache2)
        rel = np.linalg.norm(np.asarray(got - want, np.float32)) / \
            np.linalg.norm(np.asarray(want, np.float32))
        assert rel < 5e-3, rel
