"""Converter correctness: HF torch model as the numerics oracle.

Mirrors the reference's converter round-trip gate
(/root/reference/tools/script/testMNNFromOnnx.py etc.: run the source
framework and the converted model on the same inputs and diff outputs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnn_tpu.models.config import PRESETS, RuntimeConfig
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        rope_theta=10000.0,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("hfqwen2")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


class TestConvert:
    def test_logits_match_torch(self, hf_model_dir, tmp_path):
        torch = pytest.importorskip("torch")
        src, model = hf_model_dir
        from mnn_tpu.convert.checkpoint import load_checkpoint
        from mnn_tpu.convert.hf import convert_hf

        out = str(tmp_path / "converted")
        convert_hf(src, out, bits=8, block_size=32)
        config, params, rt = load_checkpoint(out)
        assert config.num_layers == 2 and config.vocab_size == 128

        ids = np.array([[5, 17, 99, 3, 42, 7, 64, 28]], np.int64)
        with torch.no_grad():
            want = model(torch.from_numpy(ids)).logits.float().numpy()

        cache = kvcache.create(config.num_layers, 1, config.num_kv_heads, 32,
                               config.head_dim, quantized=False)
        got, _ = forward(params, config, jnp.asarray(ids, jnp.int32), cache,
                         all_logits=True)
        got = np.asarray(got, np.float32)

        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.06, rel
        # top-1 agreement on most positions (int8+bf16 noise tolerated)
        agree = (got.argmax(-1) == want.argmax(-1)).mean()
        assert agree >= 0.75, agree

    def test_int4_still_reasonable(self, hf_model_dir, tmp_path):
        torch = pytest.importorskip("torch")
        src, model = hf_model_dir
        from mnn_tpu.convert.checkpoint import load_checkpoint
        from mnn_tpu.convert.hf import convert_hf

        out = str(tmp_path / "conv4")
        convert_hf(src, out, bits=4, block_size=32)
        config, params, rt = load_checkpoint(out)
        ids = np.array([[5, 17, 99, 3, 42, 7, 64, 28]], np.int64)
        with torch.no_grad():
            want = model(torch.from_numpy(ids)).logits.float().numpy()
        cache = kvcache.create(config.num_layers, 1, config.num_kv_heads, 32,
                               config.head_dim, quantized=False)
        got, _ = forward(params, config, jnp.asarray(ids, jnp.int32), cache,
                         all_logits=True)
        rel = np.linalg.norm(np.asarray(got, np.float32) - want) / np.linalg.norm(want)
        assert rel < 0.5, rel  # int4 on random (structureless) weights is noisy

    def test_generate_from_converted(self, hf_model_dir, tmp_path):
        src, _ = hf_model_dir
        from mnn_tpu.convert.hf import convert_hf
        from mnn_tpu.runtime.llm import Llm

        out = str(tmp_path / "convgen")
        convert_hf(src, out, bits=8, block_size=32)
        rt = RuntimeConfig(max_seq_len=64, prefill_chunk=32, decode_block=4,
                           sampler="greedy", kv_quant=False)
        llm = Llm.from_pretrained(out, rt=rt)
        toks = list(llm.stream(token_ids=[1, 2, 3], max_new_tokens=6))
        assert len(toks) >= 1


class TestCheckpointRoundtrip:
    def test_save_load_identity(self, tmp_path):
        from mnn_tpu.convert.checkpoint import load_checkpoint, save_checkpoint

        cfg = PRESETS["tiny"]
        params = init_random_params(cfg, jax.random.PRNGKey(0))
        d = str(tmp_path / "ckpt")
        save_checkpoint(d, cfg, params, RuntimeConfig(quant_bits=4))
        cfg2, params2, rt2 = load_checkpoint(d)
        assert cfg2 == cfg
        assert rt2.quant_bits == 4
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert params2.layers.wqkv.bits == params.layers.wqkv.bits
        assert params2.layers.wqkv.block_size == params.layers.wqkv.block_size


class TestQuantizedLmHead:
    def test_quantized_head_matches_bf16(self, hf_model_dir, tmp_path):
        torch = pytest.importorskip("torch")
        src, model = hf_model_dir
        from mnn_tpu.convert.checkpoint import load_checkpoint
        from mnn_tpu.convert.hf import convert_hf
        from mnn_tpu.quant.quantize import QuantizedLinear

        out = str(tmp_path / "qhead")
        convert_hf(src, out, bits=8, block_size=32, lm_head_bits=8)
        config, params, _ = load_checkpoint(out)
        assert isinstance(params.lm_head, QuantizedLinear)

        ids = np.array([[5, 17, 99, 3]], np.int64)
        with torch.no_grad():
            want = model(torch.from_numpy(ids)).logits.float().numpy()
        cache = kvcache.create(config.num_layers, 1, config.num_kv_heads, 8,
                               config.head_dim, quantized=False)
        got, _ = forward(params, config, jnp.asarray(ids, jnp.int32), cache,
                         all_logits=True)
        rel = np.linalg.norm(np.asarray(got, np.float32) - want) / \
            np.linalg.norm(want)
        assert rel < 0.08, rel
