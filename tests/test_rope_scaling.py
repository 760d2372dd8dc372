"""Llama-3 rope frequency rescale vs the HF transformers oracle.

= the reference's model_mapper per-family rope handling
(/root/reference/transformers/llm/export/utils/model_mapper.py): Llama-3.x
checkpoints carry rope_scaling{"rope_type": "llama3"} and produce wrong
long-context positions without it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mnn_tpu.models.config import ModelConfig, _parse_rope_scaling
from mnn_tpu.models.layers import rope_cos_sin


class TestRopeScaling:
    def test_matches_transformers(self):
        torch = pytest.importorskip("torch")
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

        class Cfg:
            rope_theta = 500000.0
            head_dim = 64
            hidden_size = 2048
            num_attention_heads = 32
            partial_rotary_factor = 1.0
            max_position_embeddings = 131072
            rope_scaling = {
                "rope_type": "llama3", "factor": 32.0,
                "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                "original_max_position_embeddings": 8192,
            }

        inv_freq, _ = ROPE_INIT_FUNCTIONS["llama3"](Cfg(), "cpu")
        want = inv_freq.numpy()

        positions = jnp.asarray([[1]], jnp.int32)
        cos, sin = rope_cos_sin(
            positions, 64, 500000.0, scaling=(32.0, 1.0, 4.0, 8192)
        )
        # at position 1, angle == freq
        angles = np.arctan2(np.asarray(sin[0, 0]), np.asarray(cos[0, 0]))
        np.testing.assert_allclose(angles, want, rtol=1e-5)

    def test_parse(self):
        assert _parse_rope_scaling(None) is None
        assert _parse_rope_scaling({"rope_type": "default"}) is None
        got = _parse_rope_scaling({
            "rope_type": "llama3", "factor": 32.0,
            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        })
        assert got == (32.0, 1.0, 4.0, 8192)
        with pytest.raises(ValueError):
            _parse_rope_scaling({"rope_type": "yarn", "factor": 2.0})

    def test_hf_config_mapping(self):
        c = ModelConfig.from_hf_config({
            "architectures": ["LlamaForCausalLM"],
            "vocab_size": 128256, "hidden_size": 2048,
            "intermediate_size": 8192, "num_hidden_layers": 16,
            "num_attention_heads": 32, "num_key_value_heads": 8,
            "head_dim": 64, "rope_theta": 500000.0,
            "rope_scaling": {
                "rope_type": "llama3", "factor": 32.0,
                "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                "original_max_position_embeddings": 8192,
            },
            "tie_word_embeddings": True,
        }, name="llama32")
        assert c.rope_scaling == (32.0, 1.0, 4.0, 8192)

    def test_mistral_sliding_window(self):
        c = ModelConfig.from_hf_config({
            "architectures": ["MistralForCausalLM"],
            "vocab_size": 32000, "hidden_size": 4096,
            "intermediate_size": 14336, "num_hidden_layers": 32,
            "num_attention_heads": 32, "num_key_value_heads": 8,
            "sliding_window": 4096,
        }, name="mistral")
        assert c.sliding_window == 4096
