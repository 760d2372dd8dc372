"""Fused MoE decode kernel (kernels/moe_decode.py) vs the scan reference.

The fused kernel must reproduce the routed top-k + shared-expert MLP that
the layer-scan path computes (models/decoder._moe_mlp), within
quantization-algebra noise: same experts, same routing weights, same
bf16 rounding points as the dense per-layer kernels.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mnn_tpu.kernels import moe_decode
from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import _moe_mlp, forward, init_random_params
from mnn_tpu.runtime import kvcache

CFG = ModelConfig(
    name="tiny-moe-d64", vocab_size=256, hidden_size=128,
    intermediate_size=256, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=64, tie_word_embeddings=True, attention_bias=True,
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
    shared_expert_intermediate_size=128, norm_topk_prob=False,
)
CFG_NOSHARED = dataclasses.replace(
    CFG, name="tiny-moe-ns", shared_expert_intermediate_size=0,
    norm_topk_prob=True)


def _params(cfg):
    return init_random_params(cfg, jax.random.PRNGKey(0), scale=0.05)


class TestMoeDecodeKernel:
    def test_supports(self):
        p = _params(CFG)
        assert moe_decode.supports(CFG, p.layers, 1)
        assert moe_decode.supports(CFG, p.layers, 8)
        assert not moe_decode.supports(CFG, p.layers, 9)

    def test_kernel_matches_moe_mlp(self):
        for cfg in (CFG, CFG_NOSHARED):
            p = _params(cfg)
            for n in (1, 3):
                h2 = jax.random.normal(
                    jax.random.PRNGKey(7), (n, 1, cfg.hidden_size),
                    jnp.float32) * 0.1
                for li in range(cfg.num_layers):
                    lp = jax.tree_util.tree_map(lambda a: a[li], p.layers)
                    want = np.asarray(
                        _moe_mlp(cfg, h2, lp, None, True), np.float32)
                    from mnn_tpu.models.decoder import _moe_mlp_fused
                    got = np.asarray(
                        _moe_mlp_fused(cfg, h2, p.layers, jnp.int32(li),
                                       True), np.float32)
                    rel = np.linalg.norm(got - want) / max(
                        np.linalg.norm(want), 1e-9)
                    assert rel < 2e-2, (cfg.name, n, li, rel)

    def test_forward_decode_matches_scan(self):
        """End-to-end: the unrolled+fused MoE decode path vs the forced
        layer-scan path, per step from the same cache state."""
        for cfg in (CFG, CFG_NOSHARED):
            p = _params(cfg)
            cache = kvcache.create(cfg.num_layers, 1, cfg.num_kv_heads, 64,
                                   cfg.head_dim, quantized=True)
            toks = jax.random.randint(jax.random.PRNGKey(1), (1, 7), 0,
                                      cfg.vocab_size, jnp.int32)
            _, cache = forward(p, cfg, toks, cache, interpret=False)
            tok = jnp.asarray([[3]], jnp.int32)
            for _ in range(2):
                ref, _ = forward(p, cfg, tok, cache, interpret=True,
                                 layer_scan=True)
                got, cache = forward(p, cfg, tok, cache, interpret=True)
                r = np.asarray(ref, np.float32)
                g = np.asarray(got, np.float32)
                assert np.isfinite(g).all()
                rel = np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-9)
                assert rel < 2e-2, (cfg.name, rel)
                tok = jnp.argmax(got, axis=-1).astype(jnp.int32)[:, None]
