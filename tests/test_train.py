"""Training: LoRA finetune overfits, merge_lora preserves behavior,
generic CNN training converges."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mnn_tpu.models.config import PRESETS
from mnn_tpu.models.decoder import forward, init_random_params
from mnn_tpu.runtime import kvcache
from mnn_tpu.train import (
    cross_entropy_loss,
    init_lora,
    lm_loss,
    make_lora_train_step,
    make_optimizer,
    make_train_step,
    merge_lora,
)

CFG = PRESETS["tiny"]


class TestLora:
    def test_zero_init_is_identity(self):
        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
        lora = init_lora(CFG, jax.random.PRNGKey(1), rank=4)
        toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 8,
                               CFG.head_dim, quantized=False)
        base, _ = forward(params, CFG, toks, cache)
        with_lora, _ = forward(params, CFG, toks, cache, lora=lora)
        np.testing.assert_allclose(
            np.asarray(base, np.float32), np.asarray(with_lora, np.float32),
            rtol=1e-5,
        )

    def test_finetune_reduces_loss(self):
        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05)
        lora = init_lora(CFG, jax.random.PRNGKey(1), rank=4, targets=("qkv", "gu"))
        opt = make_optimizer("adamw", lr=5e-3)
        step = make_lora_train_step(CFG, opt)
        opt_state = opt.init(lora)
        toks = jnp.asarray(
            np.random.default_rng(0).integers(0, 200, (2, 16)), jnp.int32)
        losses = []
        for _ in range(12):
            lora, opt_state, loss = step(params, lora, opt_state, toks)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.9, losses

    def test_merge_lora_matches_adapter_forward(self):
        params = init_random_params(CFG, jax.random.PRNGKey(0), scale=0.05,
                                    quant_bits=8)
        lora = init_lora(CFG, jax.random.PRNGKey(1), rank=4)
        # give the adapters nonzero B so the delta is real
        lora = dataclasses.replace(
            lora,
            b_qkv=jax.random.normal(jax.random.PRNGKey(2),
                                    lora.b_qkv.shape) * 0.01,
        )
        toks = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        cache = kvcache.create(CFG.num_layers, 1, CFG.num_kv_heads, 8,
                               CFG.head_dim, quantized=False)
        want, _ = forward(params, CFG, toks, cache, lora=lora)
        merged = merge_lora(params, lora)
        got, _ = forward(merged, CFG, toks, cache)
        rel = np.linalg.norm(np.asarray(got - want, np.float32)) / np.linalg.norm(
            np.asarray(want, np.float32))
        assert rel < 5e-2, rel  # requantization noise bound (int8)


class TestGenericTraining:
    def test_cnn_overfits_toy_batch(self):
        torch = pytest.importorskip("torch")
        import torch.nn as nn

        from mnn_tpu.convert.torch_fx import convert_torch_module

        torch.manual_seed(0)
        mod = nn.Sequential(
            nn.Conv2d(1, 8, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Flatten(), nn.Linear(8 * 4 * 4, 4),
        )
        fn, params = convert_torch_module(mod)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((16, 1, 8, 8)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 4, 16), jnp.int32)

        def loss_fn(params, batch):
            logits = fn(params, batch[0])
            return cross_entropy_loss(logits, batch[1])

        opt = make_optimizer("adam", lr=1e-2)
        step = make_train_step(loss_fn, opt)
        opt_state = opt.init(params)
        losses = []
        for _ in range(30):
            params, opt_state, loss = step(params, opt_state, (x, y))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])
        acc = (np.asarray(fn(params, x)).argmax(-1) == np.asarray(y)).mean()
        assert acc >= 0.8
