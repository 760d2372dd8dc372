"""Training utilities: losses, optimizers (optax), jitted train steps.

Equivalent of the reference's training stack (tools/train: per-op grad
registry source/grad/, SGD/ADAM + schedules source/optimizer/, loss
builders) collapsed onto jax.grad + optax — autodiff and optimizers are
native here, so this layer is deliberately thin (SURVEY.md §2.14).

Two entry points:
* generic models (e.g. torch.fx-converted CNNs): `make_train_step(loss_fn,
  optimizer)` differentiates the whole params pytree;
* quantized LLMs: `make_lora_train_step` differentiates ONLY the LoRA
  adapters (base weights frozen packed int4/int8); the fused dequant-matmul
  has a custom VJP for dx, and training forces the differentiable XLA
  attention path (interpret=False).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from mnn_tpu.models.config import ModelConfig
from mnn_tpu.models.decoder import LoraParams, Params, forward
from mnn_tpu.runtime import kvcache


def cross_entropy_loss(logits, labels, label_smoothing: float = 0.0):
    """logits [..., C] float, labels [...] int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    c = logits.shape[-1]
    if label_smoothing:
        onehot = jax.nn.one_hot(labels, c)
        target = onehot * (1 - label_smoothing) + label_smoothing / c
        return -(target * logp).sum(-1).mean()
    nll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -nll.mean()


def make_optimizer(
    name: str = "adamw",
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    schedule: Optional[str] = None,
    total_steps: int = 1000,
    warmup_steps: int = 0,
):
    """MNN-style optimizer config (SGD/ADAM + LR schedules) on optax."""
    if schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps)
    elif schedule == "exponential":
        lr = optax.exponential_decay(lr, total_steps // 10 or 1, 0.9)
    if name == "sgd":
        return optax.sgd(lr, momentum=0.9)
    if name == "adam":
        return optax.adam(lr)
    if name == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay)
    raise ValueError(f"unknown optimizer {name}")


def make_train_step(loss_fn: Callable, optimizer):
    """Generic: loss_fn(params, batch) -> scalar. Returns jitted step."""

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def lm_loss(
    params: Params,
    lora: Optional[LoraParams],
    config: ModelConfig,
    tokens: jax.Array,     # [B, T] full sequences (input+target shifted)
    cache_template=None,
):
    """Teacher-forced next-token loss over [B, T] batches."""
    b, t = tokens.shape
    cache = cache_template or kvcache.create(
        config.num_layers, b, config.num_kv_heads, t, config.head_dim,
        quantized=False,
    )
    logits, _ = forward(
        params, config, tokens, cache, all_logits=True, interpret=False,
        lora=lora,
    )
    return cross_entropy_loss(logits[:, :-1], tokens[:, 1:])


def make_lora_train_step(config: ModelConfig, optimizer):
    """LoRA finetune step: only adapters receive gradients."""

    @jax.jit
    def step(params, lora, opt_state, tokens):
        def loss_fn(lora):
            return lm_loss(params, lora, config, tokens)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step
