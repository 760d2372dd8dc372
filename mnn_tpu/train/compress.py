"""Quantization-aware training + pruning (mnncompress equivalent).

Equivalent of the reference's compression tooling
(/root/reference/tools/mnncompress/, ~9.1k LoC Python: pytorch/tf QAT and
structured/unstructured pruning whose parameters the converter consumes;
and the in-engine QAT transform tools/train/source/exec/
transformerExecution.cpp). TPU-native design: fake-quant and prune masks
are pure jax transforms with straight-through-estimator custom VJPs, so
they drop into any jax.grad training loop; the trained float weights
export through the normal quantize pipeline (quant/quantize.py), which
plays the role of mnncompress's "compression params" handoff.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# fake quantization with straight-through estimator

@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


_ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def _ste_to_bf16_grid(x: jax.Array, round_fn) -> jax.Array:
    """Snap x onto the bf16 storage grid (via quantize.py's covering
    rounding helpers) with a straight-through gradient: the bitcast-based
    rounders are non-differentiable, so the snap is applied as a
    stop-gradient delta."""
    return x + jax.lax.stop_gradient(round_fn(x) - x)


def fake_quant_weight(w: jax.Array, bits: int = 4, block_size: int = 128,
                      sym: bool = False) -> jax.Array:
    """Per-block asym/sym fake quantization of [K, N] weights, matching the
    inference quantizer's grid (quant/quantize.py) so QAT-trained weights
    land exactly on the deployed grid — INCLUDING the bf16 rounding of the
    stored scale/bias planes (scale covered toward +inf, wmin toward -inf),
    so there is zero train/deploy gap. Gradients flow straight through the
    rounding; scale/zero are recomputed from the live weights each step
    (LSQ-free min/max calibration, the reference mnncompress default).
    """
    from mnn_tpu.quant.quantize import _bf16_round_down, _bf16_round_up

    k, n = w.shape
    nb = k // block_size
    wb = w.reshape(nb, block_size, n)
    qmax = (1 << bits) - 1
    center = 1 << (bits - 1)
    if sym:
        amax = jnp.max(jnp.abs(wb), axis=1, keepdims=True)
        scale = jnp.where(amax == 0, 1.0, amax / (center - 1))
        scale = _ste_to_bf16_grid(scale, _bf16_round_up)
        q = jnp.clip(_ste_round(wb / scale) + center, 1, qmax)
        return ((q - center) * scale).reshape(k, n)
    lo = jnp.min(wb, axis=1, keepdims=True)
    lo = _ste_to_bf16_grid(lo, _bf16_round_down)
    hi = jnp.max(wb, axis=1, keepdims=True)
    scale = (hi - lo) / qmax
    scale = jnp.where(scale == 0, 1.0, scale)
    scale = _ste_to_bf16_grid(scale, _bf16_round_up)
    q = jnp.clip(_ste_round((wb - lo) / scale), 0, qmax)
    return (q * scale + lo).reshape(k, n)


def fake_quant_activation(x: jax.Array, bits: int = 8) -> jax.Array:
    """Per-token symmetric activation fake-quant (the deployed dynamic
    int8 activation path, CPUDynamicQuant analog)."""
    qmax = (1 << (bits - 1)) - 1
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    return jnp.clip(_ste_round(x / scale), -qmax - 1, qmax) * scale


def qat_linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None, *,
               bits: int = 4, block_size: int = 128, sym: bool = False,
               act_bits: int = 0) -> jax.Array:
    """Linear layer under QAT: fake-quantized weights (and optionally
    activations) in the forward, straight-through gradients to the float
    master weights."""
    wq = fake_quant_weight(w, bits=bits, block_size=block_size, sym=sym)
    xq = fake_quant_activation(x, act_bits) if act_bits else x
    y = jnp.dot(xq, wq, preferred_element_type=jnp.float32).astype(x.dtype)
    return y + b if b is not None else y


# ---------------------------------------------------------------------------
# pruning

@dataclasses.dataclass(frozen=True)
class PruneSpec:
    sparsity: float = 0.5          # fraction of weights removed
    structured: bool = False       # True: whole output channels
    block: int = 1                 # semi-structured n:m-style block on K


def prune_mask(w: jax.Array, spec: PruneSpec) -> jax.Array:
    """Magnitude mask (1 = keep). Unstructured, output-channel structured,
    or K-blocked (mirrors the reference's structured/unstructured modes in
    tools/mnncompress)."""
    if spec.structured:
        # remove lowest-L2 output channels (columns of [K, N])
        norms = jnp.linalg.norm(w, axis=0)
        n_drop = int(w.shape[1] * spec.sparsity)
        if n_drop == 0:
            return jnp.ones_like(w)
        thresh = jnp.sort(norms)[n_drop - 1]
        return jnp.broadcast_to((norms > thresh)[None], w.shape
                                ).astype(w.dtype)
    score = jnp.abs(w)
    if spec.block > 1:
        k, n = w.shape
        sb = score.reshape(k // spec.block, spec.block, n).sum(axis=1)
        score = jnp.repeat(sb, spec.block, axis=0)
    flat = score.reshape(-1)
    n_drop = int(flat.size * spec.sparsity)
    if n_drop == 0:
        return jnp.ones_like(w)
    thresh = jnp.sort(flat)[n_drop - 1]
    return (score > thresh).astype(w.dtype)


@jax.custom_vjp
def apply_mask(w, mask):
    return w * mask


def _mask_fwd(w, mask):
    return w * mask, mask


def _mask_bwd(mask, g):
    # gradient flows only to surviving weights (masked STE) — pruned
    # weights stay prunable across fine-tune steps
    return g * mask, None


apply_mask.defvjp(_mask_fwd, _mask_bwd)


def sparsity_of(mask: jax.Array) -> float:
    return float(1.0 - jnp.mean(mask))


# ---------------------------------------------------------------------------
# schedule helper (gradual magnitude pruning, Zhu & Gupta polynomial)

def gmp_sparsity(step: int, *, target: float, begin: int, end: int,
                 power: float = 3.0) -> float:
    """Gradual pruning schedule: 0 before `begin`, ramps to `target` by
    `end` with polynomial decay (the standard mnncompress-style ramp)."""
    if step <= begin:
        return 0.0
    if step >= end:
        return target
    frac = (step - begin) / max(end - begin, 1)
    return target * (1.0 - (1.0 - frac) ** power)
