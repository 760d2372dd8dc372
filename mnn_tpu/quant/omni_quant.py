"""OmniQuant: gradient-learned quantization parameters.

Capability parity with the reference's OmniQuant implementation
(/root/reference/transformers/llm/export/utils/omni_quantizer.py, ~1k LoC
torch): instead of heuristic grid search, the two quantization transforms
are LEARNED by minimizing layer reconstruction error on calibration
activations —

  * LWC (learnable weight clipping): per-(block, column) factors
    gamma, beta in (0, 1] shrink the quant range [wmin, wmax] to
    [sigmoid(beta)*wmin, sigmoid(gamma)*wmax]; clipping outliers buys a
    finer grid for the bulk exactly where the data says it pays;
  * LET (learnable equivalent transformation): a per-input-channel scale
    s moves quantization difficulty between activations and weights,
    y = (x / s) @ Q(s ⊙ W) — the learnable generalization of
    SmoothQuant/AWQ folding (the fold targets are the same as
    quant/awq_search.py's and stay float-exact).

TPU-native: the whole optimization is one jit-compiled optax loop over a
straight-through-estimator fake quant (train/compress.py machinery); the
final weights are emitted through the standard quantize() so the deployed
checkpoint keeps every format invariant (bf16 covering-rounded planes).
Independent implementation from the published OmniQuant algorithm (Shao
et al., ICLR 2024); the reference file is cited for capability parity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.quant.quantize import QuantizedLinear, choose_block_size, quantize
from mnn_tpu.train.compress import _ste_round


def _fake_quant_clipped(w, g_logit, b_logit, bits: int, bs: int,
                        sym: bool) -> jax.Array:
    """Fake-quantize [K, N] with learnable clip factors [K//bs, N]."""
    k, n = w.shape
    nb = k // bs
    wb = w.reshape(nb, bs, n)
    qmax = (1 << bits) - 1
    gamma = jax.nn.sigmoid(g_logit)[:, None, :]       # (0, 1]
    if sym:
        amax = jnp.max(jnp.abs(wb), axis=1, keepdims=True) * gamma
        center = 1 << (bits - 1)
        scale = jnp.maximum(amax / (center - 1), 1e-8)
        q = jnp.clip(_ste_round(wb / scale), -(center - 1), center - 1)
        return (q * scale).reshape(k, n)
    beta = jax.nn.sigmoid(b_logit)[:, None, :]
    hi = jnp.max(wb, axis=1, keepdims=True)
    lo = jnp.min(wb, axis=1, keepdims=True)
    hi = jnp.where(hi > 0, hi * gamma, hi)
    lo = jnp.where(lo < 0, lo * beta, lo)
    scale = jnp.maximum((hi - lo) / qmax, 1e-8)
    q = jnp.clip(_ste_round((wb - lo) / scale), 0, qmax)
    return (q * scale + lo).reshape(k, n)


def omni_quantize(
    w,                         # [K, N] float weights
    x,                         # [S, K] calibration inputs
    *,
    bits: int = 4,
    block_size: int = 128,
    sym: bool = False,
    let: bool = True,          # learn the equivalent input scaling too
    iters: int = 200,
    lr: float = 5e-2,
    out_bias=None,
    act_bits: int = 16,
) -> Tuple[QuantizedLinear, jax.Array]:
    """Learn (clipping[, equivalent scale]) minimizing ||x'@Q(w') - x@w||².

    Returns (QuantizedLinear of the transformed weights, s [K]): callers
    that deploy the LET scale must fold 1/s into the producing op exactly
    as with AWQ scales (quant/awq_search.awq_scale_block fold targets);
    with let=False, s is all-ones and the result drops in directly.
    """
    import optax

    w = jnp.asarray(w, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    k, n = w.shape
    bs = choose_block_size(k, block_size)
    nb = k // bs
    y_ref = x @ w

    params = {
        "g": jnp.full((nb, n), 4.0),   # sigmoid(4) ≈ 0.982: start ~unclipped
        "b": jnp.full((nb, n), 4.0),
        "ls": jnp.zeros((k,)),         # log equivalent scale
    }
    opt = optax.adam(lr)
    state = opt.init(params)

    def loss_fn(p):
        s = jnp.exp(p["ls"]) if let else jnp.ones((k,))
        wq = _fake_quant_clipped(w * s[:, None], p["g"], p["b"], bits, bs, sym)
        y = (x / s) @ wq
        return jnp.mean((y - y_ref) ** 2)

    @jax.jit
    def step(p, st):
        l, grad = jax.value_and_grad(loss_fn)(p)
        upd, st = opt.update(grad, st)
        return optax.apply_updates(p, upd), st, l

    for _ in range(iters):
        params, state, _ = step(params, state)

    s = jnp.exp(params["ls"]) if let else jnp.ones((k,))
    # emit through the standard quantizer on the CLIPPED+scaled weights so
    # the checkpoint keeps the deployed grid invariants (bf16 planes etc.)
    w_t = np.asarray(_fake_quant_clipped(
        w * s[:, None], params["g"], params["b"], bits, bs, sym))
    ql = quantize(w_t, bits=bits, block_size=bs, sym=sym,
                  out_bias=out_bias, act_bits=act_bits)
    return ql, s
