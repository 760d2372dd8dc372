"""HQQ (Half-Quadratic Quantization) weight quantizer.

Equivalent of the reference's HQQ export path
(/root/reference/transformers/llm/export/utils/hqq_quantizer.py, selected by
`llmexport.py --hqq`): calibration-free per-block asymmetric quantization
that optimizes the zero-point under a sparsity-promoting l_p (p < 1) error
model instead of plain round-to-nearest — robust to the heavy-tailed weight
outliers that dominate RTN error at 4 bits.

Algorithm (half-quadratic splitting, alternating closed-form updates):
    minimize_{z}  || W - s * (Q(W; s, z) - z) ||_p^p
    repeat:
        Wq  = clip(round(W/s + z), 0, 2^b - 1)
        We  = shrink_p(W - s*(Wq - z), beta)     # generalized shrinkage
        z   = mean(Wq - (W - We)/s)              # closed-form zero update
        beta *= kappa

Scales stay at their min/max init (as in HQQ v1); only the zero moves.
Output lands on this framework's standard per-block grid (QuantizedLinear:
w = q*scale + bias with bias = -zero*scale), so kernels are unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mnn_tpu.quant.quantize import (
    QuantizedLinear,
    _check_args,
    choose_block_size,
    pack_int4,
)


def _shrink_lp(x: jnp.ndarray, beta: float, p: float) -> jnp.ndarray:
    """Generalized soft-threshold for the l_p (p<1) penalty."""
    ax = jnp.abs(x)
    return jnp.sign(x) * jnp.maximum(
        ax - (1.0 / beta) * ax ** (p - 1.0), 0.0
    )


def quantize_hqq(
    w,
    bits: int = 4,
    block_size: int = 128,
    iters: int = 20,
    p: float = 0.7,
    beta: float = 10.0,
    kappa: float = 1.01,
    out_bias: Optional[jnp.ndarray] = None,
    act_bits: int = 16,
) -> QuantizedLinear:
    """Quantize float [K, N] weights with HQQ zero-point optimization."""
    w = jnp.asarray(w, jnp.float32)
    k, n = w.shape
    block_size = choose_block_size(k, block_size)
    _check_args(k, bits, block_size)
    qmax = (1 << bits) - 1
    nb = k // block_size
    blocks = w.reshape(nb, block_size, n)

    wmin = jnp.min(blocks, axis=1)
    wmax = jnp.max(blocks, axis=1)
    scale = (wmax - wmin) / qmax
    scale = jnp.where(scale == 0, 1.0, scale)
    zero = -wmin / scale  # [nb, N] float zero-point (w/s + z maps wmin -> 0)

    def body(i, carry):
        zero, beta = carry
        q = jnp.clip(jnp.round(blocks / scale[:, None, :] + zero[:, None, :]),
                     0, qmax)
        w_r = (q - zero[:, None, :]) * scale[:, None, :]
        w_e = _shrink_lp(blocks - w_r, beta, p)
        zero = jnp.mean(q - (blocks - w_e) / scale[:, None, :], axis=1)
        return zero, beta * kappa

    zero, _ = jax.lax.fori_loop(0, iters, body, (zero, beta))

    # round the optimized (scale, bias) to the bf16 storage grid, then
    # quantize against the ROUNDED values so q is optimal for exactly the
    # planes the kernels read back (bf16 checkpoint format,
    # quant/quantize.py module docstring)
    scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
    bias = (-zero * scale).astype(jnp.bfloat16).astype(jnp.float32)
    q = jnp.clip(jnp.round((blocks - bias[:, None, :]) / scale[:, None, :]),
                 0, qmax).reshape(k, n)
    if bits == 4:
        packed = pack_int4(q.astype(jnp.int32), block_size)
    else:
        # same storage convention as quantize(): uint8 bit pattern in int8
        packed = jax.lax.bitcast_convert_type(
            q.astype(jnp.int32).astype(jnp.uint8), jnp.int8)
    ob = None if out_bias is None else jnp.asarray(out_bias, jnp.float32)
    return QuantizedLinear(
        packed=packed, scale=scale.astype(jnp.bfloat16),
        bias=bias.astype(jnp.bfloat16), out_bias=ob, bits=bits,
        block_size=block_size, act_bits=act_bits,
    )
