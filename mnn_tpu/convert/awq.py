"""AWQ / GPTQ quantized-checkpoint ingestion.

Equivalent of the reference's external-quantizer ingest
(/root/reference/transformers/llm/export: awq_quantizer.py, gptq.py —
llmexport can consume AWQ/GPTQ-quantized HF checkpoints instead of
re-quantizing from scratch): these utilities unpack the int32-packed
AWQ-GEMM and GPTQ tensor layouts into explicit (q, scale, zero) planes.

Layouts (as emitted by autoawq / gptqmodel):
  AWQ : qweight int32 [K, N/8]  — 8 nibbles per word along N, in the
        interleaved order [0, 2, 4, 6, 1, 3, 5, 7]
        qzeros  int32 [K/G, N/8] — same packing; scales f16 [K/G, N]
  GPTQ: qweight int32 [K/8, N]  — 8 nibbles per word along K, sequential
        qzeros  int32 [K/G, N/8] — AWQ-style... sequential order
        scales  [K/G, N]

Dequant convention (both): w[k, n] = (q[k, n] - zero[g, n]) * scale[g, n],
g = k // group — exactly this framework's affine form with
bias = -zero * scale, so ingestion maps scale/zero straight through.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _unpack_int32_nibbles(packed: np.ndarray, axis: int, order=None) -> np.ndarray:
    """int32 [..] -> uint nibbles expanded 8x along `axis`."""
    # nibble at shift 4*i holds element at offset order[i]; inverting gives
    # the shift that belongs to each consecutive offset
    shifts = np.arange(8, dtype=np.uint32) * 4
    if order is not None:
        shifts = shifts[np.argsort(order)]
    u = packed.astype(np.uint32)
    parts = [(u >> s) & 0xF for s in shifts]
    return np.concatenate(
        [np.expand_dims(p, axis + 1) for p in parts], axis=axis + 1
    ).reshape(
        packed.shape[:axis] + (packed.shape[axis] * 8,) + packed.shape[axis + 1 :]
    )


def unpack_awq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (q uint8 [K, N], scale f32 [K/G, N], zero uint8 [K/G, N])."""
    q = _unpack_int32_nibbles(qweight, axis=1, order=_AWQ_ORDER)
    z = _unpack_int32_nibbles(qzeros, axis=1, order=_AWQ_ORDER)
    return q.astype(np.uint8), np.asarray(scales, np.float32), z.astype(np.uint8)


def unpack_gptq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (q uint8 [K, N], scale f32 [K/G, N], zero uint8 [K/G, N])."""
    # along-K packing: expand axis 0
    q = _unpack_int32_nibbles(qweight, axis=0)
    z = _unpack_int32_nibbles(qzeros, axis=1)
    return q.astype(np.uint8), np.asarray(scales, np.float32), z.astype(np.uint8)


def dequantize_awq_layer(q: np.ndarray, scale: np.ndarray, zero: np.ndarray,
                         group: int) -> np.ndarray:
    """Exact float weights of the AWQ/GPTQ grid: [K, N] float32."""
    k, n = q.shape
    g = k // group
    qb = q.reshape(g, group, n).astype(np.float32)
    w = (qb - zero[:, None, :].astype(np.float32)) * scale[:, None, :]
    return w.reshape(k, n)


def load_awq_weight(tensors: dict, prefix: str,
                    gptq_v2: bool = False) -> Tuple[np.ndarray, int]:
    """Read {prefix}.qweight/qzeros/scales from a tensor dict.

    Returns (float weights [K, N] on the original quant grid, group size).
    Auto-detects AWQ (qweight [K, N/8]) vs GPTQ (qweight [K/8, N]) packing
    from shapes. GPTQ v1 checkpoints (AutoGPTQ's default `checkpoint_format
    "gptq"`) store zero-1 in qzeros; the true zero is restored here unless
    gptq_v2=True (the rarer v2 format stores zeros directly). The float
    form feeds the standard quantize() with block_size=group, which
    reproduces the grid to within half an original quantization step
    (exact when a group spans its full int4 range).
    """
    qw = np.asarray(tensors[prefix + ".qweight"])
    qz = np.asarray(tensors[prefix + ".qzeros"])
    sc = np.asarray(tensors[prefix + ".scales"])
    groups, n = sc.shape
    if qw.shape[1] * 8 == n:           # AWQ: packed along N
        q, s, z = unpack_awq(qw, qz, sc)
    elif qw.shape[1] == n:             # GPTQ: packed along K
        q, s, z = unpack_gptq(qw, qz, sc)
        if not gptq_v2:
            z = (z.astype(np.int32) + 1).astype(np.uint8)
    else:
        raise ValueError(f"unrecognized quant packing for {prefix}")
    group = q.shape[0] // groups
    return dequantize_awq_layer(q, s, z, group), group
