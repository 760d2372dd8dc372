"""Shared helpers for Pallas TPU kernels.

Kernels in this package are the TPU-native replacement for the reference's
hand-written per-ISA kernels (NEON/SME `.S` files, `.cl`/`.metal` shaders —
/root/reference/source/backend/cpu/arm/). One Pallas source per op; block
sizes are chosen per problem shape (the analog of the reference's
CoreFunctions ISA dispatch, /root/reference/source/backend/cpu/compute/CommonOptFunction.h).
"""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Run kernels in the Pallas interpreter off-TPU (CPU test mesh / CI)."""
    return not on_tpu()


def use_pallas(interpret) -> bool:
    """Kernel dispatch policy (≈ the reference's backend selection,
    Schedule::getAppropriateType): Pallas on TPU, Pallas-interpreter when
    explicitly requested (kernel unit tests), pure-XLA reference path
    otherwise or when explicitly forced with interpret=False (training needs
    the fully differentiable path; flash-attention backward kernels are
    future work) — the 'CPU backend is the reference implementation'
    pattern from /root/reference/test (SURVEY.md §4)."""
    if interpret is False:
        return False
    return on_tpu() or interpret is True


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def largest_divisor_leq(n: int, cap: int, multiple: int = 1) -> int:
    """Largest d <= cap with d % multiple == 0 and n % d == 0 (falls back to multiple)."""
    cap = min(cap, n)
    for d in range(cap - cap % multiple, 0, -multiple):
        if n % d == 0:
            return d
    return multiple
