"""Trustworthy on-device timing helpers.

Two pitfalls this module exists to avoid (both observed on the axon TPU
tunnel): (1) per-dispatch timing includes ~1.6 ms host->device dispatch
latency, so sub-millisecond kernels must be repeated on device; (2) XLA
hoists loop-invariant bodies out of `fori_loop`, so naive repetition inside
jit measures nothing. `chain` threads a live data dependency from each
iteration's output into the next iteration's *input* so the loop body cannot
be hoisted or folded.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def chain(fn: Callable, x: jax.Array, iters: int = 20, warmup: int = 1):
    """Time `fn(x)` repeated on device with a forced inter-iteration dependency.

    fn must map one array to one array (any shapes). Returns seconds/iter.
    The perturbation `x * (1 + tiny*acc)` keeps the input dependent on the
    previous output without changing the measured op's cost materially.
    """

    @jax.jit
    def loop(x, eps):
        def body(i, carry):
            acc, _ = carry
            x2 = x * (1.0 + eps * acc).astype(x.dtype)
            y = fn(x2)
            return (jnp.sum(y, dtype=jnp.float32) * 1e-30, y)

        y0 = fn(x)
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), y0))[1]

    eps = jnp.float32(1e-30)
    sync(loop(x, eps))  # compile + warm caches
    times = []
    for _ in range(max(warmup, 1)):
        t0 = time.perf_counter()
        sync(loop(x, eps))
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


def sync(tree):
    """Actually wait for device work: on the axon tunnel,
    `block_until_ready` returns before execution finishes; only fetching a
    value to the host synchronizes. Pulls one scalar per leaf."""
    for leaf in jax.tree_util.tree_leaves(tree):
        _ = jax.device_get(leaf.ravel()[0])
    return tree


def once(fn: Callable, *args) -> float:
    """Single dispatch wall time (includes dispatch latency — use for >10ms ops)."""
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return time.perf_counter() - t0
