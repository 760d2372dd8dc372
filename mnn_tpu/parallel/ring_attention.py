"""Ring attention: sequence parallelism over a mesh axis.

The cross-chip sequence-parallel design the reference lacks (SURVEY.md §5.7:
MNN scales long context on ONE device via blockwise flash + KV quant/spill;
the TPU-native answer is to shard the sequence across chips): Q/K/V are
sharded along the sequence axis; each step every device attends its local Q
chunk against the KV chunk it currently holds, then KV chunks rotate one hop
around the ring (`ppermute` over ICI), overlapping the collective with the
next block's compute. Online-softmax running (max, sum, acc) stitches the
partial results exactly — the distributed form of the same rescaling loop
the flash kernel runs per block (CPUAttention.cpp:209-231).

Causality is enforced with absolute positions, so chunk boundaries are
exact (no approximation anywhere: output == single-device attention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, q_pos, k_pos, scale, causal, acc, m, l):
    """One (q-chunk, kv-chunk) online-softmax update.

    q [B,H,Tq,D], k/v [B,Hkv,Tk,D]; q_pos [Tq], k_pos [Tk] absolute.
    acc [B,H,Tq,D] f32, m/l [B,H,Tq] f32.
    """
    b, h, tq, d = q.shape
    hkv = k.shape[1]
    group = h // hkv
    kf = jnp.repeat(k, group, axis=1).astype(jnp.float32)
    vf = jnp.repeat(v, group, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32), kf) * scale
    if causal:
        mask = k_pos[None, :] <= q_pos[:, None]  # [Tq, Tk]
        s = jnp.where(mask[None, None], s, NEG_INF)
    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m, m_cur)
    # protect fully-masked rows (exp(NEG_INF - NEG_INF) would be 1)
    safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
    p = jnp.exp(s - safe_m[..., None])
    p = jnp.where(s == NEG_INF, 0.0, p)
    alpha = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - safe_m))
    l_new = l * alpha + p.sum(-1)
    acc_new = acc * alpha[..., None] + jnp.einsum("bhts,bhsd->bhtd", p, vf)
    return acc_new, m_new, l_new


def make_ring_attention(
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = True,
    sm_scale: Optional[float] = None,
    head_axis: Optional[str] = None,
):
    """Build a jitted ring attention: q,k,v [B,H,T,D] sequence-sharded on T.

    head_axis: optionally ALSO shard the head dim over a second mesh axis —
    the TP x SP composition (Megatron-cut heads x ring sequence). Heads are
    independent in attention, so the ring math is unchanged; each (tp, sp)
    device holds its head-shard of its sequence-chunk and the KV rotation
    stays within its sp ring column.
    """
    from jax import shard_map

    size = mesh.shape[axis]

    def local_fn(q, k, v):
        b, h, tq, d = q.shape
        scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
        my = jax.lax.axis_index(axis)
        # derive from q so carries inherit shard_map's varying-axes type
        acc = jnp.zeros_like(q, dtype=jnp.float32)
        m = jnp.full_like(q[..., 0], NEG_INF, dtype=jnp.float32)
        l = jnp.zeros_like(q[..., 0], dtype=jnp.float32)
        q_pos = my * tq + jnp.arange(tq)

        def attend(i, acc, m, l, k_cur, v_cur):
            src = (my - i) % size  # which global chunk k_cur holds
            k_pos = src * k_cur.shape[2] + jnp.arange(k_cur.shape[2])
            return _block_attend(
                q, k_cur, v_cur, q_pos, k_pos, scale, causal, acc, m, l
            )

        def step(i, carry):
            acc, m, l, k_cur, v_cur = carry
            acc, m, l = attend(i, acc, m, l, k_cur, v_cur)
            # rotate KV to the next device (direction: chunk j visits
            # device j, j+1, ... so device r sees chunk (r - i) at step i)
            perm = [(j, (j + 1) % size) for j in range(size)]
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return acc, m, l, k_nxt, v_nxt

        # only size-1 rotations are needed: the last chunk is attended
        # outside the loop so its (discarded) ppermute is never issued
        acc, m, l, k_last, v_last = jax.lax.fori_loop(
            0, size - 1, step, (acc, m, l, k, v))
        acc, m, l = attend(size - 1, acc, m, l, k_last, v_last)
        l = jnp.where(l == 0.0, 1.0, l)
        return (acc / l[..., None]).astype(q.dtype)

    spec = P(None, head_axis, axis, None)
    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )
    return jax.jit(fn)


def shard_seq(x, mesh: Mesh, axis: str = "sp", head_axis: Optional[str] = None):
    return jax.device_put(
        x, NamedSharding(mesh, P(None, head_axis, axis, None)))
