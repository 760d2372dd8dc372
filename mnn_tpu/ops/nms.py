"""Non-maximum suppression (jittable, static shapes).

Equivalent of the reference's NMSModule (express/module/, SURVEY.md §2.7)
and its CPU NMS execution: top-K greedy suppression expressed as a
fixed-length `fori_loop` so it compiles once for a given box count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """a [N, 4], b [M, 4] in (x1, y1, x2, y2) -> IoU [N, M]."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float = 0.5,
        score_threshold: float = 0.0, max_outputs: int = 100):
    """Greedy NMS. Returns (indices [max_outputs] int32, valid [max_outputs] bool).

    Indices are ordered by score; slots past the kept count hold -1.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    order = jnp.argsort(-scores)
    alive = scores[order] > score_threshold

    def body(i, state):
        alive, out, count = state
        is_alive = alive[i]
        idx = order[i]
        out = jax.lax.cond(
            jnp.logical_and(is_alive, count < max_outputs),
            lambda: out.at[count].set(idx),
            lambda: out,
        )
        new_count = count + jnp.where(
            jnp.logical_and(is_alive, count < max_outputs), 1, 0)
        # suppress later boxes overlapping this one
        suppress = iou[idx, order] > iou_threshold
        keep_self = jnp.arange(n) <= i
        alive = jnp.where(
            is_alive, alive & (~suppress | keep_self), alive)
        return alive, out, new_count

    out0 = jnp.full((max_outputs,), -1, jnp.int32)
    _, out, count = jax.lax.fori_loop(0, n, body, (alive, out0, 0))
    return out, out >= 0
