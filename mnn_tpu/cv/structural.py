"""Structural analysis: connected components, contour measures, hulls.

Capability parity with the reference's
tools/cv/include/cv/imgproc/structural.hpp (boundingRect, contourArea,
convexHull, minAreaRect, connectedComponentsWithStats, boxPoints).
TPU-native where iteration is data-parallel (connected components =
label-propagation min-pooling to a fixed point, a lax.while_loop of
reduce-windows); small geometric reductions (hull, min-area rect) run
host-side on the point lists they are given — they are O(points), not
image kernels, in the reference too.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bounding_rect(points) -> Tuple[int, int, int, int]:
    """(x, y, w, h) of the up-right bounding rectangle."""
    p = np.asarray(points).reshape(-1, 2)
    x0, y0 = p.min(axis=0)
    x1, y1 = p.max(axis=0)
    return (int(x0), int(y0), int(x1 - x0 + 1), int(y1 - y0 + 1))


def contour_area(points, oriented: bool = False) -> float:
    """Shoelace area of a closed polygon [N, 2] (OpenCV contourArea)."""
    p = np.asarray(points, np.float64).reshape(-1, 2)
    x, y = p[:, 0], p[:, 1]
    s = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return float(s if oriented else abs(s))


def convex_hull(points, clockwise: bool = False) -> np.ndarray:
    """Hull vertices [M, 2] (Andrew's monotone chain)."""
    p = np.unique(np.asarray(points, np.float64).reshape(-1, 2), axis=0)
    if len(p) <= 2:
        return p
    p = p[np.lexsort((p[:, 1], p[:, 0]))]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower, upper = [], []
    for q in p:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], q) <= 0:
            lower.pop()
        lower.append(tuple(q))
    for q in p[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], q) <= 0:
            upper.pop()
        upper.append(tuple(q))
    hull = np.asarray(lower[:-1] + upper[:-1])
    return hull[::-1] if clockwise else hull


def min_area_rect(points):
    """((cx, cy), (w, h), angle_deg): minimum-area rotated rectangle via
    rotating calipers over hull edges."""
    hull = convex_hull(points)
    if len(hull) == 1:
        return ((float(hull[0][0]), float(hull[0][1])), (0.0, 0.0), 0.0)
    best = None
    n = len(hull)
    for i in range(n):
        e = hull[(i + 1) % n] - hull[i]
        norm = math.hypot(*e)
        if norm == 0:
            continue
        ux, uy = e / norm
        r = hull @ np.asarray([[ux, -uy], [uy, ux]])  # rotate onto edge
        w = r[:, 0].max() - r[:, 0].min()
        h = r[:, 1].max() - r[:, 1].min()
        area = w * h
        if best is None or area < best[0]:
            cx = (r[:, 0].max() + r[:, 0].min()) / 2
            cy = (r[:, 1].max() + r[:, 1].min()) / 2
            # rotate the center back
            c = np.asarray([cx, cy]) @ np.asarray([[ux, uy], [-uy, ux]])
            best = (area, (float(c[0]), float(c[1])), (float(w), float(h)),
                    math.degrees(math.atan2(uy, ux)))
    return best[1], best[2], best[3]


def box_points(rect) -> np.ndarray:
    """4 corners [4, 2] of a ((cx,cy),(w,h),angle) rotated rect."""
    (cx, cy), (w, h), ang = rect
    a = math.radians(ang)
    ux, uy = math.cos(a), math.sin(a)
    dx = np.asarray([ux, uy]) * w / 2
    dy = np.asarray([-uy, ux]) * h / 2
    c = np.asarray([cx, cy])
    return np.stack([c - dx - dy, c + dx - dy, c + dx + dy, c - dx + dy])


def connected_components(img, connectivity: int = 8):
    """Label the nonzero pixels of a binary image; returns (n_labels,
    labels [H, W] int32) with background = 0 and labels renumbered 1..n.

    XLA-native label propagation: seed every foreground pixel with a
    unique id, repeatedly min-pool over the neighborhood until a fixed
    point (lax.while_loop of reduce_windows — O(diameter) iterations, each
    fully parallel), then compact the surviving ids.
    """
    x = jnp.asarray(img) != 0
    h, w = x.shape
    seed = jnp.arange(1, h * w + 1, dtype=jnp.int32).reshape(h, w)
    # background/pad value: int32 max (the identity of min, so
    # reduce_window treats it as a monoid and fuses)
    big = np.int32(np.iinfo(np.int32).max)
    labels = jnp.where(x, seed, big)

    if connectivity == 8:
        window = (3, 3)
    else:
        window = None  # 4-connectivity: cross-shaped, two passes below

    def min_pool(lab):
        if window is not None:
            m = jax.lax.reduce_window(
                lab, big, jax.lax.min, (3, 3), (1, 1),
                [(1, 1), (1, 1)])
        else:
            m1 = jax.lax.reduce_window(
                lab, big, jax.lax.min, (3, 1), (1, 1), [(1, 1), (0, 0)])
            m2 = jax.lax.reduce_window(
                lab, big, jax.lax.min, (1, 3), (1, 1), [(0, 0), (1, 1)])
            m = jnp.minimum(m1, m2)
        return jnp.where(x, jnp.minimum(lab, m), big)

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        nxt = min_pool(lab)
        return nxt, jnp.any(nxt != lab)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    lab_np = np.array(labels)    # writable copy
    lab_np[lab_np == big] = 0
    ids = np.unique(lab_np)
    ids = ids[ids > 0]
    out = np.zeros_like(lab_np, np.int32)
    for new, old in enumerate(ids, start=1):
        out[lab_np == old] = new
    return len(ids) + 1, out


def connected_components_with_stats(img, connectivity: int = 8):
    """(n, labels, stats [n, 5] = (x, y, w, h, area), centroids [n, 2])."""
    n, labels = connected_components(img, connectivity)
    stats = np.zeros((n, 5), np.int64)
    cents = np.zeros((n, 2), np.float64)
    for i in range(n):
        ys, xs = np.nonzero(labels == i) if i else np.nonzero(
            np.asarray(img) == 0)
        if len(xs) == 0:
            continue
        stats[i] = (xs.min(), ys.min(), xs.max() - xs.min() + 1,
                    ys.max() - ys.min() + 1, len(xs))
        cents[i] = (xs.mean(), ys.mean())
    return n, labels, stats, cents
