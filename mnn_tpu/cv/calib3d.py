"""calib3d: Rodrigues rotation + solvePnP.

Equivalent of the reference's tools/cv calib3d module
(tools/cv/include/cv/calib3d.hpp: solvePnP, Rodrigues — used by TaoAvatar
face tracking). solvePnP uses DLT initialization + Gauss-Newton refinement
on the reprojection error (jax.grad supplies the Jacobian).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rodrigues(rvec: jax.Array) -> jax.Array:
    """Rotation vector [3] -> rotation matrix [3, 3]."""
    rvec = jnp.asarray(rvec, jnp.float64) if False else jnp.asarray(rvec, jnp.float32)
    theta = jnp.linalg.norm(rvec)
    safe = jnp.where(theta < 1e-8, 1.0, theta)
    k = rvec / safe
    kx, ky, kz = k[0], k[1], k[2]
    K = jnp.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]], rvec.dtype)
    R = jnp.eye(3) + jnp.sin(theta) * K + (1 - jnp.cos(theta)) * (K @ K)
    return jnp.where(theta < 1e-8, jnp.eye(3), R)


def rodrigues_inv(R: jax.Array) -> jax.Array:
    """Rotation matrix [3, 3] -> rotation vector [3]."""
    R = jnp.asarray(R, jnp.float32)
    cos = jnp.clip((jnp.trace(R) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos)
    axis = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s = jnp.linalg.norm(axis)
    axis = jnp.where(s < 1e-8, jnp.array([1.0, 0, 0]), axis / jnp.maximum(s, 1e-8))
    return axis * theta


def _project(obj, rvec, tvec, K):
    R = rodrigues(rvec)
    cam = obj @ R.T + tvec
    uv = cam[:, :2] / cam[:, 2:3]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([uv[:, 0] * fx + cx, uv[:, 1] * fy + cy], axis=1)


def solve_pnp(
    object_points: np.ndarray,   # [N, 3]
    image_points: np.ndarray,    # [N, 2]
    camera_matrix: np.ndarray,   # [3, 3]
    iterations: int = 50,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (rvec [3], tvec [3]) minimizing reprojection error (DLT + GN)."""
    obj = jnp.asarray(object_points, jnp.float32)
    img = jnp.asarray(image_points, jnp.float32)
    K = jnp.asarray(camera_matrix, jnp.float32)

    # DLT init: rows of the 2N x 12 system for P = K [R|t]
    n = obj.shape[0]
    Kinv = jnp.linalg.inv(K)
    norm = (jnp.concatenate([img, jnp.ones((n, 1))], axis=1) @ Kinv.T)[:, :2]
    A = []
    for i in range(n):
        X, Y, Z = obj[i]
        u, v = norm[i]
        A.append([X, Y, Z, 1, 0, 0, 0, 0, -u * X, -u * Y, -u * Z, -u])
        A.append([0, 0, 0, 0, X, Y, Z, 1, -v * X, -v * Y, -v * Z, -v])
    A = jnp.asarray(A)
    _, _, vt = jnp.linalg.svd(A)
    P = vt[-1].reshape(3, 4)
    R_raw, t_raw = P[:, :3], P[:, 3]
    # orthonormalize + fix scale/sign (cheirality: points in front)
    u_, s_, vt_ = jnp.linalg.svd(R_raw)
    scale = jnp.mean(s_)
    R0 = u_ @ vt_
    sign = jnp.sign(jnp.linalg.det(R0))
    R0 = R0 * sign
    t0 = t_raw / scale * sign
    depth = (obj @ R0.T + t0)[:, 2].mean()
    R0 = jnp.where(depth < 0, -R0, R0)
    t0 = jnp.where(depth < 0, -t0, t0)
    # det(-R0) = -1: re-orthonormalize via rodrigues round trip below
    rvec = rodrigues_inv(R0)
    tvec = t0

    def loss(params):
        r, t = params[:3], params[3:]
        return jnp.sum((_project(obj, r, t, K) - img) ** 2)

    params = jnp.concatenate([rvec, tvec])
    grad_fn = jax.grad(loss)

    def gn_step(i, params):
        # damped Newton via jacobian of residuals
        def resid(p):
            return (_project(obj, p[:3], p[3:], K) - img).reshape(-1)

        J = jax.jacobian(resid)(params)
        r = resid(params)
        H = J.T @ J + 1e-6 * jnp.eye(6)
        delta = jnp.linalg.solve(H, J.T @ r)
        return params - delta

    params = jax.lax.fori_loop(0, iterations, gn_step, params)
    return np.asarray(params[:3]), np.asarray(params[3:])
