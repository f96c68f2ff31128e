"""Perspective-n-Point: batched DLT minimal solver + Gauss-Newton refinement.

Replaces cv.solvePnPRansac / cv.solvePnP (reference sfm_pipeline.py:567-584,
:595, :750) with a TPU formulation: 6-point DLT hypotheses vmapped over
RANSAC batches, cheirality-resolved linear pose extraction, and an unrolled
Gauss-Newton polish on se(3) (the role of OpenCV's ITERATIVE refinement).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from recon3d_tpu.ops.lie import se3_exp
from recon3d_tpu.ops.linalg import smallest_eigvec, nearest_rotation, einsum_hp, matmul_hp
from recon3d_tpu.ops.ransac import ransac, RansacResult


def pnp_dlt(
    X: jnp.ndarray, x_norm: jnp.ndarray, weights: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted linear PnP from >= 6 3D-2D correspondences.

    X: (N, 3) world points; x_norm: (N, 2) *normalized* image coords
    (K^-1 applied); weights: (N,) sample/inlier mask.
    Returns (R (3,3), t (3,)); cheirality (sign) resolved by majority
    positive-depth vote over the weighted points.
    """
    n = X.shape[0]
    Xh = jnp.concatenate([X, jnp.ones((n, 1), X.dtype)], axis=1)  # (N, 4)
    zeros = jnp.zeros_like(Xh)
    u, v = x_norm[:, 0:1], x_norm[:, 1:2]
    # Rows: [X 0 -u*X ; 0 X -v*X] for P (3,4) flattened row-major (12,)
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=1)
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 12)
    w = jnp.concatenate([weights, weights], axis=0)[:, None]
    A = A * w
    AtA = einsum_hp("ni,nj->ij", A, A)
    p = smallest_eigvec(AtA)
    P = p.reshape(3, 4)

    # Normalize scale by the third row of M (its norm is 1 for a true [R|t]),
    # then fix the overall sign so weighted depths (P[2] . Xh) are positive.
    m3 = jnp.linalg.norm(P[2, :3])
    P = P / jnp.maximum(m3, 1e-12)
    depth = einsum_hp("nj,j->n", Xh, P[2])
    sign = jnp.where(jnp.sum(depth * weights) < 0, -1.0, 1.0)
    P = P * sign

    M = P[:, :3]
    R = nearest_rotation(M)
    t = P[:, 3]
    return R, t


def project_points(
    K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray
) -> jnp.ndarray:
    """Pinhole projection of world points, (N, 2) pixels."""
    Xc = einsum_hp("ij,nj->ni", R, X) + t
    z = Xc[:, 2:3]
    z = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    uv = Xc[:, :2] / z
    u = K[0, 0] * uv[:, 0] + K[0, 1] * uv[:, 1] + K[0, 2]
    v = K[1, 1] * uv[:, 1] + K[1, 2]
    return jnp.stack([u, v], axis=1)


def refine_pose_gn(
    K: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    X: jnp.ndarray,
    x_px: jnp.ndarray,
    weights: jnp.ndarray,
    iterations: int = 8,
    damping: float = 1e-6,
):
    """Gauss-Newton pose polish on se(3) (motion-only, point-fixed).

    Minimizes weighted pixel reprojection error. Jacobians via autodiff of
    the left-multiplied twist; 6x6 normal equations solved per iteration
    inside a lax.scan (unrolled length = `iterations`).
    """

    def residuals(xi, R, t):
        dR, dt = se3_exp(xi)
        Rn = matmul_hp(dR, R)
        tn = einsum_hp("ij,j->i", dR, t) + dt
        pred = project_points(K, Rn, tn, X)
        return ((pred - x_px) * weights[:, None]).reshape(-1)

    def step(carry, _):
        R, t = carry
        zero = jnp.zeros(6, dtype=X.dtype)
        J = jax.jacfwd(residuals)(zero, R, t)  # (2N, 6)
        r = residuals(zero, R, t)
        JtJ = einsum_hp("ni,nj->ij", J, J) + damping * jnp.eye(6, dtype=X.dtype)
        Jtr = einsum_hp("ni,n->i", J, r)
        xi = -jnp.linalg.solve(JtJ, Jtr)
        dR, dt = se3_exp(xi)
        Rn = matmul_hp(dR, R)
        tn = einsum_hp("ij,j->i", dR, t) + dt
        # Reject steps that increase the cost (plain GN safeguard).
        c_old = jnp.sum(jnp.square(r))
        c_new = jnp.sum(jnp.square(residuals(jnp.zeros(6, X.dtype), Rn, tn)))
        better = c_new < c_old
        Rn = jnp.where(better, Rn, R)
        tn = jnp.where(better, tn, t)
        return (Rn, tn), c_new

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iterations)
    return R, t


class PnPResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


def pnp_ransac(
    key: jax.Array,
    K: jnp.ndarray,
    X: jnp.ndarray,
    x_px: jnp.ndarray,
    valid: jnp.ndarray,
    num_hypotheses: int = 2048,
    threshold_px: float = 8.0,
    refine_iterations: int = 8,
) -> PnPResult:
    """RANSAC PnP: 6-point DLT hypotheses + GN polish on the inlier set.

    X: (N, 3) padded 3D points, x_px: (N, 2) pixels, valid: (N,) mask.
    The TPU-native replacement for the reference's triple solvePnPRansac
    cascade (sfm_pipeline.py:567-584) — one fused hypothesis batch instead
    of 3 x 5000 sequential C++ iterations.
    """
    Kinv = jnp.linalg.inv(K)
    x_norm = einsum_hp(
        "ij,nj->ni",
        Kinv,
        jnp.concatenate([x_px, jnp.ones_like(x_px[:, :1])], axis=1),
    )[:, :2]

    def solver(mask):
        R, t = pnp_dlt(X, x_norm, mask)
        return jnp.concatenate([R.reshape(9), t], axis=0)  # (12,)

    def residual_fn(model):
        R = model[:9].reshape(3, 3)
        t = model[9:]
        pred = project_points(K, R, t, X)
        err = jnp.linalg.norm(pred - x_px, axis=1)
        # Penalize points behind the camera.
        z = einsum_hp("ij,nj->ni", R, X)[:, 2] + t[2]
        return jnp.where(z > 1e-6, err, 1e9)

    res: RansacResult = ransac(
        key, solver, residual_fn, valid, 6, num_hypotheses, threshold_px
    )
    R = res.model[:9].reshape(3, 3)
    t = res.model[9:]

    # Polish on the inlier set, then re-evaluate inliers.
    w = res.inliers.astype(X.dtype)
    R, t = refine_pose_gn(K, R, t, X, x_px, w, iterations=refine_iterations)
    err = residual_fn(jnp.concatenate([R.reshape(9), t]))
    inliers = (err < threshold_px) & (valid > 0)
    return PnPResult(R=R, t=t, inliers=inliers, num_inliers=jnp.sum(inliers))
