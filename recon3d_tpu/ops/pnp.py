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
    X: jnp.ndarray, x_norm: jnp.ndarray, weights: jnp.ndarray,
    fast: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted linear PnP from >= 6 3D-2D correspondences.

    X: (N, 3) world points; x_norm: (N, 2) *normalized* image coords
    (K^-1 applied); weights: (N,) sample/inlier mask.
    Returns (R (3,3), t (3,)); cheirality (sign) resolved by majority
    positive-depth vote over the weighted points.
    """
    n = X.shape[0]
    # Hartley-style world normalization (zero mean, unit RMS over the
    # weighted points): the raw DLT normal matrix mixes coordinate scales
    # and its f32 condition breaks the fast Cholesky null-space path on
    # minimal samples; normalization fixes the conditioning at the source
    # (and helps the exact path too).
    wsum = jnp.maximum(jnp.sum(weights), 1.0)
    c = jnp.sum(X * weights[:, None], axis=0) / wsum
    d = jnp.linalg.norm(X - c, axis=1)
    s = jnp.maximum(jnp.sum(d * weights) / wsum, 1e-8)
    Xn = (X - c) / s

    Xh = jnp.concatenate([Xn, jnp.ones((n, 1), X.dtype)], axis=1)  # (N, 4)
    zeros = jnp.zeros_like(Xh)
    u, v = x_norm[:, 0:1], x_norm[:, 1:2]
    # Rows: [X 0 -u*X ; 0 X -v*X] for P (3,4) flattened row-major (12,)
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=1)
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 12)
    w = jnp.concatenate([weights, weights], axis=0)[:, None]
    A = A * w
    AtA = einsum_hp("ni,nj->ij", A, A)
    p = smallest_eigvec(AtA, fast=fast)
    P = p.reshape(3, 4)
    # Denormalize: x ~ P' Xh_n = (P' T) Xh with T = [[I/s, -c/s], [0, 1]]
    T = jnp.concatenate(
        [
            jnp.concatenate(
                [jnp.eye(3, dtype=X.dtype) / s, (-c / s)[:, None]], axis=1
            ),
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]], X.dtype),
        ],
        axis=0,
    )
    P = matmul_hp(P, T)

    # Normalize scale by the third row of M (its norm is 1 for a true [R|t]),
    # then fix the overall sign so weighted depths (P[2] . Xh) are positive.
    m3 = jnp.linalg.norm(P[2, :3])
    P = P / jnp.maximum(m3, 1e-12)
    # depth sign check uses the ORIGINAL (unnormalized) points — P has been
    # denormalized above
    Xh_orig = jnp.concatenate([X, jnp.ones((n, 1), X.dtype)], axis=1)
    depth = einsum_hp("nj,j->n", Xh_orig, P[2])
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


def project_residuals_batch(
    K: jnp.ndarray, models: jnp.ndarray, X: jnp.ndarray, x_px: jnp.ndarray
) -> jnp.ndarray:
    """Reprojection residuals of H pose hypotheses against N shared points.

    models: (H, 12) flattened [R | t]; X: (N, 3); x_px: (N, 2). Returns
    (H, N) pixel errors (1e9 behind the camera). MXU-shaped: one
    (N, 3) @ (3, 3H) matmul replaces H tiny per-hypothesis einsums.
    """
    H = models.shape[0]
    R_rows = models[:, :9].reshape(H * 3, 3)
    t = models[:, 9:].reshape(H, 3)
    Xc = matmul_hp(X, R_rows.T).reshape(-1, H, 3) + t[None]  # (N, H, 3)
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    u = K[0, 0] * Xc[..., 0] / zs + K[0, 1] * Xc[..., 1] / zs + K[0, 2]
    v = K[1, 1] * Xc[..., 1] / zs + K[1, 2]
    err = jnp.hypot(u - x_px[:, 0:1], v - x_px[:, 1:2])
    return jnp.where(z > 1e-6, err, 1e9).T  # (H, N)


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
        # unrolled Cholesky: jnp.linalg.solve dispatches an iterative LU on
        # TPU even for a 6x6 (ops/linalg.py rationale)
        from recon3d_tpu.ops.linalg import (
            _cholesky_unrolled, _chol_solve_unrolled,
        )
        xi = -_chol_solve_unrolled(_cholesky_unrolled(JtJ), Jtr)
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
    res = pnp_ransac_multi(
        key, K, X, x_px, valid, jnp.asarray([threshold_px]),
        num_hypotheses=num_hypotheses, refine_iterations=refine_iterations,
    )
    return PnPResult(
        R=res.R[0], t=res.t[0], inliers=res.inliers[0],
        num_inliers=res.num_inliers[0],
    )


def pnp_ransac_multi(
    key: jax.Array,
    K: jnp.ndarray,
    X: jnp.ndarray,
    x_px: jnp.ndarray,
    valid: jnp.ndarray,
    thresholds_px: jnp.ndarray,
    num_hypotheses: int = 2048,
    refine_iterations: int = 8,
) -> PnPResult:
    """RANSAC PnP scored against a whole threshold cascade at once.

    The hypothesis batch (sampling + 6-point DLT solves + residuals) is
    shared across the T thresholds — only the vote and the GN polish are
    per-threshold. Result fields carry a leading (T,) axis. Replaces a
    vmap of independent single-threshold RANSACs that re-solved the same
    hypotheses T times.
    """
    from recon3d_tpu.ops.ransac import sample_indices

    Kinv = jnp.linalg.inv(K)
    x_norm = einsum_hp(
        "ij,nj->ni",
        Kinv,
        jnp.concatenate([x_px, jnp.ones_like(x_px[:, :1])], axis=1),
    )[:, :2]

    def sample_solver(idx):
        # fast null-space: hypotheses vote, the winner gets GN-polished
        R, t = pnp_dlt(
            X[idx], x_norm[idx], jnp.ones(idx.shape[0], X.dtype), fast=True
        )
        return jnp.concatenate([R.reshape(9), t], axis=0)  # (12,)

    idx = sample_indices(key, valid, num_hypotheses, 6)
    models = jax.vmap(sample_solver)(idx)              # (H, 12)
    residuals = project_residuals_batch(K, models, X, x_px)  # (H, N)

    valid_b = valid > 0

    def per_threshold(thr):
        inl = (residuals < thr) & valid_b[None, :]
        r2 = jnp.minimum(jnp.square(residuals), thr * thr)
        score = jnp.sum(jnp.where(valid_b[None, :], r2, 0.0), axis=-1)
        counts = jnp.sum(inl, axis=-1)
        norm_score = score / (jnp.max(score) + 1e-12)
        best = jnp.argmax(counts.astype(jnp.float32) - 0.5 * norm_score)
        model = models[best]
        R = model[:9].reshape(3, 3)
        t = model[9:]
        # Polish on the inlier set, then re-evaluate inliers.
        w = inl[best].astype(X.dtype)
        R, t = refine_pose_gn(
            K, R, t, X, x_px, w, iterations=refine_iterations
        )
        err = project_residuals_batch(
            K, jnp.concatenate([R.reshape(9), t])[None], X, x_px
        )[0]
        inliers = (err < thr) & valid_b
        return PnPResult(
            R=R, t=t, inliers=inliers, num_inliers=jnp.sum(inliers)
        )

    return jax.vmap(per_threshold)(thresholds_px)
