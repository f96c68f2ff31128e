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


def _real_cubic_root(a, b, c):
    """A real root of z^3 + a z^2 + b z + c = 0 (largest real root).

    Trigonometric/Cardano closed form — branch-free (jnp.where), so it
    vmaps over RANSAC hypothesis batches on TPU. All scalars."""
    p = b - a * a / 3.0
    q = 2.0 * a**3 / 27.0 - a * b / 3.0 + c
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    # disc > 0: one real root via Cardano (cbrt of signed magnitudes)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    cbrt = lambda x: jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)
    t_card = cbrt(-q / 2.0 + sq) + cbrt(-q / 2.0 - sq)
    # disc <= 0: three real roots; take the largest (k = 0 branch)
    m = 2.0 * jnp.sqrt(jnp.maximum(-p / 3.0, 1e-20))
    arg = jnp.clip(3.0 * q / (p * m + jnp.where(p == 0, 1e-20, 0.0)), -1.0, 1.0)
    t_trig = m * jnp.cos(jnp.arccos(arg) / 3.0)
    t = jnp.where(disc > 0, t_card, t_trig)
    return t - a / 3.0


def _quartic_roots(c4, c3, c2, c1, c0):
    """Real roots of c4 v^4 + ... + c0 = 0 via Ferrari's method.

    Returns (roots (4,), valid (4,) bool). Closed-form and branch-free so
    it vmaps cleanly; complex roots are masked out rather than raised.
    """
    bad_lead = jnp.abs(c4) < 1e-12
    c4s = jnp.where(bad_lead, 1.0, c4)
    p, q, r, s = c3 / c4s, c2 / c4s, c1 / c4s, c0 / c4s
    # depressed quartic y^4 + al y^2 + be y + ga, v = y - p/4
    al = q - 3.0 * p * p / 8.0
    be = r - p * q / 2.0 + p**3 / 8.0
    ga = s - p * r / 4.0 + p * p * q / 16.0 - 3.0 * p**4 / 256.0
    # resolvent cubic z^3 + 2 al z^2 + (al^2 - 4 ga) z - be^2 = 0 has a
    # real root z0 >= 0 (product of roots = be^2 >= 0)
    z0 = jnp.maximum(_real_cubic_root(2.0 * al, al * al - 4.0 * ga, -be * be), 0.0)
    w = jnp.sqrt(z0)
    # (y^2 + w y + (al + z0)/2 - be/(2w)) (y^2 - w y + (al + z0)/2 + be/(2w))
    half = (al + z0) / 2.0
    corr = jnp.where(w > 1e-10, be / (2.0 * jnp.where(w > 1e-10, w, 1.0)), 0.0)
    d1 = w * w - 4.0 * (half - corr)
    d2 = w * w - 4.0 * (half + corr)
    s1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    s2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    ys = jnp.stack([
        (-w + s1) / 2.0, (-w - s1) / 2.0, (w + s2) / 2.0, (w - s2) / 2.0,
    ])
    valid = jnp.stack([d1 >= 0, d1 >= 0, d2 >= 0, d2 >= 0]) & ~bad_lead
    return ys - p / 4.0, valid


def p3p_grunert(X: jnp.ndarray, x_norm: jnp.ndarray):
    """P3P minimal solver (Grunert 1841 / Haralick et al. 1994 formulation).

    X: (3, 3) world points; x_norm: (3, 2) normalized image coords.
    Returns (models (4, 12) flattened [R|t], valid (4,) bool) — up to four
    pose solutions; disambiguation happens in RANSAC scoring (each solution
    is its own hypothesis).

    This is the TPU-native replacement for OpenCV's SOLVEPNP_P3P branch of
    the reference's registration cascade (reference
    src/core/sfm_pipeline.py:567-584): 3-point samples need ~eps^-3
    hypotheses instead of the 6-point DLT's eps^-6, which is what keeps
    registration alive at low inlier ratios.
    """
    f = jnp.concatenate([x_norm, jnp.ones((3, 1), x_norm.dtype)], axis=1)
    f = f / jnp.linalg.norm(f, axis=1, keepdims=True)      # unit bearings
    P1, P2, P3 = X[0], X[1], X[2]
    a2 = jnp.sum((P2 - P3) ** 2)
    b2 = jnp.sum((P1 - P3) ** 2)
    c2 = jnp.sum((P1 - P2) ** 2)
    b2s = jnp.where(b2 < 1e-12, 1.0, b2)
    ca = jnp.dot(f[1], f[2])   # cos(alpha): angle opposite side a
    cb = jnp.dot(f[0], f[2])
    cg = jnp.dot(f[0], f[1])
    A = a2 / b2s
    B = c2 / b2s
    AmB = A - B                      # (a^2 - c^2)/b^2
    ApB = A + B
    # Grunert quartic in v = s3/s1 (coefficients re-derived symbolically
    # from the three law-of-cosines constraints; several published
    # transcriptions disagree in signs)
    A4 = (AmB - 1.0) ** 2 - 4.0 * B * ca * ca
    A3 = 4.0 * (AmB * (1.0 - AmB) * cb - (1.0 - ApB) * ca * cg
                + 2.0 * B * ca * ca * cb)
    A2 = 2.0 * (AmB**2 - 1.0 + 2.0 * AmB**2 * cb * cb
                + 2.0 * (1.0 - B) * ca * ca
                - 4.0 * ApB * ca * cb * cg + 2.0 * (1.0 - A) * cg * cg)
    A1 = 4.0 * (-AmB * (1.0 + AmB) * cb + 2.0 * A * cg * cg * cb
                - (1.0 - ApB) * ca * cg)
    A0 = (1.0 + AmB) ** 2 - 4.0 * A * cg * cg
    vs, v_ok = _quartic_roots(A4, A3, A2, A1, A0)          # (4,)

    degenerate = (a2 < 1e-12) | (b2 < 1e-12) | (c2 < 1e-12)

    def pose_from_v(v):
        den = 2.0 * (cg - v * ca)
        den = jnp.where(jnp.abs(den) < 1e-10, 1e-10, den)
        u = ((-1.0 + AmB) * v * v - 2.0 * AmB * cb * v + 1.0 + AmB) / den
        s1sq = b2 / jnp.maximum(1.0 + v * v - 2.0 * v * cb, 1e-12)
        s1 = jnp.sqrt(jnp.maximum(s1sq, 0.0))
        s2 = u * s1
        s3 = v * s1
        ok = (s1 > 1e-9) & (s2 > 1e-9) & (s3 > 1e-9)
        Q = jnp.stack([s1, s2, s3])[:, None] * f           # camera frame
        # Procrustes: R = nearest rotation to sum_i Q~_i P~_i^T
        Pc = X - jnp.mean(X, axis=0)
        Qc = Q - jnp.mean(Q, axis=0)
        R = nearest_rotation(einsum_hp("ni,nj->ij", Qc, Pc))
        t = jnp.mean(Q, axis=0) - R @ jnp.mean(X, axis=0)
        return jnp.concatenate([R.reshape(9), t]), ok

    models, s_ok = jax.vmap(pose_from_v)(vs)
    return models, v_ok & s_ok & ~degenerate


def epnp(X: jnp.ndarray, x_norm: jnp.ndarray):
    """EPnP (Lepetit, Moreno-Noguer, Fua 2009) from n >= 4 correspondences.

    X: (n, 3) world points; x_norm: (n, 2) normalized image coords.
    Returns (models (2, 12) flattened [R|t], valid (2,) bool): the N=1 and
    N=2 null-space candidates — like P3P's four roots, disambiguation is
    left to the RANSAC vote (each candidate is its own hypothesis).

    This is the reference's SOLVEPNP_EPNP cascade branch
    (src/core/sfm_pipeline.py:567-584). Its niche next to DLT6/P3P: the
    control-point formulation stays well-posed on PLANAR scenes (where the
    6-point DLT's projection-matrix null space is rank-deficient) while
    using every sample point (where 3-point P3P eats the full noise of its
    minimal sample); see tests/test_pnp_p3p.py::test_epnp_wins_on_planar.
    Everything is fixed-shape linear algebra (4x4 solve, 12x12 eigvecs,
    Procrustes), so it vmaps over RANSAC hypothesis batches.
    """
    n = X.shape[0]
    dt = X.dtype
    # Control points: centroid + principal axes scaled to the data spread.
    c0 = jnp.mean(X, axis=0)
    Xc = X - c0
    cov = einsum_hp("ni,nj->ij", Xc, Xc) / n
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    # Planar data: the smallest axis collapses; give it the mean spread so
    # the control tetrahedron stays affinely independent (coplanar points
    # simply get a zero barycentric weight on that axis).
    scale = jnp.sqrt(jnp.maximum(evals, 1e-6 * jnp.maximum(evals[2], 1e-12)))
    ctrl = c0[None, :] + (evecs * scale[None, :]).T  # (3, 3): c1..c3
    C = jnp.concatenate([c0[None], ctrl], axis=0)    # (4, 3)

    # Barycentric coordinates: [C^T; 1]^T alpha = [X; 1]
    Ch = jnp.concatenate([C.T, jnp.ones((1, 4), dt)], axis=0)  # (4, 4)
    Xh = jnp.concatenate([X.T, jnp.ones((1, n), dt)], axis=0)  # (4, n)
    alphas = jnp.linalg.solve(Ch, Xh).T  # (n, 4)

    # M (2n, 12): sum_j a_ij (x_j^c - u_i z_j^c) = 0 per image axis.
    u, v = x_norm[:, 0], x_norm[:, 1]
    zero = jnp.zeros((n, 4), dt)
    rows_u = jnp.stack([alphas, zero, -u[:, None] * alphas], axis=-1)  # (n,4,3)
    rows_v = jnp.stack([zero, alphas, -v[:, None] * alphas], axis=-1)
    M = jnp.concatenate(
        [rows_u.reshape(n, 12), rows_v.reshape(n, 12)], axis=0
    )  # (2n, 12), column layout (x1, y1, z1, x2, y2, z2, ...) — per-j blocks
    MtM = einsum_hp("ni,nj->ij", M, M)
    _, V = jnp.linalg.eigh(MtM)
    v1 = V[:, 0]  # smallest — camera-frame control coords up to scale
    v2 = V[:, 1]

    def ctrl_cam(vec):
        return vec.reshape(4, 3)  # (4, 3) camera-frame control points

    # pairwise distance index pairs of the 4 control points
    pi = jnp.asarray([0, 0, 0, 1, 1, 2])
    pj = jnp.asarray([1, 2, 3, 2, 3, 3])
    dC = jnp.linalg.norm(C[pi] - C[pj], axis=1)  # (6,) world distances

    def pose_from_ctrl(Cc):
        """[R|t] + validity from camera-frame control points (Procrustes),
        sign-fixed so the mean data-point depth is positive."""
        # reconstruct camera-frame data points
        Pc = alphas @ Cc  # (n, 3)
        sign = jnp.where(jnp.mean(Pc[:, 2]) < 0, -1.0, 1.0)
        Pc = Pc * sign
        Pw_c = Xc  # world centered
        Qc = Pc - jnp.mean(Pc, axis=0)
        R = nearest_rotation(einsum_hp("ni,nj->ij", Qc, Pw_c))
        t = jnp.mean(Pc, axis=0) - R @ c0
        return jnp.concatenate([R.reshape(9), t])

    # --- N=1: single null vector, scale from distance ratio
    Cc1 = ctrl_cam(v1)
    d1 = jnp.linalg.norm(Cc1[pi] - Cc1[pj], axis=1)
    beta1 = jnp.sum(d1 * dC) / jnp.maximum(jnp.sum(d1 * d1), 1e-12)
    m1 = pose_from_ctrl(Cc1 * beta1)

    # --- N=2: betas from the linearized 3-unknown distance system
    Cc2 = ctrl_cam(v2)
    dv1 = Cc1[pi] - Cc1[pj]  # (6, 3)
    dv2 = Cc2[pi] - Cc2[pj]
    # ||b1 dv1 + b2 dv2||^2 = dC^2, unknowns (b11, b12, b22)
    L = jnp.stack([
        jnp.sum(dv1 * dv1, axis=1),
        2.0 * jnp.sum(dv1 * dv2, axis=1),
        jnp.sum(dv2 * dv2, axis=1),
    ], axis=1)  # (6, 3)
    rhs = dC * dC
    LtL = L.T @ L + 1e-10 * jnp.eye(3, dtype=dt)
    b = jnp.linalg.solve(LtL, L.T @ rhs)  # (b11, b12, b22)
    b11 = jnp.maximum(b[0], 1e-12)
    b1 = jnp.sqrt(b11)
    b2 = b[1] / b1
    m2 = pose_from_ctrl(Cc1 * b1 + Cc2 * b2)

    models = jnp.stack([m1, m2])
    finite = jnp.all(jnp.isfinite(models), axis=1)
    nondeg = jnp.sum(jnp.square(Xc)) > 1e-10
    return models, finite & nondeg


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
    use_p3p: bool = True,
) -> PnPResult:
    """RANSAC PnP scored against a whole threshold cascade at once.

    The hypothesis batch (sampling + minimal solves + residuals) is
    shared across the T thresholds — only the vote and the GN polish are
    per-threshold. Result fields carry a leading (T,) axis. Replaces a
    vmap of independent single-threshold RANSACs that re-solved the same
    hypotheses T times.

    The hypothesis pool is MIXED, covering the reference's full
    ITERATIVE/EPNP/P3P cascade (src/core/sfm_pipeline.py:567-584): most of
    the budget comes from 6-point DLT samples (accurate when inlier-rich),
    an eighth from P3P minimal samples (4 solutions per 3-point draw — a
    3-point sample survives outlier contamination ~eps^-3 vs the DLT's
    eps^-6), and an eighth from 8-point EPnP samples (2 candidates each;
    planar-robust where the DLT projection matrix is rank-deficient).
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

    # invalid minimal-solver outputs become no-inlier models (t_z = -1e6
    # puts every point behind the camera -> residual 1e9 in
    # project_residuals_batch)
    dead = jnp.concatenate(
        [jnp.eye(3, dtype=X.dtype).reshape(9),
         jnp.asarray([0.0, 0.0, -1e6], X.dtype)]
    )

    k_dlt, k_p3p, k_epnp = jax.random.split(key, 3)
    n_tri = max(num_hypotheses // 8, 1) if use_p3p else 0
    n_ep = max(num_hypotheses // 16, 1) if use_p3p else 0
    n_dlt = max(num_hypotheses - 4 * n_tri - 2 * n_ep, 1)
    idx = sample_indices(k_dlt, valid, n_dlt, 6)
    models = [jax.vmap(sample_solver)(idx)]            # (n_dlt, 12)
    if n_tri:
        idx3 = sample_indices(k_p3p, valid, n_tri, 3)
        m_p3p, ok_p3p = jax.vmap(
            lambda i: p3p_grunert(X[i], x_norm[i])
        )(idx3)                                        # (n_tri, 4, 12)
        models.append(
            jnp.where(ok_p3p[..., None], m_p3p, dead).reshape(-1, 12)
        )
    if n_ep:
        idx8 = sample_indices(k_epnp, valid, n_ep, 8)
        m_ep, ok_ep = jax.vmap(
            lambda i: epnp(X[i], x_norm[i])
        )(idx8)                                        # (n_ep, 2, 12)
        models.append(
            jnp.where(ok_ep[..., None], m_ep, dead).reshape(-1, 12)
        )
    models = jnp.concatenate(models, axis=0)           # (H, 12)
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
