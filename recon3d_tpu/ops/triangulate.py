"""Batched DLT triangulation and track validation.

Replaces cv.triangulatePoints (reference geometry.py:42, dense.py:186) and the
per-point Python validation loop (reference geometry.py:55-125) with fully
vectorized, masked kernels. The DLT null space is taken from eigh of the 4x4
normal matrix — batched symmetric eigensolves map cleanly onto XLA/TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from recon3d_tpu.ops.linalg import smallest_eigvec, einsum_hp, matmul_hp


def _dlt_rows(P: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows per observation: (..., 3, 4), (..., 2) -> (..., 2, 4)."""
    r0 = x[..., 0:1] * P[..., 2, :] - P[..., 0, :]
    r1 = x[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    rows = jnp.stack([r0, r1], axis=-2)
    # Row normalization improves conditioning of A^T A.
    norm = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    return rows / jnp.maximum(norm, 1e-12)


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """Two-view DLT triangulation.

    P1, P2: (..., 3, 4) projection matrices (K [R|t]).
    x1, x2: (..., N, 2) pixel observations.
    Returns (..., N, 3) world points.
    """
    A = jnp.concatenate(
        [
            _dlt_rows(P1[..., None, :, :], x1),
            _dlt_rows(P2[..., None, :, :], x2),
        ],
        axis=-2,
    )  # (..., N, 4, 4)
    AtA = einsum_hp("...ki,...kj->...ij", A, A)
    X = smallest_eigvec(AtA)  # (..., N, 4)
    w = X[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return X[..., :3] / w


def triangulate_nview(
    Ps: jnp.ndarray, xs: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """N-view masked DLT: Ps (V, 3, 4), xs (..., V, 2), mask (..., V) -> (..., 3).

    Invalid views contribute zero rows; needs >= 2 valid views for a
    well-posed solve (caller gates on that).
    """
    rows = _dlt_rows(Ps, xs)  # (..., V, 2, 4)
    rows = rows * mask[..., None, None]
    A = rows.reshape(rows.shape[:-3] + (-1, 4))
    AtA = einsum_hp("...ki,...kj->...ij", A, A)
    X = smallest_eigvec(AtA)
    w = X[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return X[..., :3] / w


def reprojection_errors(
    K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """Pixel reprojection error of world points X (..., 3) vs observations x.

    Replaces reference geometry.py:164-182. Points behind the camera get a
    large finite error (so masked reductions stay NaN-free).
    """
    Xc = einsum_hp("...ij,...j->...i", R, X) + t
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uv = Xc[..., :2] / zs[..., None]
    u = K[..., 0, 0] * uv[..., 0] + K[..., 0, 1] * uv[..., 1] + K[..., 0, 2]
    v = K[..., 1, 1] * uv[..., 1] + K[..., 1, 2]
    err = jnp.linalg.norm(jnp.stack([u, v], axis=-1) - x, axis=-1)
    return jnp.where(z > 1e-6, err, 1e9)


def triangulation_angles(
    C1: jnp.ndarray, C2: jnp.ndarray, X: jnp.ndarray
) -> jnp.ndarray:
    """Parallax angle (degrees) at X between camera centers C1, C2."""
    r1 = C1 - X
    r2 = C2 - X
    cosang = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )
    return jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))


def validate_triangulation(
    K: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    X: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    max_reproj_px: float = 4.0,
    min_parallax_deg: float = 1.0,
    max_depth_factor: float = 200.0,
) -> jnp.ndarray:
    """Vectorized validity mask over triangulated points (N, 3).

    The four gates of reference geometry.py:55-125, without the Python loop:
      1. cheirality in both cameras (z > 0),
      2. depth < max_depth_factor * baseline,
      3. parallax >= min_parallax_deg,
      4. reprojection error <= max_reproj_px in both views.
    """
    z1 = (einsum_hp("ij,nj->ni", R1, X) + t1)[..., 2]
    z2 = (einsum_hp("ij,nj->ni", R2, X) + t2)[..., 2]
    cheirality = (z1 > 1e-6) & (z2 > 1e-6)

    C1 = -R1.T @ t1
    C2 = -R2.T @ t2
    baseline = jnp.linalg.norm(C2 - C1) + 1e-12
    depth_ok = (z1 < max_depth_factor * baseline) & (z2 < max_depth_factor * baseline)

    parallax = triangulation_angles(C1, C2, X)
    parallax_ok = parallax >= min_parallax_deg

    e1 = reprojection_errors(K, R1, t1, X, x1)
    e2 = reprojection_errors(K, R2, t2, X, x2)
    reproj_ok = (e1 <= max_reproj_px) & (e2 <= max_reproj_px)

    return cheirality & depth_ok & parallax_ok & reproj_ok
