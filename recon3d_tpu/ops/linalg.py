"""Small batched linear-algebra helpers used by the geometry kernels.

TPU-friendly formulations: smallest singular vectors come from eigh of the
normal matrix (batched symmetric eigensolve maps well to XLA), 3x3 SVDs use
jnp.linalg.svd (tiny, batched).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Geometry solves are accuracy-critical: small normal-matrix accumulations and
# projective transforms must run at full f32 MXU precision regardless of the
# session's default matmul precision (which may be bf16-ish on TPU). Every
# geometry kernel uses this instead of bare jnp.einsum.
einsum_hp = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def matmul_hp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul for small geometry matrices."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _cholesky_unrolled(A: jnp.ndarray) -> list:
    """Batched Cholesky of small (..., n, n) SPD matrices, fully unrolled.

    XLA's `cholesky`/`eigh` for tiny batched matrices dispatch iterative
    algorithms on TPU (tens of ms per 1024 x 9x9); unrolling the n^3/6
    scalar recurrences at trace time yields one fused elementwise program.
    Returns the lower factor as a python list-of-lists of (...) arrays.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve_unrolled(L: list, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b with the unrolled factor; b: (..., n)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _smallest_eigvec_fast(A: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Smallest eigenvector of symmetric PSD (..., n, n) via shifted inverse
    iteration on an unrolled Cholesky factorization.

    XLA's batched `eigh` runs an iterative QR-style algorithm — ~47 ms for
    (1024, 9, 9) on v5e, the single hottest op of every RANSAC dispatch.
    Inverse iteration converges at ratio (lambda_min/lambda_2) per step —
    for null-space extraction (lambda_min ~ 0) one step is already sharp;
    `iters`=3 covers noisy refit systems too. Cost: one unrolled Cholesky
    + iters unrolled triangular solves, all fused elementwise work.
    """
    n = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    shift = (1e-7 * tr + 1e-20)[..., None, None] * jnp.eye(n, dtype=A.dtype)
    L = _cholesky_unrolled(A + shift)
    z = jnp.broadcast_to(
        jnp.arange(1, n + 1, dtype=A.dtype) / n, A.shape[:-1]
    )
    for _ in range(iters):
        z = _chol_solve_unrolled(L, z)
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-30)
    return z


def smallest_eigvec(A: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of a symmetric PSD (..., n, n)
    matrix — null-space extraction for the DLT/8-point solvers (A^T A
    formulation instead of SVD of the tall matrix).

    fast=True (TPU only) uses Cholesky inverse iteration — an order of
    magnitude faster for large hypothesis batches, but in f32 it loses
    accuracy on ill-conditioned systems (A^T A squares the condition
    number; small-parallax triangulation and near-degenerate minimal
    samples live there). Use it ONLY where the result is re-polished or
    merely votes (RANSAC hypothesis solvers); accuracy-critical paths
    (triangulation, refits) keep the exact eigh — structure drift from a
    slightly-off null vector compounds across an incremental
    reconstruction (measured: 48/50 -> 23/50 cameras on the 50-image
    scene when triangulation used the fast path).
    """
    if fast and jax.default_backend() != "cpu":
        return _smallest_eigvec_fast(A)
    _, vecs = jnp.linalg.eigh(A)
    return vecs[..., :, 0]


def eigh3x3(A: jnp.ndarray):
    """Analytic symmetric 3x3 eigendecomposition (Cardano / Smith's method).

    Returns (w (..., 3) ascending, V (..., 3, 3) columns = eigenvectors).
    Closed-form arithmetic only — batched `jnp.linalg.eigh`/`svd` of tiny
    matrices run iterative algorithms on TPU (~50 ms per 1024 on v5e);
    this is pure VPU elementwise work.
    """
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    Bm = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(Bm * Bm, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(Bm)
    # Exactly isotropic input: p**3 underflows f32 and detB/(2 p^3) is 0/0
    # = NaN; any r is a correct limit there (all eigenvalues equal q), so
    # pin r=1 (phi=0) instead of propagating NaN into the eigenvalues.
    iso = p2 < 1e-24
    r = jnp.where(
        iso,
        jnp.ones_like(detB),
        jnp.clip(detB / jnp.maximum(2.0 * p**3, 1e-30), -1.0, 1.0),
    )
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)                      # largest
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3
    w = jnp.stack([e3, e2, e1], axis=-1)  # ascending

    def eigvec(lam, fallback_axis):
        # v spans null(A - lam I): cross products of row pairs; pick the
        # most independent pair (largest cross norm).
        M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
        c01 = jnp.cross(M[..., 0, :], M[..., 1, :])
        c12 = jnp.cross(M[..., 1, :], M[..., 2, :])
        c20 = jnp.cross(M[..., 2, :], M[..., 0, :])
        cands = jnp.stack([c01, c12, c20], axis=-2)  # (..., 3, 3)
        norms = jnp.linalg.norm(cands, axis=-1)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(
            cands, best[..., None, None].repeat(3, -1), axis=-2
        )[..., 0, :]
        # Near-degenerate (isotropic) fallback: any orthonormal basis is an
        # eigenbasis, but the two eigvec calls must not collapse onto the
        # SAME axis (that zeroed v1 after Gram-Schmidt and made
        # nearest_rotation return ~0 for exact scaled rotations) — so each
        # call falls back to its own canonical axis.
        ok = jnp.max(norms, axis=-1) > 1e-20
        fb = jnp.zeros_like(v).at[..., fallback_axis].set(1.0)
        v = jnp.where(ok[..., None], v, fb)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)

    v3 = eigvec(e3, 0)
    v1 = eigvec(e1, 2)
    # enforce orthogonality: v2 = v3 x v1 (exact for distinct eigenvalues,
    # a valid completion in the degenerate case)
    v1 = v1 - jnp.sum(v1 * v3, -1, keepdims=True) * v3
    # Near-isotropic A (e1 ~ e3 up to f32 noise): both eigvec calls can
    # return the SAME noise direction and Gram-Schmidt collapses v1 to ~0.
    # Any unit vector orthogonal to v3 is then a correct eigenvector —
    # complete the basis from the coordinate axis least aligned with v3.
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    axis = jax.nn.one_hot(
        jnp.argmin(jnp.abs(v3), axis=-1), 3, dtype=v3.dtype
    )
    alt = axis - jnp.sum(axis * v3, -1, keepdims=True) * v3
    v1 = jnp.where(n1 > 1e-4, v1, alt)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-20)
    v2 = jnp.cross(v3, v1)
    V = jnp.stack([v3, v2, v1], axis=-1)  # columns, ascending eigenvalues
    return w, V


def nearest_rotation(M: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) onto SO(3) (det +1).

    CPU: SVD (exact). TPU: polar decomposition via the analytic 3x3
    eigensolve — R = M (M^T M)^(-1/2), with the det<0 case corrected by
    flipping along the smallest singular direction (equivalent to the SVD
    form U diag(1,1,det) V^T).
    """
    if jax.default_backend() == "cpu":
        U, _, Vt = jnp.linalg.svd(M)
        det = jnp.linalg.det(U @ Vt)
        D = jnp.stack(
            [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
        )
        return (U * D[..., None, :]) @ Vt
    return _nearest_rotation_polar(M)


def _nearest_rotation_polar(M: jnp.ndarray) -> jnp.ndarray:
    """SVD-free nearest rotation (see nearest_rotation).

    Builds the SVD's U basis by Gram-Schmidt on M's two strongest
    right-singular directions and completes both bases right-handed —
    algebraically U diag(1,1,±1) V^T, well-conditioned whenever
    rank(M) >= 2 (always true for the pose/DLT matrices this serves;
    a deliberate sign flip on the weakest axis is exactly the det+1
    projection the SVD form uses).
    """

    def _unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)

    S = matmul_hp(jnp.swapaxes(M, -1, -2), M)
    _, V = eigh3x3(S)
    v1 = V[..., :, 2]  # strongest right-singular direction
    v2 = V[..., :, 1]
    u1 = _unit(einsum_hp("...ij,...j->...i", M, v1))
    mu2 = einsum_hp("...ij,...j->...i", M, v2)
    u2 = _unit(mu2 - jnp.sum(u1 * mu2, -1, keepdims=True) * u1)
    u3 = jnp.cross(u1, u2)
    v3 = jnp.cross(v1, v2)  # right-handed completion of the V basis
    return (
        u1[..., :, None] * v1[..., None, :]
        + u2[..., :, None] * v2[..., None, :]
        + u3[..., :, None] * v3[..., None, :]
    )


def solve_psd(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve (A + damping*I) x = b for symmetric PSD A via Cholesky."""
    n = A.shape[-1]
    if damping:
        A = A + damping * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jnp.linalg.solve(L, b[..., None] if b.ndim == A.ndim - 1 else b)
    x = jnp.linalg.solve(jnp.swapaxes(L, -1, -2), y)
    return x[..., 0] if b.ndim == A.ndim - 1 else x


def homogeneous(x: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last axis: (..., n) -> (..., n+1)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def from_homogeneous(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Dehomogenize: (..., n+1) -> (..., n), sign-safe near w=0."""
    w = x[..., -1:]
    w = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return x[..., :-1] / w
