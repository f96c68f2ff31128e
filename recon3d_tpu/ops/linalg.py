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


def smallest_eigvec(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of a symmetric (..., n, n) matrix.

    jnp.linalg.eigh returns eigenvalues in ascending order, so this is the
    first column. Used for null-space extraction in DLT/8-point solvers
    (A^T A formulation instead of SVD of the tall matrix).
    """
    _, vecs = jnp.linalg.eigh(A)
    return vecs[..., :, 0]


def nearest_rotation(M: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) onto SO(3) (det +1) via SVD: R = U diag(1,1,det) V^T."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )
    return (U * D[..., None, :]) @ Vt


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
